package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with common/document_id.rs — the uuid::new_v5 KATs
  * (computed independently with Python's uuid.uuid5 over the module's
  * namespace), path normalization, and the stability/isolation
  * contracts the reference's tests assert. */
class DocumentIdsSpec extends SparkSpec {

  import spark.implicits._
  import DocumentIds._

  private def docId(tenant: String, path: String): String =
    Seq((tenant, path)).toDF("t", "p")
      .select(documentId(col("t"), col("p")).as("u"))
      .collect().head.getString(0)

  test("document_id is uuid5(namespace, tenant|normalized_path), hyphenated (document_id.rs:26 — independent KATs)") {
    assert(docId("tenant-abc", "/home/user/project/src/main.rs") ==
      "b5974a5d-490e-5248-a201-da4edf9ec8ff")
    assert(docId("tenant-abc", "/src/main.rs") ==
      "3cf8b874-dff3-58d3-ae19-421f21e1a314")
    // Backslashes normalize to forward slashes before hashing.
    assert(docId("src3", "C:\\w\\f.rs") ==
      "7c055575-34ce-5ee7-bee4-d656bf145406")
    // Trailing slashes trim.
    assert(docId("src3", "/a/b/") == docId("src3", "/a/b"))
    assert(docId("src3", "/a/b") ==
      "dbe864c9-4171-5a5c-8ba8-56c7ae8d3275")
  }

  test("stability, uniqueness, tenant isolation (document_id.rs tests)") {
    assert(docId("tenant-abc", "/src/main.rs") ==
      docId("tenant-abc", "/src/main.rs"))
    assert(docId("tenant-abc", "/src/main.rs") !=
      docId("tenant-abc", "/src/lib.rs"))
    assert(docId("tenant-abc", "/src/main.rs") !=
      docId("tenant-xyz", "/src/main.rs"))
    // Valid hyphenated v5 uuid shape.
    assert(docId("t", "/p").matches(
      "^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"))
  }

  test("point ids: stable, chunk/file/branch isolated, 32 hex (document_id.rs test_generate_point_id_*)") {
    val rows = documentIds(spark, sfDir).collect()
    assert(rows.forall(_.getAs[String]("point_id").matches("^[0-9a-f]{32}$")))
    // Branch isolation: the same (tenant, path, chunk) never shares a
    // point id across branches; content ids DO coincide (same text).
    val byKey = rows.groupBy(r => (r.getAs[String]("tenant_id"),
      r.getAs[String]("file_path"), r.getAs[Long]("chunk_index")))
    byKey.values.foreach { v =>
      assert(v.map(_.getAs[String]("point_id")).distinct.length == v.length)
      assert(v.map(_.getAs[String]("content_doc_id")).distinct.length == 1)
    }
    // The known-answer pair from the derivation formulae.
    val kat = documentIdsOf(Seq(("tenant-abc", "main", 0L, "/src/a.rs",
      "hello world")).toDF("tenant_id", "branch", "chunk_index",
      "file_path", "content")).collect().head
    assert(kat.getAs[String]("point_id") ==
      "96026bbcb47c4be77d6da03591859f5e")
  }

  test("content ids hash tenant|content (document_id.rs test_generate_content_document_id_stability)") {
    val got = Seq(("t", "hello world")).toDF("t", "c")
      .select(contentDocumentId(col("t"), col("c")).as("x"))
      .collect().head.getString(0)
    assert(got == "b73e8ef3f19d0bcf0bd8cb53a7e68be7")
  }
}
