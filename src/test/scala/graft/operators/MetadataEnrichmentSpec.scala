package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's metadata enrichment
  * (metadata_enrichment/collection_type.rs + enrichment.rs): collection
  * name routing and the per-type field rules (PROJECT gets
  * project_id/branch/file_type/extension/is_test; USER project_id only;
  * LIBRARY library_name only; RULES global scope only).
  */
class MetadataEnrichmentSpec extends SparkSpec {
  import spark.implicits._

  test("CollectionType::from_name routing (collection_type.rs doc vectors)") {
    val vectors = Seq(
      "_0f72d776622e" -> "project",  // 12-char hex
      "_0F72D776622E" -> "project",  // is_ascii_hexdigit accepts uppercase
      "_fastapi" -> "library",
      "_my-lib_2" -> "library",
      "_0f72d776622" -> "library",   // 11 hex chars — not a project id
      "_0f72d776622ef" -> "library", // 13 chars
      "myapp-notes" -> "user",
      "a-b-c" -> "user",             // last-dash split is still user
      "rules" -> "rules",
      "memory" -> "rules",           // legacy alias
      "scratchpad" -> "user")        // dashless fallback
    val out = vectors.map(_._1).toDF("name")
      .select(MetadataEnrichment.collectionTypeOf(col("name"))).collect()
      .map(_.getString(0))
    assert(out.toSeq == vectors.map(_._2))
  }

  test("per-type field rules: only the type's fields are populated") {
    val files = Seq(
      (1L, "_0f72d776622e", "/p/src/main.rs", "main", "ten-a"),
      (2L, "myapp-notes", "/p/src/util.py", "main", "ten-b"),
      (3L, "_fastapi", "/p/docs/guide.md", "main", "ten-c"),
      (4L, "rules", "/p/notes.txt", "main", "ten-d"),
      (5L, "_0f72d776622e", "/p/tests/test_x.py", "develop", "ten-e")
    ).toDF("doc_id", "collection_name", "file_path", "branch", "tenant_id")
    val rows = MetadataEnrichment.enrichMetadataOf(files).collect()
      .map(r => r.getLong(0) -> r).toMap

    // PROJECT: project_id from the name, branch + classification fields
    val p = rows(1L)
    assert(p.getString(3) == "0f72d776622e" && p.getString(4) == "main")
    assert(p.getString(5) == "code" && p.getString(6) == "rs" && p.getInt(7) == 0)
    assert(p.isNullAt(8) && p.isNullAt(9))
    val pt = rows(5L)
    assert(pt.getString(4) == "develop" && pt.getInt(7) == 1, "tests/test_x.py is a test")

    // USER: pre-computed tenant id as project_id, NO branch/classification
    val u = rows(2L)
    assert(u.getString(3) == "ten-b")
    assert(u.isNullAt(4) && u.isNullAt(5) && u.isNullAt(6) && u.isNullAt(7))

    // LIBRARY: library_name only
    val l = rows(3L)
    assert(l.getString(8) == "fastapi")
    assert(l.isNullAt(3) && l.isNullAt(4) && l.isNullAt(9))

    // RULES: global scope only
    val r = rows(4L)
    assert(r.getString(9) == "global")
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(8))
  }

  test("metadata_enrich on the corpus: all four collection types occur") {
    val rows = MetadataEnrichment.metadataEnrich(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getString(2)).toSet
    assert(types == Set("project", "library", "user", "rules"))
    // every project row carries the full PROJECT field set
    rows.filter(_.getString(2) == "project").foreach { r =>
      assert(!r.isNullAt(3) && !r.isNullAt(4) && !r.isNullAt(5) && !r.isNullAt(7))
    }
  }
}
