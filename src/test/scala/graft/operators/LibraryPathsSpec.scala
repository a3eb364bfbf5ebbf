package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference vectors from library_hierarchy.rs tests. */
class LibraryPathsSpec extends SparkSpec {

  private def loc(root: String, path: String) = {
    import spark.implicits._
    LibraryPaths.locationsOf(Seq(("main", root, path))
      .toDF("library_name", "library_root", "document_path"))
  }

  test("nested path extraction (test_extract_nested_path + test_build_location)") {
    val r = loc("/docs/main", "/docs/main/cs/patterns/GoF.pdf").collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("library_path") == "cs/patterns")
    assert(r(0).getAs[String]("document_name") == "GoF.pdf")
    assert(r(0).getAs[String]("full_path") == "main/cs/patterns/GoF.pdf")
  }

  test("root-level document: empty path, two-segment full_path (test_extract_root_level_document + test_full_path_root_level)") {
    val r = loc("/docs/main", "/docs/main/README.pdf").collect()
    assert(r(0).getAs[String]("library_path") == "")
    assert(r(0).getAs[String]("document_name") == "README.pdf")
    assert(r(0).getAs[String]("full_path") == "main/README.pdf")
  }

  test("single-level path (test_extract_single_level_path)") {
    val r = loc("/libs", "/libs/rust/book.epub").collect()
    assert(r(0).getAs[String]("library_path") == "rust")
    assert(r(0).getAs[String]("document_name") == "book.epub")
  }

  test("not under root drops the row (test_extract_not_under_root)") {
    assert(loc("/docs/main", "/other/place/file.pdf").count() == 0)
  }

  test("extension-less last component is a valid document_name (test_extract_directory_returns_none)") {
    val r = loc("/docs", "/docs/subdir").collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("library_path") == "")
    assert(r(0).getAs[String]("document_name") == "subdir")
  }

  test("prefix matching (test_path_matches_prefix_* + test_normalize_prefix)") {
    import spark.implicits._
    val paths = Seq("cs/patterns", "cs/patterns/gof", "math/algebra",
      "cs-extra/foo", "cs-advanced/topic", "cs").toDF("p")
    val out = paths
      .withColumn("m_cs", LibraryPaths.pathMatchesPrefix(col("p"), "  cs/  "))
      .withColumn("m_empty", LibraryPaths.pathMatchesPrefix(col("p"), ""))
      .withColumn("m_deep", LibraryPaths.pathMatchesPrefix(col("p"), "cs/patterns"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Boolean]("m_cs"), r.getAs[Boolean]("m_empty"), r.getAs[Boolean]("m_deep"))).toMap
    assert(out("cs") == ((true, true, false)))
    assert(out("cs/patterns") == ((true, true, true)))
    assert(out("cs/patterns/gof") == ((true, true, true)))
    assert(out("math/algebra") == ((false, true, false)))
    assert(out("cs-extra/foo") == ((false, true, false)), "partial segment must not match")
    assert(out("cs-advanced/topic") == ((false, true, false)))
  }

  test("corpus: root-level, nested, and dropped arms all live") {
    val out = LibraryPaths.libraryPaths(spark, sfDir).collect()
    assert(out.exists(_.getAs[String]("library_path") == ""))
    assert(out.exists(_.getAs[String]("library_path").startsWith("cs/")))
    assert(out.forall(_.getAs[Long]("doc_id") % 11 != 0), "outside-root rows dropped")
    assert(out.exists(_.getAs[Boolean]("matches_cs")))
  }
}
