package graft.operators

import graft.SparkSpec

/** Parity with library/list.rs: the three collection arms, the mode
  * default, and the Watching-first case-insensitive sort.
  */
class LibraryListSpec extends SparkSpec {

  import spark.implicits._

  test("three arms: library folders, format-routed projects, orphans (list.rs:120/:175/:217)") {
    val folders = Seq(
      ("Lib1", "libraries", "/lib/a", Some("full"), true),
      ("lib2", "libraries", "/lib/b", None, false),      // Paused + mode default
      ("proj", "projects", "/work/p", None, true),
      ("ruled", "rules", "/r", None, true))              // feeds the orphan arm
      .toDF("tenant_id", "collection", "path", "library_mode", "enabled")
    val tracked = Seq(
      ("Lib1", "libraries"), ("Lib1", "libraries"),
      ("proj", "libraries"),                              // format-routed
      ("ruled", "libraries"),                             // orphan
      ("proj", "projects"))                               // non-library: ignored
      .toDF("watch_tenant", "collection")
    val rows = LibraryList.libraryListOf(folders, tracked).collect()
    val byName = rows.map(r => r.getAs[String]("name") -> r).toMap
    assert(byName("Lib1").getAs[String]("status") == "Watching" &&
      byName("Lib1").getAs[Long]("documents") == 2L &&
      byName("Lib1").getAs[String]("mode") == "full")
    assert(byName("lib2").getAs[String]("status") == "Paused" &&
      byName("lib2").getAs[String]("mode") == "incremental" &&
      byName("lib2").getAs[Long]("documents") == 0L)
    assert(byName("proj").getAs[String]("status") == "Active" &&
      byName("proj").getAs[String]("mode") == "auto-routed" &&
      byName("proj").getAs[Long]("documents") == 1L)
    assert(byName("ruled").getAs[String]("status") == "Orphan" &&
      byName("ruled").getAs[String]("path") == "—")
    // Watching first, then case-insensitive name
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("Lib1", "lib2", "proj", "ruled"))
  }
}
