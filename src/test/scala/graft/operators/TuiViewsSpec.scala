package graft.operators

import org.apache.spark.sql.Row
import graft.SparkSpec

/** Parity with the TUI data layer's own unit vectors
  * (projects_data.rs / libraries_data.rs / dashboard_fetch.rs tests)
  * plus end-to-end section checks over the registry synthesis. */
class TuiViewsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val registry = TuiViews.registry(spark, sfDir)
  private lazy val tracked = TuiViews.tracked(spark, sfDir)
  private lazy val queue = TuiViews.queue(spark, sfDir)

  test("doc counts come from tracked files joined to the owning folder's tenant (projects_data.rs doc_counts_from_tracked_files_not_queue)") {
    val reg = Seq(("w1", "t1"), ("w2", "t2")).toDF("watch_id", "tenant_id")
      .selectExpr("watch_id", "tenant_id", "'projects' AS collection",
        "CAST(NULL AS STRING) AS parent_watch_id",
        "'/p/' || tenant_id AS path", "true AS is_active",
        "true AS enabled", "CAST(NULL AS STRING) AS library_mode",
        "false AS is_paused", "false AS is_archived")
    val tf = Seq(("w1", 1L), ("w1", 2L), ("w2", 3L))
      .toDF("watch_folder_id", "file_id")
      .selectExpr("watch_folder_id", "file_id",
        "'main' AS primary_branch", "1L AS chunk_count")
    val q = Seq.empty[(String, String, String)]
      .toDF("queue_id", "status", "tenant_id")
    val rows = TuiViews.tuiProjectsOf(reg, tf, q).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Long]("doc_count")).toMap
    assert(rows == Map("t1" -> 2L, "t2" -> 1L))
  }

  test("display names disambiguate base-name collisions (libraries_data.rs display_names_disambiguate_collisions)") {
    val rows = TuiViews.tuiLibraries(spark, sfDir).collect()
    // The two libraries (w-8 docs under home, w-17 vendor docs) share
    // base `docs` → both disambiguated as parent/base.
    val names = rows.map(r => r.getAs[String]("tag") -> r.getAs[String]("name")).toMap
    assert(names == Map("src8" -> "lib/docs", "src17" -> "vendor/docs"))
  }

  test("nested-under-project library carries the P:<project> marker; home prefix becomes ~ (libraries_data.rs project_source/abbreviate_home)") {
    val byTag = TuiViews.tuiLibraries(spark, sfDir).collect()
      .map(r => r.getAs[String]("tag") -> r).toMap
    // w-17's parent is w-3, a project at /home/user/work/proj-3.
    assert(byTag("src17").getAs[String]("source") == "P:proj-3")
    assert(byTag("src8").getAs[String]("source") == null)
    assert(byTag("src8").getAs[String]("display_path") == "~/lib/docs")
    assert(byTag("src17").getAs[String]("display_path") == "/srv/vendor/docs")
  }

  test("status label arms: disabled beats watching beats stopped (libraries_data.rs status_label_*)") {
    // wn=8: enabled (8%5=3), active (8%4=0) → watching.
    // wn=17: enabled (17%5=2), inactive (17%4=1)... 17%4=1 ≠ 2 → active.
    val byTag = TuiViews.tuiLibraries(spark, sfDir).collect()
      .map(r => r.getAs[String]("tag") -> r.getAs[String]("status")).toMap
    assert(byTag("src8") == "watching")
    assert(byTag("src17") == "watching")
    // The three arms on a literal frame (the reference's truth table).
    val reg = Seq(
      ("w1", "t1", false, false), ("w2", "t2", false, true),
      ("w3", "t3", true, true), ("w4", "t4", true, false))
      .toDF("watch_id", "tenant_id", "enabled", "is_active")
      .selectExpr("watch_id", "tenant_id", "'libraries' AS collection",
        "CAST(NULL AS STRING) AS parent_watch_id",
        "'/lib/' || tenant_id AS path", "is_active", "enabled",
        "CAST(NULL AS STRING) AS library_mode",
        "false AS is_paused", "false AS is_archived")
    val tf = Seq.empty[(String, Long)].toDF("watch_folder_id", "file_id")
      .selectExpr("watch_folder_id", "file_id",
        "CAST(NULL AS STRING) AS primary_branch", "1L AS chunk_count")
    val labels = TuiViews.tuiLibrariesOf(reg, tf).collect()
      .map(r => r.getAs[String]("tag") -> r.getAs[String]("status")).toMap
    assert(labels == Map("t1" -> "disabled", "t2" -> "disabled",
      "t3" -> "watching", "t4" -> "stopped"))
  }

  test("project rows: top-level only, is_active-first order, branch is the per-tenant mode") {
    val rows = TuiViews.tuiProjects(spark, sfDir).collect()
    // w-13 and w-17 have parents → excluded; 18 of 20 remain.
    assert(rows.length == 18)
    val actives = rows.map(_.getAs[Boolean]("is_active"))
    assert(actives.sliding(2).forall(p => p.head >= p.last)) // sorted desc
    // Every tenant's dominant branch is `main` (60% of non-null rows).
    assert(rows.filter(_.getAs[Long]("doc_count") > 0)
      .forall(_.getAs[String]("branch") == "main"))
  }

  test("dashboard sections: summary totals equal the queue pivots; collection letters are uppercase (dashboard_fetch.rs collection_letter_mapping)") {
    val rows = TuiViews.tuiDashboard(spark, sfDir).collect()
    val summary = rows.find(_.getAs[String]("section") == "summary").get
    val failedTotal = queue.filter("status = 'failed'").count()
    assert(summary.getAs[Long]("queue_failed") == failedTotal)
    val errors = rows.filter(_.getAs[String]("section") == "errors")
    assert(errors.length == 50) // the newest-50 cap binds at this SF
    assert(errors.forall { r =>
      val extra = r.getAs[String]("extra")
      extra.matches("[PLSR?]:io error #\\d+")
    })
  }

  test("dashboard scratchpad/rules sections list only tenants with live-status rows, displayed via the top-level name map") {
    val rows = TuiViews.tuiDashboard(spark, sfDir).collect()
    val scratch = rows.filter(_.getAs[String]("section") == "scratchpad")
    val expected = queue
      .filter("collection = 'scratchpad' AND status IN ('pending', 'in_progress', 'failed')")
      .select("tenant_id").distinct().collect().map(_.getString(0)).sorted
    assert(scratch.map(_.getAs[String]("id")).sorted.toSeq == expected.toSeq)
    // Display names resolve through the registry paths.
    val byId = scratch.map(r => r.getAs[String]("id") -> r.getAs[String]("name")).toMap
    assert(byId("src9") == "proj-9")
  }

  test("service panel: folder totals and chunk sums match direct aggregation (service_data.rs fetch_service_status)") {
    val m = TuiViews.tuiService(spark, sfDir).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[String]("value")).toMap
    assert(m("total_folders") == "20")
    assert(m("paused_folders") == "3") // wn 0, 7, 14
    assert(m("qdrant_url") == "http://localhost:6333")
    assert(m("schema_version") == "12")
    val chunks = tracked.agg(org.apache.spark.sql.functions.sum("chunk_count"))
      .head.getLong(0)
    assert(m("total_chunks") == chunks.toString)
  }
}
