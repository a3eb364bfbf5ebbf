package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the queue status layer (queue/stats.rs,
  * status/overview/entity_query.rs, watch/helpers.rs) and the
  * status-history metric summaries (status/history.rs).
  */
class QueueStatusSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val q = Seq(
    ("q-1", "pending", "file", "ingest", "projects", "t1", ts("2026-01-01 10:00:00")),
    ("q-2", "pending", "file", "ingest", "projects", "t1", ts("2026-01-01 09:00:00")),
    ("q-3", "in_progress", "text", "update", "libraries", "t2", ts("2026-01-01 11:00:00")),
    ("q-4", "done", "file", "delete", "projects", "t3", ts("2026-01-01 12:00:00")),
    ("q-5", "failed", "folder", "ingest", "projects", "t1", ts("2026-01-01 12:30:00")))
    .toDF("queue_id", "status", "item_type", "op", "collection", "tenant_id",
      "created_at")

  test("queue stats summary: totals, actives under pending|in_progress, oldest pending (stats.rs:38)") {
    val now = Seq(Tuple1(ts("2026-01-01 12:00:00"))).toDF("now_ts")
    val rows = QueueStatus.queueStatsOf(q, now).collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    assert(rows("total_items").getAs[Long]("n") == 5L)
    assert(rows("pending").getAs[Long]("n") == 2L)
    assert(rows("done").getAs[Long]("n") == 1L)
    // active = pending|in_progress only: collections {projects, libraries},
    // tenants {t1, t2} — the failed t1 row does not extend them
    assert(rows("active_collections").getAs[Long]("n") == 2L)
    assert(rows("active_projects").getAs[Long]("n") == 2L)
    // oldest pending is q-2 (09:00), age vs the 12:00 anchor = 3 h
    val oldest = rows("oldest_pending_age_s")
    assert(oldest.getAs[Long]("n") == 3L * 3600L)
    assert(oldest.getAs[String]("id") == "q-2")
  }

  test("queue breakdown pivots all three dimensions in one pass (stats.rs:204)") {
    val rows = QueueStatus.queueBreakdownOf(q).collect()
    val file = rows.find(r => r.getAs[String]("dim") == "item_type" &&
      r.getAs[String]("key") == "file").get
    assert(file.getAs[Long]("pending") == 2L && file.getAs[Long]("done") == 1L)
    val ingest = rows.find(r => r.getAs[String]("dim") == "op" &&
      r.getAs[String]("key") == "ingest").get
    assert(ingest.getAs[Long]("pending") == 2L && ingest.getAs[Long]("failed") == 1L)
    assert(rows.count(_.getAs[String]("dim") == "collection") == 2)
  }

  test("entity queue: prefixes only when >1 collection active, lowercase sort (entity_query.rs:51)") {
    val names = Seq(("t1", "Alpha")).toDF("map_tenant", "display_name")
    val rows = QueueStatus.entityQueueOf(q, names).collect()
    val displays = rows.map(_.getAs[String]("display")).toSeq
    // projects + libraries both active → prefixed; sorted by lowercase
    assert(displays == Seq("lib:t2", "prj:Alpha"))
    val alpha = rows.find(_.getAs[String]("display") == "prj:Alpha").get
    assert(alpha.getAs[Long]("pending") == 2L &&
      alpha.getAs[Long]("failed") == 1L)
    // single-collection queue → no prefixes
    val projOnly = q.filter(col("collection") === "projects")
    val d2 = QueueStatus.entityQueueOf(projOnly, names).collect()
      .map(_.getAs[String]("display")).toSeq
    assert(d2 == Seq("Alpha"))
  }

  test("full tenant name map: library basenames only behind the projects map (helpers.rs:58)") {
    val folders = Seq(
      ("t1", "/work/alpha", None, "projects"),
      ("t1", "/lib/shadowed", None, "libraries"), // t1 already mapped → skipped
      ("t2", "/lib/beta", None, "libraries"),
      ("t3", "/lib/sub/gamma", Some("parent"), "libraries")) // sub-watch excluded
      .toDF("tenant_id", "path", "parent_watch_id", "collection")
    val m = QueueStatus.fullTenantNamesOf(folders).collect()
      .map(r => r.getAs[String]("map_tenant") -> r.getAs[String]("display_name"))
      .toMap
    assert(m("t1") == "alpha") // projects wins over the library shadow
    assert(m("t2") == "beta")
    assert(!m.contains("t3"))
  }

  test("metric summaries: raw-period cutoff filter, latest by (timestamp, id) (history.rs:108)") {
    val h = Seq(
      (1L, "m_cpu", "raw", ts("2026-01-01 10:00:00"), 1.0),
      (2L, "m_cpu", "raw", ts("2026-01-01 11:00:00"), 5.0),
      (3L, "m_cpu", "hourly", ts("2026-01-01 12:00:00"), 9.0), // non-raw skipped
      (4L, "m_cpu", "raw", ts("2025-12-01 00:00:00"), 7.0),    // before cutoff
      (5L, "m_mem", "raw", ts("2026-01-01 11:00:00"), 2.0),
      (6L, "m_mem", "raw", ts("2026-01-01 11:00:00"), 3.0))    // ts tie → id 6
      .toDF("event_id", "metric_name", "aggregation_period", "timestamp",
        "metric_value")
    val cutoff = Seq(Tuple1(ts("2026-01-01 00:00:00"))).toDF("cutoff_ts")
    val rows = CliStats.metricsSummaryOf(h, cutoff).collect()
      .map(r => r.getAs[String]("metric_name") -> r).toMap
    val cpu = rows("m_cpu")
    assert(cpu.getAs[Long]("count") == 2L)
    assert(cpu.getAs[Double]("avg") == 3.0 && cpu.getAs[Double]("min") == 1.0
      && cpu.getAs[Double]("max") == 5.0)
    assert(cpu.getAs[Double]("latest") == 5.0)
    assert(rows("m_mem").getAs[Double]("latest") == 3.0) // tie broken by id
  }

  test("project branches: distinct file counts per membership, empty arrays drop (branches.rs:74)") {
    val tracked = Seq(
      ("t1", 1L, Seq("main", "dev")),
      ("t1", 2L, Seq("main")),
      ("t1", 3L, Seq.empty[String]),
      ("t2", 4L, Seq("main"))) // other tenant excluded
      .toDF("tenant_id", "file_id", "branches")
    val rows = TargetBranch.projectBranchesOf(tracked, "t1").collect()
      .map(r => (r.getAs[String]("branch_name"), r.getAs[Long]("file_count")))
    assert(rows.toSeq == Seq(("main", 2L), ("dev", 1L)))
  }
}
