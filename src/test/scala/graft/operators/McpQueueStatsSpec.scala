package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Parity with the mcp-server queue_stats.rs unit vectors and the
  * query.rs pending-bytes imputation semantics. */
class McpQueueStatsSpec extends SparkSpec {

  import spark.implicits._

  private val t0 = Timestamp.valueOf("2025-01-01 00:00:00")

  private def q(rows: (String, String, String, String, String,
      Timestamp, java.lang.Long)*) =
    rows.toDF("queue_id", "item_type", "collection", "status",
        "lease_until_s", "created_at", "size_bytes")
      .selectExpr("queue_id", "item_type", "collection", "status",
        "CAST(lease_until_s AS TIMESTAMP) AS lease_until", "created_at",
        "size_bytes", "'t1' AS tenant_id", "'add' AS op")

  test("status counts + pending-only type/collection pivots (queue_stats.rs status_counts_aggregated_correctly / by_collection_groups_correctly)") {
    val queue = q(
      ("q1", "document", "projects", "pending", null, t0, null),
      ("q2", "document", "projects", "pending", null, t0, null),
      ("q3", "rule", "rules", "in_progress", null, t0, null),
      ("q4", "document", "libraries", "done", null, t0, null),
      ("q5", "document", "projects", "failed", null, t0, null))
    val now = Seq(Tuple1(t0)).toDF("now_ts")
    val m = McpQueueStats.mcpQueueStatsOf(queue, now).collect()
      .map(r => (r.getAs[String]("metric"), r.getAs[String]("key")) ->
        r.getAs[Long]("n")).toMap
    assert(m(("status", "pending")) == 2)
    assert(m(("status", "in_progress")) == 1)
    assert(m(("status", "done")) == 1)
    assert(m(("status", "failed")) == 1)
    assert(m(("by_item_type", "document")) == 2)
    assert(!m.contains(("by_item_type", "rule"))) // not pending
    assert(m(("by_collection", "projects")) == 2)
    assert(!m.contains(("by_collection", "rules")))
  }

  test("stale leases: in_progress with expired lease only (queue_stats.rs stale_lease_count)") {
    val queue = q(
      ("s1", "document", "projects", "in_progress",
        "2000-01-01 00:00:00", t0, null), // stale
      ("s2", "document", "projects", "in_progress",
        "2099-01-01 00:00:00", t0, null), // future lease
      ("s3", "document", "projects", "pending",
        "2000-01-01 00:00:00", t0, null)) // not in_progress
    val now = Seq(Tuple1(t0)).toDF("now_ts")
    val m = McpQueueStats.mcpQueueStatsOf(queue, now).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Long]("n")).toMap
    assert(m("stale_items") == 1)
  }

  test("pending-bytes estimate: NULL rows average-imputed; default when no known size; 0 with no pending (query.rs get_pending_bytes_estimate)") {
    def estimate(rows: Seq[(String, java.lang.Long)],
                 default: Long = 4096L): Double = {
      val queue = q(rows.map { case (st, sz) =>
        ("x", "document", "projects", st, null: String, t0, sz) }: _*)
      McpQueueStats.queueDepthBytesOf(queue, default).collect()
        .find(_.getAs[String]("metric") == "pending_bytes").get
        .getAs[Double]("val")
    }
    // Two known (100, 300) + one NULL → avg 200 imputed → 600.
    assert(estimate(Seq(("pending", 100L), ("pending", 300L),
      ("pending", null))) == 600.0)
    // All NULL → default imputed per row.
    assert(estimate(Seq(("pending", null), ("pending", null)),
      default = 50L) == 100.0)
    // No pending rows → 0.
    assert(estimate(Seq(("done", 500L))) == 0.0)
  }

  test("depth gauge excludes done (query.rs get_unified_queue_depth_by_type_status)") {
    val queue = q(
      ("q1", "file", "projects", "pending", null, t0, null),
      ("q2", "file", "projects", "done", null, t0, null),
      ("q3", "text", "projects", "failed", null, t0, null))
    val keys = McpQueueStats.queueDepthBytesOf(queue).collect()
      .filter(_.getAs[String]("metric") == "depth")
      .map(_.getAs[String]("key")).toSet
    assert(keys == Set("file|pending", "text|failed"))
  }
}
