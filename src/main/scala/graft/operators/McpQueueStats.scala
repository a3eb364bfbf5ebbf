package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MCP server's direct queue reads (mcp-server/src/sqlite/
  * queue_stats.rs — SQL verbatim from the TypeScript predecessor's
  * queue-operations.ts:174-209) and the daemon's queue-depth /
  * backlog-estimate reads (core/src/queue_operations/query.rs).
  *
  * Both are read-only aggregations over unified_queue; the axes the
  * CLI stats surface doesn't carry — lease_until (stale-lease
  * detection) and size_bytes (drain backlog estimation) — extend the
  * shared queue synthesis here.
  *
  * Scale: every query is one single-pass hash aggregation with map-side
  * partials (shuffle ∝ distinct statuses/types/collections, i.e.
  * config-sized); the backlog estimate is a closed-form scalar (see
  * below), never a row-wise second pass.
  */
object McpQueueStats {

  /** The queue with the two MCP/daemon-side axes: in_progress rows
    * carry lease_until = created_at + (eid%3)·12h (the %3==0 arm is
    * expired against the data's max-timestamp `now` anchor), and
    * size_bytes is NULL every 6th row (the pre-v45 / non-file arm of
    * the imputation) else a deterministic 100..100100 byte size. */
  def queueExt(spark: SparkSession, dir: String): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    TuiViews.queue(spark, dir)
      .withColumn("lease_until",
        when(col("status") === "in_progress",
          expr("created_at + make_interval(0, 0, 0, 0, " +
            "CAST(CAST(substring(queue_id, 3) AS BIGINT) % 3 AS INT) * 12, 0, 0)")))
      .withColumn("size_bytes",
        when(pmod(eid, lit(6)) =!= 0, (pmod(eid, lit(1000)) + 1) * 100))
  }

  /** §3 `*Of` form of queue_stats.rs:144 get_queue_stats — the four
    * reads as one long (metric, key, n) frame: per-status totals
    * (:53), pending-by-item_type (:76), pending-by-collection (:102),
    * and the stale-lease count (:127 — in_progress with lease_until
    * past `now`, here the broadcast 1-row max-timestamp anchor, the
    * same totalization the CLI queue_stats oracle uses). */
  def mcpQueueStatsOf(queue: DataFrame, now: DataFrame): DataFrame = {
    val statuses = queue.groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
      .select(lit("status").as("metric"), col("status").as("key"), col("n"))
    val byType = queue.filter(col("status") === "pending")
      .groupBy(col("item_type")).agg(count(lit(1)).as("n"))
      .select(lit("by_item_type").as("metric"), col("item_type").as("key"),
        col("n"))
    val byCollection = queue.filter(col("status") === "pending")
      .groupBy(col("collection")).agg(count(lit(1)).as("n"))
      .select(lit("by_collection").as("metric"), col("collection").as("key"),
        col("n"))
    val stale = queue.join(broadcast(now))
      .filter(col("status") === "in_progress" &&
        col("lease_until") < col("now_ts"))
      .agg(count(lit(1)).as("n"))
      .select(lit("stale_items").as("metric"), lit("").as("key"), col("n"))
    statuses.unionByName(byType).unionByName(byCollection).unionByName(stale)
      .orderBy(col("metric"), col("key"))
  }

  def mcpQueueStats(spark: SparkSession, dir: String): DataFrame = {
    val q = queueExt(spark, dir)
    mcpQueueStatsOf(q, q.agg(max(col("created_at")).as("now_ts")))
  }

  /** §3 `*Of` form of the metrics-exporter depth gauge + the drain
    * backlog estimate (query.rs:113 get_unified_queue_depth_by_type_
    * status — done excluded, deleted at finalization — and :180
    * get_pending_bytes_estimate). The estimate keeps the reference's
    * NULL-imputing semantics — mean of known pending sizes (the F6
    * default when none), NULL rows average-imputed, 0 with no pending
    * rows — but as the closed form
    * `sum_known + n_null · avg` from ONE aggregation pass: exact
    * integer partials plus a single scalar multiply, instead of the
    * reference's row-wise SUM(COALESCE(size, avg)) second scan, whose
    * float accumulation order a distributed sum couldn't pin down. */
  def queueDepthBytesOf(queue: DataFrame,
                        defaultItemBytes: Long = 4096L): DataFrame = {
    val depth = queue.filter(col("status") =!= "done")
      .groupBy(col("item_type"), col("status"))
      .agg(count(lit(1)).cast("double").as("val"))
      .select(lit("depth").as("metric"),
        concat(col("item_type"), lit("|"), col("status")).as("key"),
        col("val"))
    val bytes = queue.filter(col("status") === "pending")
      .agg(
        coalesce(sum(col("size_bytes")), lit(0L)).as("sum_known"),
        count(col("size_bytes")).as("n_known"),
        count(lit(1)).as("n_pending"))
      .select(lit("pending_bytes").as("metric"), lit("estimate").as("key"),
        when(col("n_pending") === 0, lit(0.0))
          .otherwise(floor(col("sum_known") +
            (col("n_pending") - col("n_known")) *
              when(col("n_known") > 0,
                col("sum_known").cast("double") / col("n_known"))
                .otherwise(lit(defaultItemBytes.toDouble)))
            .cast("double")).as("val"))
    depth.unionByName(bytes).orderBy(col("metric"), col("key"))
  }

  def queueDepthBytes(spark: SparkSession, dir: String): DataFrame =
    queueDepthBytesOf(queueExt(spark, dir))
}
