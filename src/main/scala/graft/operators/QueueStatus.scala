package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The queue status-reporting layer — the read-only analytics behind
  * `wqm queue stats` (cli/commands/queue/stats.rs) and the status
  * overview's per-entity queue table
  * (cli/commands/status/overview/entity_query.rs):
  *
  *  - `queue stats` summary (stats.rs:38 build_summary + :69
  *    populate_oldest_pending + :89 populate_active_counts): total,
  *    per-status counts, distinct active collections/tenants under
  *    pending|in_progress, and the oldest pending item (age + id).
  *  - `queue stats --by-*` breakdowns (stats.rs:204 get_breakdown):
  *    per-dimension-value status pivots for item_type / op /
  *    collection — the reference runs one GROUP BY per requested
  *    dimension; the batch twin unions the three dimension axes and
  *    pivots in ONE aggregation.
  *  - the per-entity queue (entity_query.rs:13 get_per_entity_queue):
  *    (collection, tenant) pending/in_progress/failed pivot with
  *    collection-aware display names — `prj:`/`lib:`/`rls:`/`scp:`
  *    prefixes (watch/helpers.rs:85 collection_prefix) applied only
  *    when the FILTERED queue spans >1 collection (:51), names from
  *    the full tenant map (helpers.rs:58 build_full_tenant_name_map —
  *    the projects name map with library basenames filled in behind
  *    it), sorted by lowercased display name.
  *
  * The unified_queue itself is daemon state; synthesized here over the
  * events axis (extending the queue_cleanup convention — status by
  * event_id%4, sql.rs:44 vocabulary) with item_type / op / collection /
  * tenant axes from integer residues, created_at = ts. The oldest-
  * pending pick is totalized by (created_at, queue_id) — the
  * reference's LIMIT 1 under equal timestamps is unspecified.
  *
  * Scale: single-pass hash aggregations (the summary is one groupBy +
  * config-sized distinct counts; the breakdown pivots shuffle ∝
  * dimension values); the display-name axes ride broadcast.
  */
object QueueStatus {

  /** The synthetic unified_queue over the events axis. */
  def queue(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      concat(lit("q-"), col("event_id")).as("queue_id"),
      when(pmod(col("event_id"), lit(4)) === 0, lit("done"))
        .when(pmod(col("event_id"), lit(4)) === 1, lit("pending"))
        .when(pmod(col("event_id"), lit(4)) === 2, lit("in_progress"))
        .otherwise(lit("failed")).as("status"),
      element_at(array(lit("file"), lit("text"), lit("folder"), lit("tenant")),
        (pmod(col("user_id"), lit(4)) + 1).cast("int")).as("item_type"),
      element_at(array(lit("ingest"), lit("update"), lit("delete")),
        (pmod(col("event_id"), lit(3)) + 1).cast("int")).as("op"),
      when(pmod(col("user_id"), lit(7)) === 0, lit("libraries"))
        .when(pmod(col("user_id"), lit(7)) === 1, lit("rules"))
        .when(pmod(col("user_id"), lit(7)) === 2, lit("scratchpad"))
        .otherwise(lit("projects")).as("collection"),
      concat(lit("src"), pmod(col("user_id"), lit(20))).as("tenant_id"),
      col("ts").as("created_at"))

  private def statusPivot: Seq[Column] = Seq(
    sum(when(col("status") === "pending", 1L).otherwise(0L)).as("pending"),
    sum(when(col("status") === "in_progress", 1L).otherwise(0L)).as("in_progress"),
    sum(when(col("status") === "done", 1L).otherwise(0L)).as("done"),
    sum(when(col("status") === "failed", 1L).otherwise(0L)).as("failed"))

  /** §3 `*Of` form of the queue-stats summary over a queue frame and a
    * broadcast 1-row `now_ts` anchor. Long format (metric, n, id). */
  def queueStatsOf(queue: DataFrame, now: DataFrame): DataFrame = {
    val statusRows = queue.groupBy(col("status")).agg(count(lit(1)).as("n"))
      .select(col("status").as("metric"), col("n"),
        lit(null).cast("string").as("id"))
    val totalRow = queue.agg(count(lit(1)).as("n"))
      .select(lit("total_items").as("metric"), col("n"),
        lit(null).cast("string").as("id"))
    val active = queue.filter(col("status").isin("pending", "in_progress"))
    val activeRows = active.agg(
        countDistinct(col("collection")).as("ac"),
        countDistinct(col("tenant_id")).as("ap"))
      .select(explode(map(lit("active_collections"), col("ac"),
        lit("active_projects"), col("ap"))).as(Seq("metric", "n")))
      .select(col("metric"), col("n"), lit(null).cast("string").as("id"))
    // Oldest pending: min by (created_at, queue_id); age vs the anchor.
    val oldest = queue.filter(col("status") === "pending")
      .agg(min(struct(col("created_at"), col("queue_id"))).as("o"))
      .crossJoin(broadcast(now))
      .filter(col("o").isNotNull)
      .select(lit("oldest_pending_age_s").as("metric"),
        (unix_seconds(col("now_ts")) - unix_seconds(col("o.created_at")))
          .as("n"),
        col("o.queue_id").as("id"))
    totalRow.unionByName(statusRows).unionByName(activeRows)
      .unionByName(oldest)
      .orderBy(col("metric"))
  }

  /** queue stats summary over the synthetic queue, anchored at the
    * log's max timestamp. */
  def queueStats(spark: SparkSession, dir: String): DataFrame = {
    val q = queue(spark, dir).localCheckpoint()
    queueStatsOf(q, q.agg(max(col("created_at")).as("now_ts")))
  }

  /** §3 `*Of` form of the three-dimension status breakdown
    * (get_breakdown for item_type / op / collection in one pivot). */
  def queueBreakdownOf(queue: DataFrame): DataFrame = {
    val perDim = Seq("item_type", "op", "collection").map { d =>
      queue.select(lit(d).as("dim"), col(d).as("key"), col("status"))
    }.reduce(_ unionByName _)
    perDim.groupBy(col("dim"), col("key"))
      .agg(statusPivot.head, statusPivot.tail: _*)
      .orderBy(col("dim"), col("key"))
  }

  /** queue stats --by-type --by-op --by-collection over the synthetic
    * queue. */
  def queueBreakdown(spark: SparkSession, dir: String): DataFrame =
    queueBreakdownOf(queue(spark, dir))

  /** The full tenant display-name map (watch/helpers.rs:58): the
    * projects map ([[PerfStats.tenantNamesOf]]) with library root
    * basenames filled in only for tenants absent from it. */
  def fullTenantNamesOf(folders: DataFrame): DataFrame = {
    val base = PerfStats.tenantNamesOf(folders)
    val lib = folders
      .filter(col("parent_watch_id").isNull && col("collection") === "libraries")
      .select(col("tenant_id").as("map_tenant"),
        coalesce(
          try_element_at(filter(reverse(split(col("path"), "/")),
            s => s =!= ""), lit(1)),
          col("tenant_id")).as("display_name"))
      .join(base.select(col("map_tenant")), Seq("map_tenant"), "left_anti")
    base.unionByName(lib)
  }

  /** §3 `*Of` form of the per-entity queue (entity_query.rs:13):
    * active-status pivot per (collection, tenant) with conditionally
    * prefixed display names. */
  def entityQueueOf(queue: DataFrame, names: DataFrame): DataFrame = {
    val filtered = queue
      .filter(col("status").isin("pending", "in_progress", "failed"))
    val pivoted = filtered.groupBy(col("collection"), col("tenant_id"))
      .agg(
        sum(when(col("status") === "pending", 1L).otherwise(0L)).as("pending"),
        sum(when(col("status") === "in_progress", 1L).otherwise(0L))
          .as("in_progress"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("failed"))
    val nColl = filtered.agg(countDistinct(col("collection")).as("n_coll"))
    val prefix = when(col("collection") === "projects", lit("prj:"))
      .when(col("collection") === "libraries", lit("lib:"))
      .when(col("collection") === "rules", lit("rls:"))
      .when(col("collection") === "scratchpad", lit("scp:"))
      .otherwise(lit(""))
    pivoted
      .join(broadcast(names), col("tenant_id") === col("map_tenant"), "left")
      .crossJoin(broadcast(nColl))
      .select(
        when(col("n_coll") > 1,
          concat(prefix, coalesce(col("display_name"), col("tenant_id"))))
          .otherwise(coalesce(col("display_name"), col("tenant_id")))
          .as("display"),
        col("pending"), col("in_progress"), col("failed"))
      .orderBy(lower(col("display")), col("display"))
  }

  /** Per-entity queue over the synthetic queue + full name map. */
  def entityQueue(spark: SparkSession, dir: String): DataFrame =
    entityQueueOf(queue(spark, dir),
      fullTenantNamesOf(PerfStats.perfFolders(spark, dir)))
}
