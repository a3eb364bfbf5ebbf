package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The stats-CLI + orphan-scan query layer:
  *
  *  - `wqm stats processing` (cli/commands/stats/processing.rs) —
  *    the operations rollup (query_operations :102: GROUP BY op,
  *    item_type → count + total duration) and the per-phase breakdown
  *    (query_phases :131: count/min/round(avg)/max/total, plus
  *    compute_phase_percentiles :168: min / Q1 / median / Q3 / max with
  *    the stats/mod.rs:173 nearest-rank percentile — the SAME
  *    idx = round(p/100 · (n−1)) formula the perf report uses, so
  *    [[PerfStats.percentileOf]] is reused verbatim). The reference
  *    issues one sorted-scan query per phase (N+1); the batch twin
  *    aggregates the sorted duration list per phase in one groupBy.
  *  - `wqm stats overview` (cli/commands/stats/overview.rs) — the
  *    search-instrumentation report over the search_events /
  *    search_behavior / resolution_events log: tool distribution with
  *    whole-percent shares (:54), behavior classification rates (:86),
  *    the mcp_qdrant latency section — COUNT + ROUND(AVG) (:131) and
  *    p50/p95/p99 picked by the report's OWN truncating index
  *    `sorted[n·p/100]` (:168 — integer floor, 0-based; distinct from
  *    the nearest-rank formula above, quirk kept), top-10 query texts
  *    (:203), and the resolution rate (:240). Emitted as one
  *    long-format frame (section, key, n, pct, ms) since the reference
  *    prints heterogeneous sections of one report.
  *  - `wqm admin cleanup-orphans` scan half (admin/cleanup_orphans.rs
  *    :67 scan_collections_for_orphans) — per collection, the distinct
  *    tenant set present in the points store anti-joined against the
  *    registry's known tenants, sorted; deletion enqueueing is daemon
  *    environment.
  *
  * The instrumentation log is daemon state; synthesized here over the
  * events axis with integer arithmetic only (tool/behavior/latency/
  * query-text from event residues) so the DuckDB oracle reproduces it
  * exactly. Top-10 LIMIT ties are broken by query text (the reference's
  * SQLite order under equal counts is unspecified).
  *
  * Scale: everything is one aggregation over the filtered log —
  * map-side combine, shuffle ∝ distinct groups; the orphan scan is a
  * distinct + broadcast anti-join per config-sized registry.
  */
object CliStats {

  /** The synthetic search_events log: one row per event within the
    * overview's scope, with the nullable latency / query-text arms. */
  def searchEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      element_at(array(lit("mcp_qdrant"), lit("rg"), lit("grep"), lit("cli_search")),
        (pmod(col("event_id"), lit(4)) + 1).cast("int")).as("tool"),
      when(pmod(col("event_id"), lit(13)) === 0, lit(null).cast("string"))
        .otherwise(concat(lit("query-"), pmod(col("user_id"), lit(37))))
        .as("query_text"),
      when(pmod(col("event_id"), lit(7)) === 0, lit(null).cast("long"))
        .otherwise(floor(col("value") * 200).cast("long")).as("latency_ms"),
      when(pmod(col("event_id"), lit(3)) =!= 0,
        element_at(array(lit("lookup"), lit("explore"), lit("navigate")),
          (pmod(col("user_id") + col("event_id"), lit(3)) + 1).cast("int")))
        .as("behavior"),
      (pmod(col("event_id"), lit(5)) === 0).as("resolved"))

  /** §3 `*Of` form of the operations rollup (processing.rs:102) over a
    * timings log. */
  def processingOpsOf(timings: DataFrame): DataFrame =
    timings
      .groupBy(col("op"), col("item_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("duration_ms")).as("total_ms"))
      .orderBy(col("cnt").desc, col("op"), col("item_type"))

  /** stats processing — operations rollup over the perf log. */
  def processingOps(spark: SparkSession, dir: String): DataFrame =
    processingOpsOf(PerfStats.timings(spark, dir))

  /** §3 `*Of` form of the phase breakdown + quartiles
    * (processing.rs:131 query_phases, :168 compute_phase_percentiles).
    * ROUND(AVG) is the reference's SQLite round-half-away on the mean. */
  def processingStatsOf(timings: DataFrame): DataFrame = {
    val g = timings
      .groupBy(col("phase"))
      .agg(sort_array(collect_list(col("duration_ms"))).as("ds"),
        count(lit(1)).as("cnt"),
        min(col("duration_ms")).as("min_ms"),
        round(avg(col("duration_ms")), 0).as("avg_ms"),
        max(col("duration_ms")).as("max_ms"),
        sum(col("duration_ms")).as("total_ms"))
    g.select(col("phase"), col("cnt"), col("min_ms"), col("avg_ms"),
        col("max_ms"), col("total_ms"),
        PerfStats.percentileOf(col("ds"), 25).cast("long").as("q1_ms"),
        PerfStats.percentileOf(col("ds"), 50).cast("long").as("median_ms"),
        PerfStats.percentileOf(col("ds"), 75).cast("long").as("q3_ms"))
      .orderBy(col("total_ms").desc, col("phase"))
  }

  /** stats processing — phase breakdown over the perf log. */
  def processingStats(spark: SparkSession, dir: String): DataFrame =
    processingStatsOf(PerfStats.timings(spark, dir))

  /** The overview report's OWN truncating percentile (overview.rs:186):
    * sorted[n·p/100], 0-based integer floor (≤ n−1 for p < 100). */
  private def truncPct(sorted: Column, pct: Int): Column =
    try_element_at(sorted, (size(sorted) * pct / 100).cast("int") + 1)
      .cast("double")

  /** §3 `*Of` form of stats overview — the five report sections as one
    * long frame over a search-events log. */
  def searchOverviewOf(events: DataFrame): DataFrame = {
    val ev = events.localCheckpoint()
    val total = ev.agg(count(lit(1)).as("total"))

    val tools = ev.groupBy(col("tool")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(lit("tool").as("section"), col("tool").as("key"), col("n"),
        round(col("n") * 100.0 / col("total"), 0).as("pct"),
        lit(null).cast("double").as("ms"))

    val behaviors = ev.filter(col("behavior").isNotNull)
      .groupBy(col("behavior")).agg(count(lit(1)).as("n"))
    val behaviorTotal = behaviors.agg(sum(col("n")).as("bt"))
    val behaviorRows = behaviors.crossJoin(broadcast(behaviorTotal))
      .select(lit("behavior").as("section"), col("behavior").as("key"),
        col("n"), round(col("n") * 100.0 / col("bt"), 0).as("pct"),
        lit(null).cast("double").as("ms"))

    val lat = ev.filter(col("tool") === "mcp_qdrant" && col("latency_ms").isNotNull)
      .agg(sort_array(collect_list(col("latency_ms"))).as("ls"),
        count(lit(1)).as("n"),
        round(avg(col("latency_ms")), 0).as("avg_ms"))
    val latRows = lat.select(col("n"), explode(map(
        lit("avg"), col("avg_ms").cast("double"),
        lit("p50"), truncPct(col("ls"), 50),
        lit("p95"), truncPct(col("ls"), 95),
        lit("p99"), truncPct(col("ls"), 99))).as(Seq("key", "ms")))
      .select(lit("latency").as("section"), col("key"), col("n"),
        lit(null).cast("double").as("pct"), col("ms"))

    val topQueries = ev.filter(col("query_text").isNotNull)
      .groupBy(col("query_text")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("query_text")).limit(10)
      .select(lit("top_query").as("section"), col("query_text").as("key"),
        col("n"), lit(null).cast("double").as("pct"),
        lit(null).cast("double").as("ms"))

    val resolution = ev.filter(col("resolved")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .select(lit("resolution").as("section"), lit("resolved").as("key"),
        col("n"), round(col("n") * 100.0 / col("total"), 0).as("pct"),
        lit(null).cast("double").as("ms"))

    val totalRow = total.select(lit("total").as("section"),
      lit("events").as("key"), col("total").as("n"),
      lit(null).cast("double").as("pct"), lit(null).cast("double").as("ms"))

    totalRow.unionByName(tools).unionByName(behaviorRows)
      .unionByName(latRows).unionByName(topQueries).unionByName(resolution)
      .orderBy(col("section"), col("key"))
  }

  /** stats overview over the synthetic instrumentation log. */
  def searchOverview(spark: SparkSession, dir: String): DataFrame =
    searchOverviewOf(searchEvents(spark, dir))

  /** The synthetic metrics_history log (status/history.rs reads the
    * daemon's telemetry table): metric names from event types, raw vs
    * rolled-up aggregation periods, values from the events value axis. */
  def metricsHistory(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      concat(lit("m_"), col("event_type")).as("metric_name"),
      when(pmod(col("event_id"), lit(6)) === 0, lit("hourly"))
        .otherwise(lit("raw")).as("aggregation_period"),
      col("ts").as("timestamp"),
      col("value").as("metric_value"))

  /** §3 `*Of` form of `wqm status history`'s metric summaries
    * (status/history.rs:87 query_metric_summaries + :108
    * query_single_metric): per raw-period metric name within the
    * cutoff — AVG/MIN/MAX/COUNT plus the latest value (the reference's
    * correlated ORDER BY timestamp DESC LIMIT 1 subquery per metric —
    * N+1 — as one max_by; ties totalized by (timestamp, event_id)). */
  def metricsSummaryOf(history: DataFrame, cutoff: DataFrame): DataFrame =
    history.crossJoin(broadcast(cutoff))
      .filter(col("aggregation_period") === "raw" &&
        col("timestamp") >= col("cutoff_ts"))
      .groupBy(col("metric_name"))
      .agg(
        round(avg(col("metric_value")), 6).as("avg"),
        round(min(col("metric_value")), 6).as("min"),
        round(max(col("metric_value")), 6).as("max"),
        count(lit(1)).as("count"),
        round(max_by(col("metric_value"),
          struct(col("timestamp"), col("event_id"))), 6).as("latest"))
      .orderBy(col("metric_name"))

  /** status history metric summaries over the synthetic log — 24 h
    * range (parse_range_to_seconds "24h") anchored at the log's max
    * timestamp. */
  def metricsSummary(spark: SparkSession, dir: String): DataFrame = {
    val h = metricsHistory(spark, dir)
    val cutoff = h.agg(
      timestamp_seconds(unix_seconds(max(col("timestamp"))) - 24L * 3600L)
        .as("cutoff_ts"))
    metricsSummaryOf(h, cutoff)
  }

  /** §3 `*Of` form of the orphan scan: (collection, tenant_id) rows
    * present in the store but absent from the registry, sorted. */
  def tenantOrphansOf(stored: DataFrame, known: DataFrame): DataFrame =
    stored.join(broadcast(known), Seq("collection", "tenant_id"), "left_anti")
      .orderBy(col("collection"), col("tenant_id"))

  /** admin cleanup-orphans scan: store tenants per collection minus the
    * registry's known tenants (cleanup_orphans.rs:67). The store side
    * is the documents points axis; the known side is the watch-folder
    * registry ([[PerfStats.perfFolders]]) — config-sized, broadcast. */
  def tenantOrphans(spark: SparkSession, dir: String): DataFrame = {
    val stored = Tables.documents(spark, dir).select(
        col("source").as("tenant_id"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit("libraries"))
          .otherwise(lit("projects")).as("collection"))
      .distinct()
    tenantOrphansOf(stored,
      PerfStats.perfFolders(spark, dir).select(col("collection"), col("tenant_id")))
  }
}
