package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Processing-performance statistics — the admin perf report's query
  * layer (cli/commands/admin/perf_queries.rs) over a
  * processing_timings log:
  *
  *  - Grouped stats (perf_queries.rs:148 query_grouped_stats): per
  *    dimension value (COALESCE(col, '') — the empty group is real),
  *    within the recency cutoff: count, mean, standard error
  *    (sample stddev / √n, 0 under two samples, :406), and
  *    nearest-rank percentiles p50/p95/p99 over the sorted durations —
  *    `idx = round(p/100 · (n−1))` clamped, half rounding away from
  *    zero (:390), the empty set reading 0.
  *  - Display keys (:81 resolve_group_key): the project dimension maps
  *    tenant ids through the watch-folder name map — basename = last
  *    non-empty path segment (:59), falling back to the tenant id, and
  *    colliding basenames disambiguated as "name (tenant_id)" (:69) —
  *    while every other dimension renders '' as "(unknown)".
  *  - Two-level stats (:203 query_two_level_stats): the same statistics
  *    nested under (dim1, dim2) group pairs.
  *
  * The reference runs one SQL query per group (N+1 round-trips into
  * SQLite); the batch twin is ONE groupBy per level — the sorted
  * per-group duration lists are bounded by group cardinality, and the
  * 100 TB posture swaps the exact nearest-rank pick for an
  * approx-percentile sketch (documented; the reference semantics are
  * exact, so the exact form is the oracle-gated one).
  */
object PerfStats {

  /** Nearest-rank percentile over a SORTED array column
    * (perf_queries.rs:390): index round-half-away, clamped. */
  def percentileOf(sorted: Column, pct: Int): Column = {
    val n = size(sorted)
    val idx = least(round(lit(pct / 100.0) * (n - 1)).cast("int"), n - 1)
    when(n === 0, 0.0).otherwise(try_element_at(sorted, idx + 1).cast("double"))
  }

  /** The per-group statistics over a frame keyed by `grp` carrying
    * `duration_ms` — one groupBy, stats from the sorted list. */
  private def groupStats(keyed: DataFrame, keyCols: Seq[String]): DataFrame = {
    val g = keyed.groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(col("duration_ms"))).as("ds"),
        count(lit(1)).as("n"),
        avg(col("duration_ms")).as("avg_ms"),
        stddev_samp(col("duration_ms")).as("sd"))
    g.select(keyCols.map(col) ++ Seq(
      col("n"),
      round(col("avg_ms"), 6).as("avg_ms"),
      round(when(col("n") < 2, 0.0)
        .otherwise(col("sd") / sqrt(col("n"))), 6).as("std_err"),
      percentileOf(col("ds"), 50).as("p50_ms"),
      percentileOf(col("ds"), 95).as("p95_ms"),
      percentileOf(col("ds"), 99).as("p99_ms")): _*)
  }

  /** build_tenant_name_map (:45): root project folders only, basename
    * with tenant-id fallback, "(tenant)" suffix on collisions. */
  def tenantNamesOf(folders: DataFrame): DataFrame = {
    val base = folders
      .filter(col("parent_watch_id").isNull && col("collection") === "projects")
      .withColumn("nm", coalesce(
        try_element_at(filter(reverse(split(col("path"), "/")),
          s => s =!= ""), lit(1)),
        col("tenant_id")))
    val counts = base.groupBy(col("nm")).agg(count(lit(1)).as("nc"))
    base.join(counts, Seq("nm"))
      .select(col("tenant_id").as("map_tenant"),
        when(col("nc") > 1,
          concat(col("nm"), lit(" ("), col("tenant_id"), lit(")")))
          .otherwise(col("nm")).as("display_name"))
  }

  /** §3 `*Of` form of query_grouped_stats for a set of dimensions in
    * one pass. `timings`: the processing log within the caller's
    * cutoff; `dims`: (dimension, column) pairs; `names`: the tenant
    * display map. */
  def groupedStatsOf(timings: DataFrame, dims: Seq[(String, String)],
                     names: DataFrame): DataFrame = {
    val perDim = dims.map { case (dim, c) =>
      timings.select(lit(dim).as("dim"),
        coalesce(col(c), lit("")).as("grp"), col("duration_ms"))
    }.reduce(_ unionByName _)
    val stats = groupStats(perDim, Seq("dim", "grp"))
    stats
      .join(broadcast(names), col("dim") === "project" &&
        col("grp") === col("map_tenant"), "left")
      .withColumn("group_key",
        when(col("dim") === "project",
          coalesce(col("display_name"), col("grp")))
          .when(col("grp") === "", lit("(unknown)"))
          .otherwise(col("grp")))
      .select(col("dim"), col("group_key"), col("n"), col("avg_ms"),
        col("std_err"), col("p50_ms"), col("p95_ms"), col("p99_ms"))
  }

  /** The synthetic processing_timings log over the events axis: phases
    * from event types, tenants from users, a null-language residue for
    * the '(unknown)' arm, durations in integer ms, and the recency
    * cutoff anchored at the log's max timestamp (14 days). */
  def timings(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val anchored = ev.crossJoin(broadcast(
      ev.agg(max(col("ts")).as("now_ts"))))
    anchored
      .filter(unix_micros(col("ts")) >
        unix_micros(col("now_ts")) - 14L * 86400L * 1000000L)
      .select(
        col("event_id").as("queue_id"),
        concat(lit("src"), pmod(col("user_id"), lit(20))).as("tenant_id"),
        col("event_type").as("phase"),
        element_at(array(lit("ingest"), lit("update"), lit("delete")),
          (pmod(col("event_id"), lit(3)) + 1).cast("int")).as("op"),
        when(pmod(col("event_id"), lit(11)) === 0, lit(null).cast("string"))
          .otherwise(element_at(array(lit("rust"), lit("python"), lit("go")),
            (pmod(col("event_id"), lit(3)) + 1).cast("int"))).as("language"),
        when(pmod(col("event_id"), lit(4)) === 0, lit("libraries"))
          .otherwise(lit("projects")).as("collection"),
        element_at(array(lit("file"), lit("text"), lit("folder"), lit("tenant")),
          (pmod(col("user_id"), lit(4)) + 1).cast("int")).as("item_type"),
        floor(col("value") * 37).cast("long").as("duration_ms"))
  }

  /** The watch-folder registry with colliding basenames, a trailing
    * slash, a sub-watch, and a non-projects row — every name-map arm. */
  def perfFolders(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source")).distinct()
      .select(col("source").as("tenant_id"),
        expr("CAST(substring(source, 4) AS INT)").as("n"))
      .select(col("tenant_id"),
        when(pmod(col("n"), lit(4)) === 0, lit("/work/alpha"))
          .when(pmod(col("n"), lit(4)) === 1,
            concat(lit("/work/proj-"), col("n"), lit("/")))
          .otherwise(concat(lit("/work/proj-"), col("n"))).as("path"),
        when(pmod(col("n"), lit(7)) === 6, lit("w-parent"))
          .otherwise(lit(null).cast("string")).as("parent_watch_id"),
        when(pmod(col("n"), lit(9)) === 8, lit("libraries"))
          .otherwise(lit("projects")).as("collection"))

  /** perf_stats query: four dimensions (project/phase/language/op) in
    * one grouped pass. */
  def perfStats(spark: SparkSession, dir: String): DataFrame =
    groupedStatsOf(timings(spark, dir),
      Seq("project" -> "tenant_id", "phase" -> "phase",
        "language" -> "language", "op" -> "op"),
      tenantNamesOf(perfFolders(spark, dir)))
      .orderBy(col("dim"), col("group_key"))

  /** perf_stats_2d query: the two-level (collection, phase) nesting
    * (query_two_level_stats — sub-stats grouped under each level-1
    * key; empty sub-sets drop with their key, which a groupBy does
    * naturally). */
  def perfStats2d(spark: SparkSession, dir: String): DataFrame = {
    val t = timings(spark, dir)
      .withColumn("g1", coalesce(col("collection"), lit("")))
      .withColumn("g2", coalesce(col("phase"), lit("")))
    groupStats(t, Seq("g1", "g2"))
      .select(
        when(col("g1") === "", lit("(unknown)")).otherwise(col("g1")).as("group1_key"),
        when(col("g2") === "", lit("(unknown)")).otherwise(col("g2")).as("group2_key"),
        col("n"), col("avg_ms"), col("std_err"),
        col("p50_ms"), col("p95_ms"), col("p99_ms"))
      .orderBy(col("group1_key"), col("group2_key"))
  }
}
