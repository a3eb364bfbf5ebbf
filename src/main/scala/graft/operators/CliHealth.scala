package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The CLI's queue-health verdict (cli/src/data/queries/queue.rs) —
  * the single-source-of-truth health assessment `wqm status` renders:
  *
  *  - health() (:23): empty active set → healthy; oldest-pending age
  *    > 24 h OR failed ratio > 10% of active → unhealthy; any failed
  *    OR age > 1 h → degraded; else healthy.
  *  - health_reason() (:48): the joined reason list with the
  *    reference's exact formats — `oldest pending: {d}d {h}h (>24h)`
  *    (the no-days variant is structurally dead: age > 24 always
  *    floors to ≥ 1 day — kept faithfully), `oldest pending: {h}h
  *    (>1h)`, `failed: {p}% (>10%)`, `{n} failed`; None when healthy.
  *  - worst() (:110): max of the ordered levels — surfaced as the
  *    overall row over the per-collection corpus slices.
  *  - get_avg_processing_ms (:156): AVG over per-queue-item summed
  *    phase durations (one nested GROUP BY, not N+1).
  *
  * Corpus stats derive per collection from the unified-queue
  * synthesis (ages vs the log's max-timestamp anchor); a fixture axis
  * drives every threshold arm deterministically.
  *
  * Scale: one groupBy over the queue scan + config-sized fixture
  * rows; the timings average is one two-level aggregation.
  */
object CliHealth {

  /** health() over (pending, in_progress, failed, age_hours). */
  def levelColumn(p: Column, i: Column, f: Column, age: Column): Column = {
    val active = p + i + f
    val a = coalesce(age, lit(0.0))
    val ratio = when(active > 0, f.cast("double") / active.cast("double"))
      .otherwise(lit(0.0))
    when(active === 0, lit("healthy"))
      .when(a > 24.0 || ratio > 0.1, lit("unhealthy"))
      .when(f > 0 || a > 1.0, lit("degraded"))
      .otherwise(lit("healthy"))
  }

  /** health_reason() with the reference's exact strings. */
  def reasonColumn(p: Column, i: Column, f: Column, age: Column): Column = {
    val active = p + i + f
    val a = coalesce(age, lit(0.0))
    val ratio = when(active > 0, f.cast("double") / active.cast("double"))
      .otherwise(lit(0.0))
    val days = floor(a / 24.0).cast("long")
    val hoursRem = floor(a % 24.0).cast("long")
    val hoursOnly = floor(a).cast("long")
    val ageReason =
      when(a > 24.0,
        when(days > 0, concat(lit("oldest pending: "), days, lit("d "),
          hoursRem, lit("h (>24h)")))
          .otherwise(concat(lit("oldest pending: "), hoursRem,
            lit("h (>24h)"))))
        .when(a > 1.0, concat(lit("oldest pending: "), hoursOnly,
          lit("h (>1h)")))
    val failReason =
      when(ratio > 0.1, concat(lit("failed: "),
        round(ratio * 100).cast("long"), lit("% (>10%)")))
        .when(f > 0, concat(f, lit(" failed")))
    when(active === 0, lit(null).cast("string"))
      .otherwise(when(ageReason.isNotNull || failReason.isNotNull,
        concat_ws(", ", ageReason, failReason)))
  }

  /** The fixture axis: every health()/health_reason() arm. */
  def fixtureStats(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("empty", 0L, 0L, 0L, None: Option[Double]),
      ("clean", 5L, 1L, 0L, Some(0.5)),
      ("aged", 3L, 0L, 0L, Some(2.2)),
      ("failed_some", 10L, 0L, 1L, Some(0.3)),
      ("old_days", 2L, 0L, 0L, Some(50.0)),
      ("high_ratio", 1L, 0L, 5L, Some(0.2)),
      ("both", 1L, 0L, 5L, Some(30.0)))
      .toDF("name", "pending", "in_progress", "failed", "age_hours")
  }

  /** Per-collection stats over the unified-queue synthesis, oldest
    * pending aged against the log's max timestamp. */
  def collectionStats(spark: SparkSession, dir: String): DataFrame = {
    val q = QueueStatus.queue(spark, dir)
    val now = q.agg(max(col("created_at")).as("now_ts"))
    q.groupBy(col("collection").as("name"))
      .agg(
        sum(when(col("status") === "pending", 1L).otherwise(0L)).as("pending"),
        sum(when(col("status") === "in_progress", 1L).otherwise(0L))
          .as("in_progress"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("failed"),
        min(when(col("status") === "pending", col("created_at")))
          .as("oldest_pending"))
      .crossJoin(broadcast(now))
      .select(col("name"), col("pending"), col("in_progress"), col("failed"),
        when(col("oldest_pending").isNotNull,
          (unix_seconds(col("now_ts")) - unix_seconds(col("oldest_pending")))
            .cast("double") / 3600.0).as("age_hours"))
  }

  /** §3 `*Of` form: verdict + reason per stats row, the worst-of
    * overall across the corpus slices, and the avg-processing row. */
  def statusHealthOf(fixture: DataFrame, corpus: DataFrame,
                     timings: DataFrame): DataFrame = {
    def classified(df: DataFrame, section: String): DataFrame =
      df.select(lit(section).as("section"), col("name"),
        col("pending"), col("in_progress"), col("failed"),
        round(coalesce(col("age_hours"), lit(0.0)), 4).as("age_hours"),
        levelColumn(col("pending"), col("in_progress"), col("failed"),
          col("age_hours")).as("level"),
        reasonColumn(col("pending"), col("in_progress"), col("failed"),
          col("age_hours")).as("reason"),
        lit(null).cast("double").as("avg_ms"))
    val fixtureRows = classified(fixture, "fixture")
    val corpusRows = classified(corpus, "collection")
    // worst(): the Ord on the enum — healthy < degraded < unhealthy.
    val overall = corpusRows.select(
        when(col("level") === "healthy", 0)
          .when(col("level") === "degraded", 1).otherwise(2).as("sev"))
      .agg(max(col("sev")).as("worst"))
      .select(lit("overall").as("section"), lit("overall").as("name"),
        lit(0L).as("pending"), lit(0L).as("in_progress"), lit(0L).as("failed"),
        lit(0.0).as("age_hours"),
        when(col("worst") === 0, "healthy").when(col("worst") === 1, "degraded")
          .otherwise("unhealthy").as("level"),
        lit(null).cast("string").as("reason"),
        lit(null).cast("double").as("avg_ms"))
    val avgRow = timings.groupBy(col("queue_id"))
      .agg(sum(col("duration_ms")).as("total_ms"))
      .agg(org.apache.spark.sql.functions.avg(col("total_ms")).as("a"))
      .select(lit("avg").as("section"), lit("avg_processing_ms").as("name"),
        lit(0L).as("pending"), lit(0L).as("in_progress"), lit(0L).as("failed"),
        lit(0.0).as("age_hours"), lit(null).cast("string").as("level"),
        lit(null).cast("string").as("reason"),
        round(col("a"), 4).as("avg_ms"))
    fixtureRows.unionByName(corpusRows).unionByName(overall)
      .unionByName(avgRow)
      .orderBy(col("section"), col("name"))
  }

  def statusHealth(spark: SparkSession, dir: String): DataFrame =
    statusHealthOf(fixtureStats(spark), collectionStats(spark, dir),
      PerfStats.timings(spark, dir))
}
