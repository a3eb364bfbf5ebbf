package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queue-depth adaptive throttling (watching_queue/throttle.rs, Task
  * 461.8) — the watcher's back-pressure decision layer:
  *
  *  - update_from_queue (:102): depth = the unified queue's not-done
  *    rows (the same gauge as queue_depth_bytes); level = critical at
  *    ≥ 5000, high at ≥ 1000, else normal; per-collection depths
  *    alongside.
  *  - should_throttle (:156): normal never throttles; high/critical
  *    throttle events whose running counter is NOT ≡ 0 mod the skip
  *    ratio — with the defaults (2 / 4) that KEEPS 1 in N and skips
  *    the rest, the opposite of the config field's "skip 1 in N"
  *    doc-comment (implementation wins, quirk pinned in the spec).
  *  - F-045: critical-load throttled events set needs_full_reconcile
  *    so the reconciliation loop recovers the drops; high-load skips
  *    do NOT set it.
  *
  * Scale: two aggregations over the queue scan + a config-sized
  * counter fixture — map-only decisions.
  */
object QueueThrottle {

  val HighThreshold = 1000L
  val CriticalThreshold = 5000L
  val HighSkipRatio = 2L
  val CriticalSkipRatio = 4L

  def levelOf(depth: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(depth >= CriticalThreshold, lit("critical"))
      .when(depth >= HighThreshold, lit("high"))
      .otherwise(lit("normal"))

  /** §3 `*Of` form: depth + level rows (overall and per collection)
    * and the should_throttle verdict table over a counter axis for
    * each level — one long (section, key, n, level, throttled,
    * reconcile_flag) frame. */
  def queueThrottleOf(queue: DataFrame): DataFrame = {
    val live = queue.filter(col("status") =!= "done")
    val overall = live.agg(count(lit(1)).as("n"))
      .select(lit("depth").as("section"), lit("__total__").as("key"),
        col("n"), levelOf(col("n")).as("level"),
        // false, not NULL: NULL booleans round-trip as NaN through the
        // gate's pandas canon (the project_registry lesson).
        lit(false).as("throttled"),
        lit(false).as("reconcile_flag"))
    val perColl = live.groupBy(col("collection").as("key"))
      .agg(count(lit(1)).as("n"))
      .select(lit("depth").as("section"), col("key"), col("n"),
        levelOf(col("n")).as("level"),
        lit(false).as("throttled"),
        lit(false).as("reconcile_flag"))
    // Counter fixture 0..19 × the three levels.
    val spark = queue.sparkSession
    import spark.implicits._
    val counters = (0L until 20L).flatMap(c =>
      Seq(("normal", c), ("high", c), ("critical", c)))
      .toDF("level", "counter")
    val throttled = when(col("level") === "normal", lit(false))
      .when(col("level") === "high", pmod(col("counter"), lit(HighSkipRatio)) =!= 0)
      .otherwise(pmod(col("counter"), lit(CriticalSkipRatio)) =!= 0)
    val verdicts = counters.select(lit("throttle").as("section"),
      col("counter").cast("string").as("key"),
      col("counter").as("n"), col("level"),
      throttled.as("throttled"),
      // F-045: only CRITICAL throttles request the full reconcile.
      (col("level") === "critical" && throttled).as("reconcile_flag"))
    overall.unionByName(perColl).unionByName(verdicts)
      .orderBy(col("section"), col("level"), col("n"), col("key"))
  }

  def queueThrottle(spark: SparkSession, dir: String): DataFrame =
    queueThrottleOf(QueueStatus.queue(spark, dir))
}
