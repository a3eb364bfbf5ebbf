package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Idle-state flip-flop analysis — the reference's transition-history
  * diagnostics (daemon/core/src/idle_history/history.rs:114
  * `analyze_flip_flops` over the JSONL transition log): within the
  * last `hours` of history, count transitions, the per-hour rate, the
  * mean time spent in the previous mode, the number of SHORT stays
  * (< 30 s, history.rs:137), the flip-flop flag (rate > threshold,
  * default 10/h at history.rs:36), and the recommended cooloff
  * increase `ceil(rate / threshold) - 1` when flipping
  * (history.rs:145). The JSONL file management / rotation around it is
  * environment; the ANALYSIS is one windowed aggregate.
  *
  * Corpus mapping (documented divergences): each `user_id` is a
  * daemon instance's transition log and each event a transition;
  * `duration_in_previous_secs` is not a recorded field here, so it
  * derives as the inter-transition gap (lag over the full log, THEN
  * the window filter — in-window rows keep the duration that crosses
  * the window edge, exactly like recorded durations would). A user's
  * first-ever event has no previous mode and is not a transition;
  * users with no in-window transitions emit no row.
  *
  * Relational shape: one lag window + one groupBy, both PARTITIONED by
  * user — two shuffles ∝ rows, map-side combinable aggregates. The
  * `now` anchor (the log's max ts) is a 1-row broadcast.
  */
object IdleHistory {

  /** analyze_flip_flops over a (user_id, ts, event_id) transition
    * frame; `hours` is the analysis window, `threshold` the flip-flop
    * rate in transitions/hour.
    */
  def flipFlopsOf(events: DataFrame, hours: Double,
                  threshold: Double): DataFrame = {
    val now = events.agg(max(col("ts")).as("now_ts"))
    val lagW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withDur = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(lagW))
      .withColumn("duration_secs",
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) / 1e6)
      .filter(col("prev_ts").isNotNull)
    val inWindow = withDur.join(broadcast(now),
        unix_micros(col("ts")) >=
          unix_micros(col("now_ts")) - (lit(hours) * 3600.0 * 1e6).cast("long"))
    val perHour = count(lit(1)).cast("double") / lit(hours)
    inWindow.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("transition_count"),
        round(perHour, 4).as("transitions_per_hour"),
        round(avg(col("duration_secs")), 4).as("avg_mode_duration_secs"),
        sum(when(col("duration_secs") < 30.0, 1).otherwise(0)).as("short_transitions"),
        (perHour > threshold).as("is_flip_flopping"),
        when(perHour > threshold,
            ceil(perHour / threshold).cast("long") - 1L)
          .otherwise(lit(0L)).as("recommended_cooloff_increase"))
      .orderBy(col("user_id"))
  }

  /** idle_flipflops query: the 7-day rotation window (history.rs:36
    * max_age) over the events log; threshold 0.1/h puts the corpus's
    * ~0.1/h per-user rates astride the flag so BOTH arms and the
    * cooloff recommendation are live (the reference default 10/h is a
    * daemon-scale constant; the ratio semantics are identical).
    */
  def idleFlipflops(spark: SparkSession, dir: String,
                    hours: Double = 168.0, threshold: Double = 0.1): DataFrame =
    flipFlopsOf(
      Tables.events(spark, dir).select(col("user_id"), col("ts"), col("event_id")),
      hours, threshold)
}
