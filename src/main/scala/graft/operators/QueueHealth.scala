package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Queue-health trend analytics — the data half of the reference's #133
  * functional-health verdict (queue_health/ewma.rs, probes/trend.rs,
  * state.rs DebounceRings, verdict.rs). The probe *inputs* there are
  * daemon instrumentation (per-item timings, DLQ counters); the math on
  * top of them — dual-rate EWMA trend detection, RAG classification,
  * plurality debounce, worst-of aggregation — is pure data processing
  * and is what these operators re-express over the events log.
  *
  * Dual-rate EWMA (ewma.rs:69 DualEwma): the first finite sample seeds
  * BOTH lanes; each later sample advances a lane by its own α
  * (`x ← α·s + (1−α)·x`, fast α=0.3 / slow α=0.01 — the config
  * defaults, config/queue_health.rs:14-19). The sequential recurrence
  * has the closed form
  *
  *   lane_n = (1−α)^(n−1)·x₁ + Σ_{i=2..n} α·(1−α)^(n−i)·x_i
  *
  * which turns an inherently ordered fold into ONE rank-window plus a
  * plain (map-side-combining) groupBy SUM — the distributable shape.
  * Terms older than a few 1/α horizons underflow gracefully to 0, so at
  * 100 TB a bounded recent-horizon filter per lane (e.g. last 10 k
  * samples for α=0.01 contributes all but <1e-40 of the value) caps the
  * sort without changing any rounded output; the streaming twin of the
  * same recurrence is a `flatMapGroupsWithState` fold.
  *
  * RAG rules reproduced exactly:
  *  - ratio = fast/slow; undefined (null) while unseeded or when
  *    |slow| < 1e-9 (ewma.rs:41 NEAR_ZERO, DOM-05).
  *  - slope: Flat inside the relative band |fast−slow|/|slow| < 0.05
  *    (ewma_tests.rs:8 FLAT_BAND), else Rising/Falling (ewma.rs:114).
  *  - A1/A2 regression (probes/trend.rs:58 evaluate_regression): Green
  *    unless seeded AND baseline ≥ floor AND ratio > regression_ratio
  *    (2.0), in which case Amber.
  *  - A3 delta-rate (probes/trend.rs:90): emptiness on the LIVE count
  *    (< dlq_empty_eps=1 ⇒ Green); <2 delta samples ⇒ Green; smoothed
  *    rate > band(1.0) ⇒ Red; < −band ⇒ Green (draining); else Amber.
  *  - Debounce (state.rs:98 DebounceRings.observe): plurality RAG over
  *    the ring of the last 5 raw verdicts, ties toward the more severe
  *    (the most-severe-first strictly-greater walk, state.rs:111).
  *  - Verdict (verdict.rs:47 from_probes): worst-of severity across
  *    probes.
  */
object QueueHealth {

  val FastAlpha = 0.3   // config/queue_health.rs:15
  val SlowAlpha = 0.01  // config/queue_health.rs:18
  val RegressionRatio = 2.0 // :21
  val DlqRateBand = 1.0     // :27
  val DlqEmptyEps = 1L      // :30
  val MsPerKbFloor = 0.1    // :33
  val FlatBand = 0.05       // ewma_tests.rs:8
  val DebounceWindow = 5    // :61
  val NearZero = 1e-9       // ewma.rs:41

  /** fast/slow with the DOM-05 near-zero guard: null when |slow|<1e-9. */
  def laneRatio(fast: Column, slow: Column): Column =
    when(abs(slow) < NearZero, lit(null).cast("double"))
      .otherwise(fast / slow)

  /** Slope classification with the relative flat band (ewma.rs:114). */
  def laneSlope(fast: Column, slow: Column): Column =
    when(abs(slow) < NearZero, lit("flat"))
      .when(abs(fast - slow) / abs(slow) < FlatBand, lit("flat"))
      .when(fast - slow > 0, lit("rising"))
      .otherwise(lit("falling"))

  /** A1/A2 regression RAG (probes/trend.rs:58): Amber iff baseline ≥
    * floor and ratio > threshold; Green otherwise (incl. the null
    * ratio). The caller guarantees seededness (n ≥ 1 rows per lane). */
  def regressionRag(fast: Column, slow: Column,
                    floor: Double = MsPerKbFloor,
                    threshold: Double = RegressionRatio): Column =
    when(slow >= floor && laneRatio(fast, slow) > threshold, lit("amber"))
      .otherwise(lit("green"))

  /** Plurality RAG with severity tie-break (state.rs:111): walk
    * red→amber→green keeping a strictly-greater count, starting from
    * (green, 0) — so green needs cg > max(cr, ca), amber needs
    * ca > cr, red needs cr > 0, and an empty ring is green. */
  def pluralityRag(cr: Column, ca: Column, cg: Column): Column =
    when(cg > greatest(cr, ca), lit("green"))
      .when(ca > cr, lit("amber"))
      .when(cr > 0, lit("red"))
      .otherwise(lit("green"))

  /** Worst-of two RAG columns (verdict.rs:47 max-severity). */
  def worstOf(a: Column, b: Column): Column =
    when(a === "red" || b === "red", lit("red"))
      .when(a === "amber" || b === "amber", lit("amber"))
      .otherwise(lit("green"))

  /** The closed-form weighted term for sample rank `rn` of `n` in a
    * lane: (1−α)^(n−1)·x for the seed row, α·(1−α)^(n−rn)·x after. */
  private def laneTerm(alpha: Double, x: Column, rn: Column, n: Column): Column =
    when(rn === 1, pow(lit(1 - alpha), n - 1) * x)
      .otherwise(lit(alpha) * pow(lit(1 - alpha), n - rn) * x)

  /** §3 `*Of` form: final dual-EWMA lanes per key over an ordered
    * sample stream. `samples` must carry (`lane`, `x`) plus the
    * ordering columns; non-finite samples are dropped (DOM-02). One
    * rank window + one groupBy — the sum distributes with map-side
    * combine; the rank sort is the per-lane sequential part. */
  def finalLanesOf(samples: DataFrame, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("lane")).orderBy(orderCols.map(col): _*)
    samples
      .filter(col("x").isNotNull && !isnan(col("x")))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lane"))))
      .groupBy(col("lane"))
      .agg(
        max(col("n")).as("n_samples"),
        sum(laneTerm(FastAlpha, col("x"), col("rn"), col("n"))).as("fast"),
        sum(laneTerm(SlowAlpha, col("x"), col("rn"), col("n"))).as("slow"))
  }

  /** trend_ewma query: one lane per event_type, samples = `value`
    * ordered by (ts, event_id). Emits the final lanes, the guarded
    * ratio, the flat-band slope, and the A1 regression RAG. */
  def trendEwma(spark: SparkSession, dir: String): DataFrame = {
    val samples = Tables.events(spark, dir)
      .select(col("event_type").as("lane"), col("value").as("x"),
        col("ts"), col("event_id"))
    finalLanesOf(samples, Seq("ts", "event_id"))
      .select(col("lane").as("event_type"), col("n_samples"),
        round(col("fast"), 6).as("ewma_fast"),
        round(col("slow"), 6).as("ewma_slow"),
        round(laneRatio(col("fast"), col("slow")), 6).as("ratio"),
        laneSlope(col("fast"), col("slow")).as("slope"),
        regressionRag(col("fast"), col("slow")).as("rag"))
      .orderBy(col("event_type"))
  }

  /** Running (per-poll) EWMA of `x` at rank `p` via the scaled prefix
    * sum: lane_p = (1−α)^p · Σ_{i≤p} u_i with u_1 = x₁·(1−α)^(−1) and
    * u_i = α·x_i·(1−α)^(−i). Exponents stay bounded while the poll
    * count does (here ≤ the log's day count; safe below ~1990 polls at
    * α=0.3 before (1/0.7)^p overflows — the unbounded-length exact
    * path is the recurrence itself, fold-shaped, in a streaming state
    * op). */
  private def runningLane(alpha: Double, x: Column, p: Column,
                          over: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val u = when(p === 1, x * pow(lit(1.0 / (1 - alpha)), p))
      .otherwise(lit(alpha) * x * pow(lit(1.0 / (1 - alpha)), p))
    pow(lit(1 - alpha), p) * sum(u).over(over)
  }

  /** §3 `*Of` form: the poll-loop verdict over a pre-aggregated poll
    * frame (`lane`, `poll`, `n_events`, `cost`). Per poll: the A1
    * cost-regression probe on the running dual EWMA of `cost`, the A3
    * delta-rate probe on the running fast EWMA of the per-poll count
    * delta, each debounced by plurality over its last 5 raw verdicts,
    * then the worst-of overall. */
  def queueVerdictOf(polls: DataFrame): DataFrame = {
    val byLane = Window.partitionBy(col("lane")).orderBy(col("poll"))
    val run = byLane.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ring = byLane.rowsBetween(-(DebounceWindow - 1), Window.currentRow)

    val withLanes = polls
      .withColumn("p", row_number().over(byLane))
      .withColumn("cost_fast", runningLane(FastAlpha, col("cost"), col("p"), run))
      .withColumn("cost_slow", runningLane(SlowAlpha, col("cost"), col("p"), run))
      // A3 feeds per-poll deltas; the delta stream's own rank is p−1.
      .withColumn("delta",
        (col("n_events") - lag(col("n_events"), 1).over(byLane)).cast("double"))
      .withColumn("rate",
        runningLane(FastAlpha, col("delta"), col("p") - 1,
          byLane.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    val raw = withLanes
      .withColumn("a1_raw", regressionRag(col("cost_fast"), col("cost_slow")))
      .withColumn("a3_raw",
        when(col("n_events") < DlqEmptyEps, lit("green"))     // live count, not EWMA
          .when(col("p") - 1 < 2, lit("green"))               // <2 delta samples
          .when(col("rate") > DlqRateBand, lit("red"))        // growing
          .when(col("rate") < -DlqRateBand, lit("green"))     // draining
          .otherwise(lit("amber")))                           // stuck

    def debounced(rag: Column): Column = pluralityRag(
      count(when(rag === "red", 1)).over(ring),
      count(when(rag === "amber", 1)).over(ring),
      count(when(rag === "green", 1)).over(ring))

    raw
      .withColumn("a1", debounced(col("a1_raw")))
      .withColumn("a3", debounced(col("a3_raw")))
      .select(col("lane"), col("poll"), col("n_events"),
        round(col("cost"), 4).as("cost"),
        round(laneRatio(col("cost_fast"), col("cost_slow")), 6).as("cost_ratio"),
        round(col("rate"), 6).as("dlq_rate"),
        col("a1_raw"), col("a1"), col("a3_raw"), col("a3"),
        worstOf(col("a1"), col("a3")).as("overall"))
  }

  /** queue_verdict query: lanes are users (each a queue's activity
    * log), polls are the days a lane has events (an empty day is a
    * poll that never ran — consistent in both engines), cost is the
    * poll's mean value (the ms/KB stand-in) and the A3 count signal is
    * the poll's event count. ~30 polls per lane keeps every arm of
    * both probes and the debounce ring live on the 30-day corpus. */
  def queueVerdict(spark: SparkSession, dir: String): DataFrame = {
    val polls = Tables.events(spark, dir)
      .groupBy(col("user_id").as("lane"),
        date_trunc("day", col("ts")).as("poll"))
      .agg(count(lit(1)).as("n_events"), avg(col("value")).as("cost"))
    queueVerdictOf(polls)
      .withColumnRenamed("lane", "user_id")
      .orderBy(col("user_id"), col("poll"))
  }
}
