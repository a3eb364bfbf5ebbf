package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's queue-health math: the dual-EWMA lane
  * vectors (queue_health/ewma_tests.rs), the A1 regression and A3
  * delta-rate probe arms (probes/trend.rs), the plurality debounce
  * tie-break (state.rs DebounceRings), and worst-of aggregation
  * (verdict.rs).
  */
class QueueHealthSpec extends SparkSpec {

  /** Final lanes over one lane fed `xs` in order. */
  private def lanes(xs: Seq[Double]): (Double, Double) = {
    import spark.implicits._
    val df = xs.zipWithIndex.map { case (x, i) => ("l", i.toLong, x) }
      .toDF("lane", "ord", "x")
    val r = QueueHealth.finalLanesOf(df, Seq("ord")).collect().head
    (r.getAs[Double]("fast"), r.getAs[Double]("slow"))
  }

  /** The sequential reference recurrence (ewma.rs:84 update), for
    * closed-form equivalence checks. */
  private def recurrence(xs: Seq[Double]): (Double, Double) =
    xs.foldLeft((Option.empty[(Double, Double)])) {
      case (None, x) => Some((x, x))
      case (Some((f, s)), x) =>
        Some((QueueHealth.FastAlpha * x + (1 - QueueHealth.FastAlpha) * f,
          QueueHealth.SlowAlpha * x + (1 - QueueHealth.SlowAlpha) * s))
    }.get

  test("first sample seeds both lanes (ewma_tests: first_sample_seeds_both_lanes)") {
    val (f, s) = lanes(Seq(5.0))
    assert(f == 5.0 && s == 5.0)
  }

  test("constant input converges both lanes (ewma_tests: constant_input_converges)") {
    val (f, s) = lanes(Seq.fill(1000)(7.0))
    assert(math.abs(f - 7.0) < 1e-6)
    assert(math.abs(s - 7.0) < 1e-3)
    assert(math.abs(f / s - 1.0) < 1e-3)
  }

  test("no premature alarm after a single 2x step (ewma_tests: DOM-01, ratio ~1.29)") {
    val (f, s) = lanes(Seq.fill(500)(1.0) :+ 2.0)
    val r = f / s
    assert(r < 2.0 && math.abs(r - 1.29) < 0.02)
  }

  test("sustained 3x regression crosses the ratio threshold by sample K") {
    val (f, s) = lanes(Seq.fill(500)(1.0) ++ Seq.fill(10)(3.0))
    assert(f / s > 2.0, s"ratio ${f / s} should exceed R=2.0")
  }

  test("closed form equals the sequential recurrence") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(300)(rnd.nextDouble() * 100)
    val (f, s) = lanes(xs)
    val (fr, sr) = recurrence(xs)
    assert(math.abs(f - fr) < 1e-9 * math.max(1.0, math.abs(fr)))
    assert(math.abs(s - sr) < 1e-9 * math.max(1.0, math.abs(sr)))
  }

  private def plurality(rags: Seq[String]): String = {
    import spark.implicits._
    val df = Seq(Tuple1(1L)).toDF("k")
    val cr = lit(rags.count(_ == "red"))
    val ca = lit(rags.count(_ == "amber"))
    val cg = lit(rags.count(_ == "green"))
    df.select(QueueHealth.pluralityRag(cr, ca, cg).as("p")).collect().head.getString(0)
  }

  test("plurality debounce: majority wins, ties break toward severity, empty is green") {
    assert(plurality(Seq("amber", "amber", "green")) == "amber")
    assert(plurality(Seq("red", "amber")) == "red")          // tie → more severe
    assert(plurality(Seq("green", "amber")) == "amber")      // tie → more severe
    assert(plurality(Seq("red", "green", "green")) == "green")
    assert(plurality(Seq.empty) == "green")
    assert(plurality(Seq("red", "red", "amber", "green", "green")) == "red")
  }

  /** Build a poll frame for one lane from (n_events, cost) pairs. */
  private def pollFrame(rows: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((n, c), i) =>
      ("q", new Timestamp(86400000L * i), n, c)
    }.toDF("lane", "poll", "n_events", "cost")
  }

  test("A3 arms: growth is red, draining is green, stuck non-empty is amber") {
    // Counts 10,20,40,80: deltas 10,20,40 — smoothed rate >> band → red.
    val grow = QueueHealth.queueVerdictOf(pollFrame(
      Seq((10L, 1.0), (20L, 1.0), (40L, 1.0), (80L, 1.0))))
      .orderBy("poll").collect()
    assert(grow.take(2).forall(_.getAs[String]("a3_raw") == "green")) // <2 delta samples
    assert(grow.last.getAs[String]("a3_raw") == "red")
    // Counts 80,40,20,10: negative deltas → draining → green.
    val drain = QueueHealth.queueVerdictOf(pollFrame(
      Seq((80L, 1.0), (40L, 1.0), (20L, 1.0), (10L, 1.0))))
      .orderBy("poll").collect()
    assert(drain.last.getAs[String]("a3_raw") == "green")
    // Flat non-empty counts: |rate| ≤ band → stuck → amber.
    val stuck = QueueHealth.queueVerdictOf(pollFrame(
      Seq((5L, 1.0), (5L, 1.0), (5L, 1.0), (5L, 1.0))))
      .orderBy("poll").collect()
    assert(stuck.last.getAs[String]("a3_raw") == "amber")
  }

  test("A1 regression fires amber only past floor and 2x ratio") {
    // Stable cost 1.0 then a sustained 10x step: fast lane crosses 2x baseline.
    val costs = Seq.fill(20)(1.0) ++ Seq.fill(5)(10.0)
    val out = QueueHealth.queueVerdictOf(pollFrame(costs.map(c => (5L, c))))
      .orderBy("poll").collect()
    assert(out.take(20).forall(_.getAs[String]("a1_raw") == "green"))
    assert(out.last.getAs[String]("a1_raw") == "amber")
    // Below the ms/KB floor the probe stays green regardless of ratio.
    val tiny = QueueHealth.queueVerdictOf(pollFrame(
      (Seq.fill(20)(0.001) ++ Seq.fill(5)(0.01)).map(c => (5L, c))))
      .orderBy("poll").collect()
    assert(tiny.forall(_.getAs[String]("a1_raw") == "green"))
  }

  test("debounce suppresses a one-poll flip; overall is worst-of") {
    // One red poll inside a green run: raw flips, debounced holds green.
    val counts = Seq(10L, 10L, 10L, 10L, 50L, 10L, 10L, 10L)
    val out = QueueHealth.queueVerdictOf(pollFrame(counts.map(n => (n, 1.0))))
      .orderBy("poll").collect()
    val flip = out.find(_.getAs[String]("a3_raw") == "red")
    assert(flip.isDefined, "the spike poll should flip raw red")
    assert(out.forall { r =>
      val deb = r.getAs[String]("a3")
      val ov = r.getAs[String]("overall")
      val a1 = r.getAs[String]("a1")
      ov == (if (Seq(a1, deb).contains("red")) "red"
             else if (Seq(a1, deb).contains("amber")) "amber" else "green")
    })
    // The single red raw never becomes the debounced plurality...
    assert(flip.get.getAs[String]("a3") != "red")
  }

  test("corpus query keeps the probe arms and verdict levels reachable") {
    val out = QueueHealth.queueVerdict(spark, sfDir).collect()
    assert(out.nonEmpty)
    val overall = out.map(_.getAs[String]("overall")).toSet
    assert(overall.contains("green"))
    assert(out.map(_.getAs[String]("a3_raw")).toSet.size > 1,
      "A3 should classify more than one level on the corpus")
    val te = QueueHealth.trendEwma(spark, sfDir).collect()
    assert(te.nonEmpty && te.forall(r => !r.isNullAt(r.fieldIndex("ratio"))))
  }
}
