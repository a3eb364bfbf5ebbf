package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SourceDiversity._

/** Reference vectors for the tier-based diversity engine, from BOTH
  * reference variants: client fusion_diversity_tests.rs (spillover
  * backfill) and daemon source_diversity/tests.rs (truncating). */
class SourceDiversitySpec extends SparkSpec {

  private def list(rows: Seq[(Long, Double, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "score", "source").withColumn("query_id", lit(0L))
  }

  private def outIds(df: DataFrame): Seq[Long] =
    df.orderBy("out_rnk").collect().map(_.getAs[Long]("id")).toSeq

  private def tiersOf(df: DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("tier")).toMap

  // ─── build_score_tiers vectors ─────────────────────────────────────

  test("tiers group close scores; far opens a new tier (score_tiers_groups_close_scores)") {
    // a 1.0, b 0.98 (within 0.05 of a), c 0.5 (far) → tiers {a,b},{c}
    val out = diversifyOf(list(Seq((1L, 1.0, "s1"), (2L, 0.98, "s2"), (3L, 0.5, "s3"))))
    val t = tiersOf(out)
    assert(t(1L) == 1 && t(2L) == 1 && t(3L) == 2)
  }

  test("each far score opens its own tier (score_tiers_each_in_own_tier)") {
    val out = diversifyOf(list(Seq((1L, 1.0, "s"), (2L, 0.5, "s"), (3L, 0.0, "s"))))
    assert(tiersOf(out).values.toSet == Set(1, 2, 3))
  }

  test("equal scores share one tier (score_tiers_all_equal_one_tier)") {
    val out = diversifyOf(list(Seq((1L, 0.8, "a"), (2L, 0.8, "b"), (3L, 0.8, "c"))))
    assert(tiersOf(out).values.toSet == Set(1))
  }

  test("threshold measured from the tier TOP, not the neighbor (build_score_tiers)") {
    // 0.95, 0.93 same tier; 0.91 is within 0.05 of 0.93 but NOT of the
    // tier top 0.95... |0.95-0.91|=0.04 <= 0.05 → still tier 1; 0.89
    // (|0.95-0.89|=0.06) opens tier 2 even though it's 0.02 from 0.91.
    val out = diversifyOf(list(Seq(
      (1L, 0.95, "a"), (2L, 0.93, "b"), (3L, 0.91, "c"), (4L, 0.89, "d"))))
    val t = tiersOf(out)
    assert(t(1L) == 1 && t(2L) == 1 && t(3L) == 1 && t(4L) == 2)
  }

  test("two tiers of two (test_build_tiers_multiple)") {
    val out = diversifyOf(list(Seq(
      (1L, 0.95, "a"), (2L, 0.93, "b"), (3L, 0.80, "c"), (4L, 0.78, "d"))))
    val t = tiersOf(out)
    assert(t(1L) == 1 && t(2L) == 1 && t(3L) == 2 && t(4L) == 2)
  }

  test("empty input yields empty output (test_build_tiers_empty / diversity_empty)") {
    val empty = list(Seq.empty)
    assert(diversifyOf(empty).count() == 0)
    assert(diversifyOf(empty, spillover = false).count() == 0)
  }

  // ─── interleave vectors ────────────────────────────────────────────

  test("same-tier round robin alternates sources (interleave_two_sources_round_robin / test_diversify_same_tier_interleaves)") {
    // a1 .95, a2 .94, b1 .93, b2 .92 within θ=0.10... with θ=0.05 all
    // within |0.95-0.92|=0.03 → one tier. Round robin: a1 b1 a2 b2.
    val out = diversifyOf(list(Seq(
      (1L, 0.95, "a"), (2L, 0.94, "a"), (3L, 0.93, "b"), (4L, 0.92, "b"))))
    assert(outIds(out) == Seq(1L, 3L, 2L, 4L))
  }

  test("single source preserves order (interleave_single_source_preserves_order)") {
    val out = diversifyOf(list(Seq((1L, 0.9, "s"), (2L, 0.8, "s"), (3L, 0.7, "s"))))
    assert(outIds(out) == Seq(1L, 2L, 3L))
  }

  test("cross-tier order preserved (test_diversify_preserves_cross_tier_order)") {
    val out = diversifyOf(list(Seq(
      (1L, 0.95, "a"), (2L, 0.93, "b"), (3L, 0.70, "a"), (4L, 0.68, "b"))),
      maxPerSource = 5)
    val ids = outIds(out)
    assert(ids.indexOf(1L) < ids.indexOf(3L))
    assert(ids.take(2).toSet == Set(1L, 2L))
  }

  // ─── cap + spillover vs truncation ─────────────────────────────────

  test("client cap pushes over-cap to the tail, count restored (diversity_max_per_source_caps_single_source)") {
    // 5 same-source results, cap 3 → 3 kept + 2 spillover = 5 rows.
    val in = list(Seq((1L, 1.0, "p"), (2L, 0.9, "p"), (3L, 0.8, "p"),
      (4L, 0.7, "p"), (5L, 0.6, "p")))
    val out = diversifyOf(in, spillover = true)
    assert(out.count() == 5, "backfill must restore total count")
    assert(outIds(out) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.filter(!col("kept")).collect().map(_.getAs[Long]("id")).toSet
      == Set(4L, 5L))
  }

  test("daemon cap truncates (test_diversify_caps_per_source)") {
    // a×4 (.95 .93 .91 .89 — ONE tier: all within 0.05 of... .89 is
    // 0.06 from .95 → tier 2!) Faithful to the reference vector: the
    // assertion is on counts, not tiers: cap 2 keeps a1 a2 and b1.
    val in = list(Seq((1L, 0.95, "a"), (2L, 0.93, "a"), (3L, 0.91, "a"),
      (4L, 0.89, "a"), (5L, 0.87, "b")))
    val out = diversifyOf(in, maxPerSource = 2, spillover = false)
    val rows = out.collect()
    assert(rows.count(_.getAs[String]("source") == "a") == 2)
    assert(rows.exists(_.getAs[Long]("id") == 5L))
  }

  test("single result passes through (test_diversify_single_result)") {
    val out = diversifyOf(list(Seq((1L, 0.9, "a"))), spillover = false)
    assert(outIds(out) == Seq(1L))
  }

  // ─── registered corpus queries ─────────────────────────────────────

  test("corpus: spillover variant is a permutation; strict is capped subset") {
    val tiers = SourceDiversity.diversifyTiers(spark, sfDir)
    val strict = SourceDiversity.diversifyStrict(spark, sfDir)
    val t = tiers.collect()
    assert(t.length == 30, "spillover drops nothing")
    // per-source kept counts never exceed the cap
    val keptBySource = t.filter(_.getAs[Boolean]("kept"))
      .groupBy(_.getAs[String]("source")).map(_._2.length)
    assert(keptBySource.forall(_ <= MaxPerSource))
    val s = strict.collect()
    assert(s.length < 30 && s.forall(_.getAs[Boolean]("kept")))
    val strictBySource = s.groupBy(_.getAs[String]("source")).map(_._2.length)
    assert(strictBySource.forall(_ <= MaxPerSource))
    // metrics: unique/total over the OUTPUT slice
    val div = t.head.getAs[Double]("div_score")
    val uniq = t.map(_.getAs[String]("source")).distinct.length.toDouble
    assert(math.abs(div - BigDecimal(uniq / t.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
