package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's search-quality eval: the metrics.rs
  * evaluate_query vectors, path_match.rs normalization and glob
  * vectors, and the summarize/classify gates.
  */
class QualityMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def eval1(ranked: Seq[String], expected: Seq[String],
                    root: String = "", topK: Int = 10): Row = {
    val r = ranked.zipWithIndex.map { case (p, i) => (0L, i + 1, p) }
      .toDF("qid", "rank", "raw_path")
    val e = expected.map(p => (0L, p)).toDF("qid", "expected_raw")
    QualityMetrics.evaluateQueriesOf(r, e, root, topK).collect().head
  }

  private def frr(r: Row): Option[Int] =
    if (r.isNullAt(r.fieldIndex("first_relevant_rank"))) None
    else Some(r.getAs[Int]("first_relevant_rank"))

  test("top1 hit when expected is first (metrics.rs vector)") {
    val r = eval1(Seq("a.rs", "b.rs"), Seq("a.rs"))
    assert(r.getAs[Boolean]("top1_hit") && r.getAs[Boolean]("top3_hit") &&
      r.getAs[Boolean]("top10_hit"))
    assert(frr(r).contains(1) && r.getAs[Double]("mrr") == 1.0)
  }

  test("top3 but not top1 at rank 3; mrr 1/3") {
    val r = eval1(Seq("x.rs", "y.rs", "a.rs", "z.rs"), Seq("a.rs"))
    assert(!r.getAs[Boolean]("top1_hit") && r.getAs[Boolean]("top3_hit"))
    assert(frr(r).contains(3))
    assert(math.abs(r.getAs[Double]("mrr") - 1.0 / 3.0) < 1e-6)
  }

  test("no hit yields zero mrr, null rank, zero recall") {
    val r = eval1(Seq("x.rs", "y.rs"), Seq("a.rs"))
    assert(!r.getAs[Boolean]("top10_hit") && frr(r).isEmpty)
    assert(r.getAs[Double]("mrr") == 0.0 && r.getAs[Double]("recall_at10") == 0.0)
  }

  test("recall counts distinct expected matched; precision over deduped") {
    val r = eval1(Seq("a.rs", "z.rs"), Seq("a.rs", "b.rs"))
    assert(math.abs(r.getAs[Double]("recall_at10") - 0.5) < 1e-6)
    val p = eval1(Seq("a.rs", "x.rs", "y.rs", "z.rs"), Seq("a.rs"))
    assert(math.abs(p.getAs[Double]("precision_at10") - 0.25) < 1e-6)
  }

  test("duplicate rate reflects repeated paths; hits use raw ranks") {
    val d = eval1(Seq("a.rs", "a.rs", "b.rs", "b.rs"), Seq("a.rs"))
    assert(math.abs(d.getAs[Double]("duplicate_rate") - 0.5) < 1e-6)
    val h = eval1(Seq("x.rs", "x.rs", "a.rs"), Seq("a.rs"))
    assert(frr(h).contains(3) && !h.getAs[Boolean]("top1_hit") &&
      h.getAs[Boolean]("top3_hit"))
  }

  test("glob expectations: segment star, **/ leading segments, ** cross-separator, ?") {
    val g1 = eval1(Seq("src/rust/daemon/proto/workspace_daemon.proto"),
      Seq("**/proto/*.proto"))
    assert(g1.getAs[Boolean]("top1_hit") &&
      math.abs(g1.getAs[Double]("recall_at10") - 1.0) < 1e-6)
    // * stays within a segment
    val g2 = eval1(Seq("src/exact_search/sub/search.rs"), Seq("src/exact_search/*.rs"))
    assert(!g2.getAs[Boolean]("top10_hit"))
    // **/ zero segments
    val g3 = eval1(Seq("proto/workspace_daemon.proto"),
      Seq("**/proto/workspace_daemon.proto"))
    assert(g3.getAs[Boolean]("top1_hit"))
    // ** across separators
    val g4 = eval1(Seq("src/a/b/c/payload.rs"), Seq("src/**/payload.rs"))
    assert(g4.getAs[Boolean]("top1_hit"))
    // ? one non-separator char
    val g5 = eval1(Seq("v47.rs", "v4.rs"), Seq("v4?.rs"))
    assert(frr(g5).contains(1))
    val g6 = eval1(Seq("v4.rs"), Seq("v4?.rs"))
    assert(!g6.getAs[Boolean]("top10_hit"))
  }

  test("char classes match and negate, one non-separator byte") {
    assert(eval1(Seq("v47.rs"), Seq("v4[57].rs")).getAs[Boolean]("top1_hit"))
    assert(!eval1(Seq("v46.rs"), Seq("v4[57].rs")).getAs[Boolean]("top10_hit"))
    assert(eval1(Seq("v47.rs"), Seq("v4[!6].rs")).getAs[Boolean]("top1_hit"))
    assert(!eval1(Seq("v46.rs"), Seq("v4[!6].rs")).getAs[Boolean]("top10_hit"))
  }

  test("top_k bounds considered paths (expected at rank 11 unseen)") {
    val ranked = (0 until 10).map(i => s"f$i.rs") :+ "a.rs"
    val r = eval1(ranked, Seq("a.rs"))
    assert(!r.getAs[Boolean]("top10_hit") && frr(r).isEmpty)
  }

  test("normalization: backslashes, ./ prefixes, workspace root strip") {
    val r = eval1(Seq("/repo/src/a.rs"), Seq("src/a.rs"), root = "/repo")
    assert(r.getAs[Boolean]("top1_hit"))
    val r2 = eval1(Seq("./src\\a.rs"), Seq("src/a.rs"))
    assert(r2.getAs[Boolean]("top1_hit"))
    val r3 = eval1(Seq("/other/a.rs"), Seq("other/a.rs"), root = "/repo")
    assert(r3.getAs[Boolean]("top1_hit"), "non-matching root left intact")
  }

  test("summarize averages rates; verdict gates good/mixed/poor") {
    def evalsDf(rows: Seq[(String, Boolean, Boolean, Boolean, Double)]): DataFrame =
      rows.zipWithIndex.map { case ((m, t1, t3, t10, rec), i) =>
        (i.toLong, m, t1, t3, t10, 0.0, rec, 0.0,
          if (t1) 1.0 else 0.0, 10.0 * (i + 1))
      }.toDF("qid", "mode", "top1_hit", "top3_hit", "top10_hit",
        "precision_at10", "recall_at10", "duplicate_rate", "mrr", "latency_ms")
    val out = QualityMetrics.verdictOf(evalsDf(Seq(
      ("good", true, true, true, 1.0), ("good", true, true, true, 1.0),
      ("mixed", true, true, true, 0.5), ("mixed", true, true, true, 0.8),
      ("poor", false, false, false, 0.0), ("poor", false, false, false, 0.5))))
      .collect().map(r => r.getAs[String]("mode") ->
        (r.getAs[String]("grade"), r.getAs[String]("reasons"))).toMap
    assert(out("good")._1 == "good" && out("good")._2 == "")
    assert(out("mixed")._1 == "mixed")
    assert(out("mixed")._2 == "recall@10 65.0% is below 70.0%")
    assert(out("poor")._1 == "poor" && out("poor")._2.contains("top-3") &&
      out("poor")._2.contains("recall@10"))
  }

  test("corpus queries: all grades reachable, duplicate and glob arms live") {
    val sq = QualityMetrics.searchQuality(spark, sfDir).collect()
    assert(sq.nonEmpty)
    assert(sq.exists(_.getAs[Double]("duplicate_rate") > 0))
    assert(sq.exists(_.getAs[Boolean]("top1_hit")))
    assert(sq.exists(r => !r.getAs[Boolean]("top10_hit")))
    val qv = QualityMetrics.qualityVerdict(spark, sfDir).collect()
    assert(qv.length == 3)
    val grades = qv.map(_.getAs[String]("grade")).toSet
    assert(grades.size >= 2, s"want grade variety, got $grades")
  }
}
