package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with the reference's semantic_rerank test vectors
  * (semantic_rerank.rs tests module).
  */
class SemanticRerankSpec extends SparkSpec {

  private def mean(vectors: Seq[(Seq[Double], Double)]): Option[Seq[Double]] = {
    import spark.implicits._
    val rows = SemanticRerank.weightedMeanVector(
      vectors.toDF("embedding", "weight")).collect()
    rows.headOption.map(_.getSeq[Double](0))
  }

  // tests.rs test_weighted_mean_vector_basic
  test("weighted mean: equal weights average") {
    val m = mean(Seq((Seq(1.0, 0.0, 0.0), 1.0), (Seq(0.0, 1.0, 0.0), 1.0))).get
    assert(m.size == 3)
    assert(math.abs(m(0) - 0.5) < 1e-9 && math.abs(m(1) - 0.5) < 1e-9 && m(2) == 0.0)
  }

  // tests.rs test_weighted_mean_vector_weighted
  test("weighted mean: 3:1 weights") {
    val m = mean(Seq((Seq(1.0, 0.0), 3.0), (Seq(0.0, 1.0), 1.0))).get
    assert(math.abs(m(0) - 0.75) < 1e-9 && math.abs(m(1) - 0.25) < 1e-9)
  }

  // tests.rs test_weighted_mean_vector_empty / _zero_weights
  test("weighted mean: empty or zero-weight context yields no vector") {
    assert(mean(Nil).isEmpty)
    assert(mean(Seq((Seq(1.0, 0.0), 0.0), (Seq(0.0, 1.0), 0.0))).isEmpty)
  }

  // rerank_candidates semantics: min_similarity filter + combined order
  test("rerank: below-threshold candidate dropped, lexical can outrank semantic") {
    import spark.implicits._
    val meanVec = SemanticRerank.weightedMeanVector(
      Seq((Seq(1.0, 0.0), 1.0)).toDF("embedding", "weight"))
    val cands = Seq(
      (1L, Seq(1.0, 0.0), 0.0),  // sem = 1.0, lex = 0   → combined 0.6
      (2L, Seq(0.8, 0.6), 1.0),  // sem = 0.8, lex = 1   → combined 0.88
      (3L, Seq(0.0, 1.0), 1.0)   // sem = 0.0 < 0.15     → dropped
    ).toDF("vec_id", "embedding", "lex")
    val out = SemanticRerank.rerankOf(cands, meanVec).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq == Seq((2L, 1), (1L, 2)))
  }

  test("semantic_rerank on the corpus: dense ranks, context excluded") {
    val rows = SemanticRerank.semanticRerank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(1)).toSeq == (1 to rows.length))
    assert(rows.forall(_.getLong(0) >= 5L), "context vectors are not candidates")
  }
}
