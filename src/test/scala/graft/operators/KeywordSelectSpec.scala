package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Keyword-selection parity with the reference's own unit vectors
  * (keyword_extraction/keyword_selector.rs:137-241, cited per case).
  */
class KeywordSelectSpec extends SparkSpec {
  import spark.implicits._

  /** make_candidate (keyword_selector.rs:126) + per-phrase df/chunk
    * lookups as columns. */
  private def cands(rows: Seq[(String, Double, Double, Double)],
                    df: String => Long = _ => 0L,
                    chunks: String => Int = _ => 2): DataFrame =
    rows.map { case (phrase, combined, semantic, lexical) =>
      (1L, phrase, phrase.split(' ').length, lexical, semantic, combined,
        df(phrase), chunks(phrase))
    }.toDF("doc_id", "phrase", "ngram_size", "lexical_score",
      "semantic_score", "combined_score", "doc_freq", "stability_count")

  private def phrasesOf(out: DataFrame): Seq[String] =
    out.orderBy("rnk").collect().map(_.getAs[String]("phrase")).toSeq

  // keyword_selector.rs:138 test_select_keywords_basic
  test("keyword select: ranks by combined score when corpus stats are absent") {
    val out = KeywordSelect.selectKeywordsOf(cands(Seq(
      ("vector search", 0.9, 0.85, 2.0),
      ("embedding", 0.7, 0.65, 1.8),
      ("database", 0.5, 0.45, 1.5))), corpusSize = 0, maxKeywords = 10)
    assert(phrasesOf(out) == Seq("vector search", "embedding", "database"))
  }

  // keyword_selector.rs:156 test_select_keywords_df_penalty — 'data' in
  // 90% of a 100-doc corpus exceeds the 0.80 ratio and drops.
  test("keyword select: DF ratio gate suppresses generic terms") {
    val out = KeywordSelect.selectKeywordsOf(
      cands(Seq(("data", 0.9, 0.85, 2.0), ("qdrant", 0.7, 0.65, 1.8)),
        df = p => if (p == "data") 90L else 5L),
      corpusSize = 100, maxKeywords = 10)
    val selected = phrasesOf(out)
    assert(!selected.contains("data") && selected.contains("qdrant"))
  }

  // keyword_selector.rs:187 test_select_keywords_max_limit
  test("keyword select: truncates to max_keywords") {
    val many = (0 until 100).map(i => (f"term_$i%d", 1.0 - i * 0.01, 0.5, 1.0))
    val out = KeywordSelect.selectKeywordsOf(cands(many), corpusSize = 0, maxKeywords = 5)
    assert(out.count() == 5)
    assert(phrasesOf(out).head == "term_0")
  }

  // keyword_selector.rs:201 test_select_keywords_stability_count
  test("keyword select: stability count passes through") {
    val out = KeywordSelect.selectKeywordsOf(
      cands(Seq(("async runtime", 0.8, 0.7, 1.5)), chunks = _ => 5),
      corpusSize = 0)
    assert(out.collect().head.getAs[Int]("stability_count") == 5)
  }

  // keyword_selector.rs:210-235 idf_weight vectors
  test("keyword select: idf_weight vectors") {
    def idf(n: Long, df: Long): Double =
      Seq((n, df)).toDF("n", "df")
        .select(KeywordSelect.idfWeight(col("n"), col("df")).as("idf"))
        .collect().head.getDouble(0)
    assert(idf(1000L, 1L) > idf(1000L, 500L), "rare term must out-weight common")
    assert(idf(0L, 0L) == 1.0, "zero corpus is neutral")
    assert(idf(100L, 100L) == 0.0, "universal term clamps to 0")
  }

  // keyword_selector.rs:238 test_select_keywords_empty_input
  test("keyword select: empty input selects nothing") {
    val out = KeywordSelect.selectKeywordsOf(cands(Seq.empty), corpusSize = 0)
    assert(out.count() == 0)
  }

  // the composed corpus query: the DF gate really fires (the corpus's
  // highest-df unigrams sit over the 0.80 ratio) and output is capped
  test("keyword select: corpus query drops over-ratio unigrams and caps at 5") {
    val out = KeywordSelect.keywordSelect(spark, sfDir).cache()
    val perDoc = out.groupBy("doc_id").count().agg(max("count")).collect().head.getLong(0)
    assert(perDoc <= 5)
    val docs = graft.Tables.documents(spark, sfDir)
    val n = docs.count().toDouble
    val overRatio = docs
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("phrase"))
      .distinct().groupBy("phrase").count()
      .filter(col("count") / n > 0.80)
      .collect().map(_.getAs[String]("phrase")).toSet
    if (overRatio.nonEmpty) {
      val selectedPhrases = out.select("phrase").distinct()
        .collect().map(_.getString(0)).toSet
      assert(overRatio.intersect(selectedPhrases).isEmpty,
        s"over-ratio phrases must never be selected: ${overRatio.intersect(selectedPhrases)}")
    }
    out.unpersist()
  }
}
