package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Keyword final selection with DF penalty — the rerank→select stage of
  * the keyword pipeline (keyword_extraction/keyword_selector.rs:69
  * `select_keywords`): candidates whose corpus document-frequency ratio
  * exceeds `max_df_ratio` (default 0.80) are dropped as too generic;
  * survivors score `combined_score × idf` with the BM25-style
  * `idf_weight` (:52 — `ln((N-df+0.5)/(df+0.5)).max(0)`, neutral 1.0
  * when N or df is 0), carry their chunk stability count, and the top
  * `max_keywords` per document are kept in score order.
  *
  * Engine-stability note: the reference's stable sort breaks score ties
  * by candidate input order; here ranking is on round(score, 9) with a
  * phrase tiebreak so the order is deterministic and identical across
  * engines differing in the last ulp of `ln`.
  */
object KeywordSelect {

  /** idf_weight (keyword_selector.rs:52). */
  def idfWeight(totalDocs: Column, docFreq: Column): Column =
    when(totalDocs === 0 || docFreq === 0, lit(1.0))
      .otherwise(greatest(
        log((totalDocs.cast("double") - docFreq + 0.5) / (docFreq.cast("double") + 0.5)),
        lit(0.0)))

  /** select_keywords over a candidate frame (doc_id, phrase, ngram_size,
    * lexical_score, semantic_score, combined_score, doc_freq,
    * stability_count): DF-ratio gate, IDF-weighted score, top
    * `maxKeywords` per doc. `corpusSize` is the reference's
    * config.corpus_size (0 disables the ratio gate and neutralizes idf).
    */
  def selectKeywordsOf(cands: DataFrame, corpusSize: Long,
                       maxKeywords: Int = 50, maxDfRatio: Double = 0.80): DataFrame = {
    val gated =
      if (corpusSize > 0)
        cands.filter(!(col("doc_freq").cast("double") / corpusSize > maxDfRatio))
      else cands
    val scored = gated.withColumn("score",
      col("combined_score") * idfWeight(lit(corpusSize), col("doc_freq")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(round(col("score"), 9).desc, col("phrase"))
    scored
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= maxKeywords)
      .select(col("doc_id"), col("phrase"), col("ngram_size"),
        round(col("score"), 6).as("score"),
        round(col("semantic_score"), 6).as("semantic_score"),
        round(col("lexical_score"), 6).as("lexical_score"),
        col("stability_count"), col("rnk"))
  }

  /** keyword_select query: unigram + bigram candidates over the corpus
    * prose. Lexical score is the saturating-tf shape shared with
    * semantic_rerank (tf/(tf+1.2), k1 = 1.2); the semantic score is the
    * md5-nibble deterministic stand-in both engines compute identically
    * (the container has no embedding model — selection machinery is the
    * operator under test); combined = 0.6·sem + 0.4·lex
    * (semantic_rerank.rs weights). Stability counts the doc's 200-char
    * chunks containing the phrase. The highest-df unigrams sit just
    * over the 0.80 ratio gate, so the DF penalty genuinely fires.
    */
  def keywordSelect(spark: SparkSession, dir: String,
                    maxKeywords: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpusSize = docs.count() // parquet-metadata count: the config axis
    val base = docs
      .withColumn("ws", split(col("text"), "\\s+"))
      .withColumn("chunks", expr(
        "transform(sequence(0, CAST(ceil(length(text) / 200.0) AS INT) - 1)," +
          " i -> substr(text, i * 200 + 1, 200))"))
    val unis = base
      .select(col("doc_id"), col("chunks"), explode(col("ws")).as("phrase"))
      .withColumn("ngram_size", lit(1))
    val bis = base
      .select(col("doc_id"), col("chunks"),
        explode(expr("transform(sequence(1, size(ws) - 1)," +
          " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")).as("phrase"))
      .withColumn("ngram_size", lit(2))
    val tf = unis.unionByName(bis)
      .groupBy(col("doc_id"), col("phrase"), col("ngram_size"))
      .agg(count(lit(1)).as("tf"), first(col("chunks")).as("chunks"))
    val df = tf.groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
    val cands = tf.join(df, Seq("phrase"))
      .withColumn("lexical_score", col("tf") / (col("tf") + 1.2))
      .withColumn("semantic_score",
        conv(substring(md5(concat(col("phrase"), lit(":"), col("doc_id").cast("string"))), 1, 1),
          16, 10).cast("double") / 15.0)
      .withColumn("combined_score",
        lit(0.6) * col("semantic_score") + lit(0.4) * col("lexical_score"))
      .withColumn("stability_count",
        expr("size(filter(chunks, c -> contains(c, phrase)))"))
    selectKeywordsOf(cands, corpusSize, maxKeywords)
      .orderBy(col("doc_id"), col("rnk"))
  }
}
