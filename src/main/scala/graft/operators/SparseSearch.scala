package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Sparse (BM25) retrieval, hybrid RRF fusion, grep, and diversity
  * re-ranking — the reference's search core re-expressed as batch
  * DataFrame jobs.
  *
  * Reference semantics:
  *  - BM25: `embedding/bm25.rs:184` — `IDF * (k1*tf)/(tf+k1)` with
  *    `IDF = ln((N-df+0.5)/(df+0.5)).max(0)`, k1 = 1.2 (no length
  *    normalization, i.e. b = 0 — matches the reference exactly).
  *  - Hybrid RRF: `storage/search.rs:368` — fetch 2k from each ranker,
  *    score `w/(60+rank)`, sum per id, sort desc.
  *  - Diversity penalty: `source_diversity/penalty.rs:51` — the Nth
  *    consecutive same-source result is multiplied by `0.85^(N-1)`,
  *    then the list re-sorts by adjusted score.
  *
  * Scale posture: corpus stats (term → df) are a tiny aggregate that is
  * broadcast back against the term-frequency table; the only wide
  * shuffle is the (doc, term) groupBy, which partial-aggregates
  * map-side. Rankings output integer ranks only (hash-stable).
  */
object SparseSearch {

  val K1 = 1.2

  /** (doc_id, term, tf) — one shuffle with map-side combine. */
  def termFreq(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokenizeSimple(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** (term, df) document frequencies — small, broadcastable. */
  def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** tf table with a per-term df column via one window pass — a single
    * tokenize scan instead of recomputing termFreq for the stats side.
    */
  private def tfWithDf(docs: DataFrame): DataFrame =
    termFreq(docs).withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("term"))))

  /** BM25 IDF: ln((N-df+0.5)/(df+0.5)) floored at 0. */
  private def idfCol(n: Long): org.apache.spark.sql.Column =
    greatest(log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)), lit(0.0))

  /** BM25-ranked retrieval of `k` documents for a fixed text query.
    * Two-pass: corpus stats then scoring; both sides of the scoring
    * join are pre-filtered to the query's terms, so the broadcast is a
    * handful of rows regardless of corpus size.
    */
  def bm25TopK(spark: SparkSession, dir: String,
               query: String = "dup vector window fast", k: Int = 10): DataFrame =
    bm25TopKDocs(Tables.documents(spark, dir), query, k)

  /** BM25 retrieval over any (doc_id, text) DataFrame — the generic core
    * behind [[bm25TopK]], also exercised by the reference-parity specs.
    */
  def bm25TopKDocs(docs: DataFrame, query: String, k: Int): DataFrame = {
    val n = docs.count()
    val queryTerms = query.toLowerCase.split("[^a-z0-9_]+").toSeq
      .filter(t => t.length > 1 && !EnglishStopwords.contains(t)).distinct

    val scored = tfWithDf(docs)
      .filter(col("term").isin(queryTerms: _*))
      .withColumn("idf", idfCol(n))
      .withColumn("contrib", col("idf") * (lit(K1) * col("tf")) / (col("tf") + lit(K1)))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
      .filter(col("score") > 0) // bm25.rs drops zero-score entries
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).as("rnk"))
      .orderBy(col("rnk"))
  }

  /** Sparse query expansion (reference:
    * client/src/search/expansion.rs:16 `merge_sparse_vectors` +
    * search_tests_score.rs DEFAULT_EXPANSION_WEIGHT = 0.5): expansion
    * terms contribute at `weight`, and ONLY if they are not already
    * query terms (add-if-absent merge). Pure map function. */
  def mergeSparseVectors(original: Map[String, Double],
                         expansion: Map[String, Double],
                         weight: Double = 0.5): Map[String, Double] =
    expansion.foldLeft(original) { case (acc, (t, v)) =>
      if (acc.contains(t)) acc else acc + (t -> v * weight)
    }

  /** BM25 retrieval with expansion keywords merged at `weight` — the
    * search tool's tag-basket expansion path, as one plan: per-term
    * weights ride a broadcast dimension into the scoring join.
    */
  def bm25TopKExpanded(spark: SparkSession, dir: String,
                       query: String = "dup vector",
                       expansion: Seq[String] = Seq("window", "fast", "line"),
                       weight: Double = 0.5, k: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val qTerms = query.toLowerCase.split("[^a-z0-9_]+").toSeq
      .filter(t => t.length > 1 && !EnglishStopwords.contains(t)).distinct
    val weights = mergeSparseVectors(
      qTerms.map(_ -> 1.0).toMap, expansion.map(_ -> 1.0).toMap, weight)

    import spark.implicits._
    val weightDf = weights.toSeq.toDF("term", "tw")
    val scored = tfWithDf(docs)
      .join(broadcast(weightDf), "term")
      .withColumn("idf", idfCol(n))
      .withColumn("contrib",
        col("idf") * (lit(K1) * col("tf")) / (col("tf") + lit(K1)) * col("tw"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
      .filter(col("score") > 0)
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).as("rnk"))
      .orderBy(col("rnk"))
  }

  /** Per-document sparse-vector summary (the reference materializes one
    * sparse BM25 vector per chunk — `embedding/bm25.rs:162`): number of
    * non-zero terms and the L2 norm of the BM25 weights.
    */
  def sparseVectors(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    tfWithDf(docs)
      .withColumn("idf", idfCol(n))
      .withColumn("w", col("idf") * (lit(K1) * col("tf")) / (col("tf") + lit(K1)))
      .filter(col("w") > 0)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nnz"),
        round(sqrt(sum(col("w") * col("w"))), 4).as("l2_norm"))
      .orderBy(col("doc_id"))
  }

  /** Hybrid dense+sparse retrieval with Reciprocal Rank Fusion.
    * doc_id and vec_id share the id space (one collection, two named
    * vectors — the Qdrant model). Each ranker contributes
    * `weight/(60+rank)`; fused scores are exact rationals, so ordering
    * is engine-stable.
    */
  def hybridRrf(spark: SparkSession, dir: String,
                queryId: Long = 0L, query: String = "dup vector window fast",
                k: Int = 20, denseWeight: Double = 1.0, sparseWeight: Double = 1.0): DataFrame = {
    val fetch = k * 2 // reference fetches limit*2 from each ranker
    val dense = VectorSearch.denseTopK(spark, dir, queryId = queryId, k = fetch)
      .select(col("vec_id").as("id"), col("rnk").as("dense_rank"))
    val sparse = bm25TopK(spark, dir, query = query, k = fetch)
      .select(col("doc_id").as("id"), col("rnk").as("sparse_rank"))

    val fused = dense.join(sparse, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(denseWeight) / (lit(60.0) + col("dense_rank")), lit(0.0)) +
        coalesce(lit(sparseWeight) / (lit(60.0) + col("sparse_rank")), lit(0.0)))
    fused
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
      .select(col("id"),
        row_number().over(Window.orderBy(col("rrf").desc, col("id"))).as("rnk"))
      .orderBy(col("rnk"))
  }

  /** Regex text search with per-document match counts (the reference's
    * `grep` MCP tool over FTS — mcp-server/src/tools/grep.rs). A single
    * projected scan; the regex runs codegen'd per row.
    */
  def grepSearch(spark: SparkSession, dir: String,
                 pattern: String = "quer(y|ies)"): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(col("text"), lit(pattern)).as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy(col("doc_id"))

  /** Source-diversity re-ranking of the hybrid result list
    * (penalty.rs semantics, single source tier): the Nth consecutive
    * same-source result is scaled by `0.85^(N-1)`, then re-sorted.
    * Consecutive runs are found with gaps-and-islands over the
    * original ranking — fully declarative, no driver loop.
    */
  def diversityRerank(spark: SparkSession, dir: String,
                      k: Int = 20, penalty: Double = 0.85): DataFrame = {
    val hybrid = hybridRrf(spark, dir, k = k)
      .withColumn("score",
        coalesce(lit(1.0) / (lit(60.0) + col("rnk")), lit(0.0))) // monotone stand-in score
    val docs = Tables.documents(spark, dir).select(col("doc_id").as("id"), col("source"))
    val ranked = hybrid.join(broadcast(docs), Seq("id"))
    applyDiversityPenalty(ranked.drop("rnk"), penalty)
      .select(col("id"), col("source"),
        row_number().over(Window.orderBy(col("adj_score").desc, col("id"))).as("rnk"))
      .orderBy(col("rnk"))
  }

  /** The penalty core (penalty.rs:51 semantics, single source tier):
    * rank the rows by (score desc, id), find consecutive same-`source`
    * runs with gaps-and-islands, scale the Nth run member by
    * `penalty^(N-1)` into `adj_score`. Generic over any DataFrame with
    * (id, score, source) — reference-parity specs feed it the
    * reference's own test vectors.
    */
  def applyDiversityPenalty(ranked: DataFrame, penalty: Double): DataFrame = {
    val byRank = Window.orderBy(col("score").desc, col("id"))
    val bySourceRank = Window.partitionBy(col("source")).orderBy(col("score").desc, col("id"))
    val islands = ranked
      .withColumn("rn", row_number().over(byRank))
      .withColumn("srn", row_number().over(bySourceRank))
      .withColumn("island", col("rn") - col("srn"))
    val byIsland = Window.partitionBy(col("source"), col("island")).orderBy(col("rn"))
    islands
      .withColumn("run", row_number().over(byIsland) - 1)
      .withColumn("adj_score", col("score") * pow(lit(penalty), col("run")))
      .drop("rn", "srn", "island", "run")
  }

  /** Top tf-idf keyword per document (the reference's lexical candidate
    * stage — keyword_extraction/lexical_candidates). tf·ln(N/df),
    * deterministic term-asc tiebreak.
    */
  def keywordTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val scored = tfWithDf(docs)
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("term").as("keyword"))
      .orderBy(col("doc_id"))
  }
}
