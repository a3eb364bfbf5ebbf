package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Unigram-LM quality scoring — the perplexity-proxy filter a training
  * pipeline runs to drop gibberish/low-quality text (the CCNet/KenLM
  * idea reduced to its unigram core so a SQL oracle can reproduce it
  * bit-for-bit): score = mean log10 unigram probability of the
  * document's words under the corpus's own top-K vocabulary;
  * out-of-vocabulary words get the 1/total floor. Low (very negative)
  * scores mean improbable token streams.
  *
  * Scale shape: ONE corpus aggregation builds (vocabulary, total) —
  * the top-K cut runs as a distributed TakeOrdered (never a global
  * window); the vocabulary is bounded by K, so scoring is a broadcast
  * join + one per-doc partial-aggregated mean. Shuffles: the vocab
  * count (∝ distinct words) and the per-doc mean (∝ tokens,
  * map-combined to ∝ docs). No corpus-sized state on any single node.
  */
object LmQuality {

  private def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  def lmQuality(spark: SparkSession, dir: String,
                vocabSize: Int = 10000, keepThreshold: Double = -4.0): DataFrame =
    lmQualityOf(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      vocabSize, keepThreshold)

  /** §3 `*Of` form over any (doc_id, text) frame. Output: (doc_id,
    * avg_logprob rounded to 4 dp, keep). Wordless documents score 0.0
    * and are dropped (nothing to keep); every real score is < 0.
    */
  def lmQualityOf(docs: DataFrame, vocabSize: Int, keepThreshold: Double): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(words(col("text"))).as("word"))
    // distributed top-K: orderBy+limit plans as TakeOrdered, not a
    // single-partition window; (cnt desc, word) totalizes the boundary
    val vocab = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(vocabSize)
    val total = toks.agg(count(lit(1)).cast("double").as("total"))
    val perDoc = toks
      .join(broadcast(vocab), Seq("word"), "left")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(avg(log10(coalesce(col("cnt"), lit(1L)).cast("double") / col("total")))
        .as("lp"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(coalesce(col("lp"), lit(0.0)), 4).as("avg_logprob"))
      .withColumn("keep",
        (col("avg_logprob") >= keepThreshold && col("avg_logprob") < 0.0).cast("int"))
      .orderBy(col("doc_id"))
  }
}

/** Eval-set decontamination — the n-gram-overlap check every serious
  * pre-training pipeline runs before training: any training document
  * sharing a long word-n-gram with a benchmark/eval document is flagged
  * (the GPT-3 appendix-C / Gopher §A1.2 procedure, word 8-grams here to
  * fit the corpus's document lengths).
  *
  * Scale shape: the eval set is a FIXED-SIZE benchmark (bounded by
  * construction, not a corpus fraction), so its distinct gram table
  * broadcasts at any corpus size; per-document distinct-gram counts are
  * IN-ROW array arithmetic (map-only); only the overlap path shuffles,
  * and it shuffles ∝ matched gram occurrences — at 100 TB that is the
  * contaminated sliver, never the corpus.
  */
object Decontamination {

  /** Lowercased whitespace words, empties dropped. */
  private def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => w =!= "")

  /** Distinct word n-grams of a word array (space-joined). The word
    * array is BOUND ONCE per row through an outer lambda variable:
    * passing the raw `w` expression straight into the gram lambda would
    * re-evaluate it (the full split/filter of the text) inside EVERY
    * `element_at` — interpreted higher-order lambdas get no common-
    * subexpression elimination, so an n-gram pass turns into
    * grams × n re-splits per document (measured at sf0.1: 23 s for the
    * gram projection alone vs ~1 s bound; the round-9 bench's count()
    * plans had hidden this by eliminating the join that carried it).
    */
  private[operators] def distinctGrams(w: Column, n: Int): Column =
    array_distinct(flatten(transform(array(w), wb =>
      when(size(wb) >= n,
        transform(sequence(lit(1), size(wb) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(wb, i + k)): _*)))
        .otherwise(array().cast("array<string>")))))

  /** decontaminate query: eval set = the first 50 doc_ids (a stand-in
    * for a fixed benchmark), candidates = every other document; n=8.
    */
  def decontaminate(spark: SparkSession, dir: String,
                    evalDocs: Int = 50, n: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    decontaminateOf(
      docs.filter(col("doc_id") >= evalDocs),
      docs.filter(col("doc_id") < evalDocs), n)
  }

  /** §3 `*Of` form: flag each candidate (doc_id, text) by its distinct
    * word-n-gram overlap with the eval frame's gram set. Output:
    * (doc_id, n_grams, overlap_grams, contaminated).
    */
  def decontaminateOf(candidates: DataFrame, eval: DataFrame, n: Int): DataFrame = {
    // the benchmark gram table — bounded, broadcast by hint (this is
    // the one frame whose boundedness is structural, not corpus-sized)
    val evalGrams = eval
      .select(explode(distinctGrams(words(col("text")), n)).as("gram"))
      .distinct()
    val cand = candidates
      .select(col("doc_id"), distinctGrams(words(col("text")), n).as("grams"))
    // overlap path: explode is map-side; the broadcast semi-join keeps
    // only matching gram rows, so the groupBy shuffles ∝ matches
    val overlap = cand
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(broadcast(evalGrams), Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("overlap_grams"))
    cand.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("overlap_grams"), lit(0L)).as("overlap_grams"))
      .withColumn("contaminated", (col("overlap_grams") > 0).cast("int"))
      .orderBy(col("doc_id"))
  }
}
