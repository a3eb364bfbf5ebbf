package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

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

  /** Distinct word n-grams of a word array (space-joined). */
  private def distinctGrams(w: Column, n: Int): Column =
    array_distinct(
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
        .otherwise(array().cast("array<string>")))

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
