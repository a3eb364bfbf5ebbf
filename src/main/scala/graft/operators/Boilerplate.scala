package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Boilerplate line removal — the CCNet-style paragraph/line-level
  * dedup stage (Wenzek et al. 2020, arXiv:1911.00359 §3.1 run line-
  * level): a line whose trimmed text recurs across ≥ `dfThreshold`
  * documents of the SAME source is boilerplate (headers, footers, nav
  * text) and is dropped; the op reports per-document counts and the
  * md5 of the cleaned reconstruction so a downstream stage can verify
  * the rewrite without shipping text twice.
  *
  * Scale shape: one shuffle builds the per-(source, line) document
  * frequency (keyed, combiner-friendly: countDistinct partial-
  * aggregates), one keyed join flags lines, one per-doc aggregation
  * rebuilds. Everything is ∝ corpus lines with map-side combine —
  * no broadcast of corpus-sized state, no n² anywhere.
  */
object Boilerplate {

  def boilerplateLines(spark: SparkSession, dir: String,
                       dfThreshold: Int = 3): DataFrame =
    boilerplateLinesOf(
      Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("text")),
      dfThreshold)

  /** §3 `*Of` form over any (doc_id, source, text) frame. Output:
    * (doc_id, n_lines, boiler_lines, boiler_frac, cleaned_md5) —
    * n_lines counts non-empty trimmed lines; cleaned_md5 hashes the
    * kept RAW lines re-joined with \n in original order (docs with no
    * non-empty line hash the empty string).
    */
  def boilerplateLinesOf(docs: DataFrame, dfThreshold: Int): DataFrame = {
    val perDoc = flaggedLines(docs, dfThreshold)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("df") >= dfThreshold).cast("long")).as("boiler_lines"),
        md5(keptJoined(dfThreshold)).as("cleaned_md5"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("boiler_lines"), lit(0L)).as("boiler_lines"),
        when(coalesce(col("n_lines"), lit(0L)) > 0,
          round(col("boiler_lines").cast("double") / col("n_lines"), 6))
          .otherwise(lit(0.0)).as("boiler_frac"),
        coalesce(col("cleaned_md5"), md5(lit(""))).as("cleaned_md5"))
      .orderBy(col("doc_id"))
  }

  /** The REWRITE form of the same stage (corpus_pipeline stage 1): the
    * cleaned text itself — kept raw lines re-joined with \n in original
    * order — alongside the per-doc counts. Identical line/frequency
    * internals to [[boilerplateLinesOf]] (md5(text) of this output ==
    * that output's cleaned_md5; CorpusPipelineSpec pins it), so the
    * reporting and rewriting forms cannot drift.
    */
  def cleanedTextOf(docs: DataFrame, dfThreshold: Int): DataFrame = {
    val perDoc = flaggedLines(docs, dfThreshold)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum((col("df") >= dfThreshold).cast("long")).as("boiler_lines"),
        keptJoined(dfThreshold).as("cleaned"))
    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("cleaned"), lit("")).as("text"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("boiler_lines"), lit(0L)).as("boiler_lines"))
  }

  /** Non-empty trimmed lines joined to their per-(source, trimmed-line)
    * document frequency — the shared core of both forms above.
    */
  private def flaggedLines(docs: DataFrame, dfThreshold: Int): DataFrame = {
    val lines = docs
      .select(col("doc_id"), col("source"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .filter(length(trim(col("line"))) > 0)
      .withColumn("lkey", trim(col("line")))
    val freq = lines.groupBy(col("source"), col("lkey"))
      .agg(countDistinct(col("doc_id")).as("df"))
    lines.join(freq, Seq("source", "lkey"))
  }

  /** Aggregate expression: kept raw lines re-joined with \n in original
    * order (empty string when every line is boilerplate).
    */
  private def keptJoined(dfThreshold: Int) =
    array_join(transform(
      sort_array(collect_list(when(col("df") < dfThreshold,
        struct(col("pos"), col("line").as("l"))))),
      s => s.getField("l")), "\n")
}
