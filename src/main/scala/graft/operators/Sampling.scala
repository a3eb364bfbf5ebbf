package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic stratified sampling — the reproducible subset-draw a
  * training pipeline uses for data mixing, eval holdouts, and
  * quality-audit slices. Strata are the document `source` (the tenant
  * axis); within each stratum documents are ordered by a content-free
  * keyed hash (md5 over doc_id:source — stable across engines, runs,
  * and cluster layouts, unlike any rand()-based sample) and the first
  * `quota` are kept. A fixed per-stratum quota is the reservoir-sample
  * contract; the fraction form (keep doc iff hash < f) is the same
  * expression without the window and is exposed for map-only use.
  *
  * Scale posture: quota sampling is ONE window shuffle keyed by
  * stratum (partial top-k per map side would need a custom agg; the
  * window is the declarative form and AQE handles stratum skew);
  * fraction sampling ([[sampleFraction]]) is map-only — no shuffle at
  * all, the 100 TB default when exact counts are not required.
  */
object Sampling {

  private def keyedHash(idCol: String, stratumCol: String) =
    md5(concat(col(idCol).cast("string"), lit(":"), col(stratumCol)))

  /** Per-source quota sample of the documents corpus. Output one row
    * per kept doc: (source, doc_id, sample_rank 1..quota).
    */
  def sampleStratified(spark: SparkSession, dir: String,
                       quota: Int = 50): DataFrame =
    sampleStratifiedOf(
      Tables.documents(spark, dir).select(col("doc_id"), col("source")),
      quota)

  /** §3 `*Of` form over any (doc_id, source) frame. */
  def sampleStratifiedOf(docs: DataFrame, quota: Int): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs
      .withColumn("h", keyedHash("doc_id", "source"))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
      .select(col("source"), col("doc_id"), col("sample_rank"))
      .orderBy(col("source"), col("sample_rank"))
  }

  /** Map-only fraction sample: keep a doc iff the first 8 hex digits
    * of its keyed hash, read as an integer, fall under fraction·2³².
    * Expected |stratum|·fraction kept, exactly reproducible, zero
    * shuffle.
    */
  def sampleFraction(docs: DataFrame, fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0,1]")
    val cut = (fraction * 4294967296.0).toLong
    docs.filter(
      conv(substring(keyedHash("doc_id", "source"), 1, 8), 16, 10)
        .cast("long") < cut)
  }
}
