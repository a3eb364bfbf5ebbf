package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Metadata-uplift candidate selection — the data half of the
  * reference's idle-time re-enrichment pass (daemon/core/src/
  * metadata_uplift.rs:61 `find_points_needing_uplift`): when the queue
  * is idle, scan each collection for points whose LSP enrichment
  * failed, was partial, or is still pending (the Qdrant `should`
  * filter at metadata_uplift.rs:68), drop points already uplifted at
  * the current generation (the client-side `uplift_generation` gate at
  * :99, absent field = generation 0), and take the first `batch_size`
  * in scroll order (point id). The enrichment itself (LSP / lexicon
  * tag re-attempts, uplift_single_point) is environment I/O; the
  * SELECTION is the query a batch engine owns.
  *
  * Relational shape: one filtered scan (the status disjunction and the
  * generation comparison are codegen'd predicates that push to the
  * scan) + a per-collection rank window (PARTITIONED by collection,
  * never global) for the batch cap — shuffle ∝ matching candidates.
  */
object MetadataUplift {

  /** find_points_needing_uplift over a
    * (collection, point_id, lsp_enrichment_status, uplift_generation)
    * frame; one batch per collection, scroll order = point id.
    */
  def upliftSelectOf(points: DataFrame, currentGeneration: Long,
                     batchSize: Int): DataFrame =
    points
      .filter(col("lsp_enrichment_status").isin("failed", "partial", "pending"))
      .filter(coalesce(col("uplift_generation"), lit(0L)) < currentGeneration)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("collection")).orderBy(col("point_id"))))
      .filter(col("rk") <= batchSize)
      .select(col("collection"), col("point_id"),
        col("lsp_enrichment_status"), col("uplift_generation"))
      .orderBy(col("collection"), col("point_id"))

  /** uplift_select query: collections are the corpus `source` axis;
    * enrichment status and generation derive deterministically so all
    * three filter arms and both gate outcomes are live — statuses
    * cycle ok/failed/partial/pending/ok by doc_id%5, generations cycle
    * 0/1/2 by doc_id%3 against current_generation=2 (gen-2 rows are
    * skipped exactly like metadata_uplift.rs:99), batch 10 per
    * collection like the reference default.
    */
  def upliftSelect(spark: SparkSession, dir: String,
                   currentGeneration: Long = 2L, batchSize: Int = 10): DataFrame = {
    val status = when(pmod(col("doc_id"), lit(5)) === 1, lit("failed"))
      .when(pmod(col("doc_id"), lit(5)) === 2, lit("partial"))
      .when(pmod(col("doc_id"), lit(5)) === 3, lit("pending"))
      .otherwise(lit("ok"))
    val points = Tables.documents(spark, dir)
      .select(col("source").as("collection"), col("doc_id").as("point_id"),
        status.as("lsp_enrichment_status"),
        pmod(col("doc_id"), lit(3)).as("uplift_generation"))
    upliftSelectOf(points, currentGeneration, batchSize)
  }
}
