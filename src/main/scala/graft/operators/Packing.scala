package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-sequence packing — the concat-and-cut step a pretraining
  * pipeline runs after cleaning/dedup: documents are concatenated in a
  * deterministic global order (doc_id) and the token stream is cut
  * into fixed-length sequences; each output row is one document's
  * contribution to one sequence (the packed-dataset writer's exact
  * input). The reference chunks per-document at ingest
  * (chunking in document_processor — chunk_documents twin); packing is
  * the corpus-level generalization a 100 TB training pipeline needs.
  *
  * Scale posture: the global token offset is a DISTRIBUTED prefix sum
  * (the skew_join_rank pattern — range-partition by doc_id, window
  * inside each value-contiguous slice, per-slice totals prefix-summed
  * over the tiny slice frame and broadcast back), so no single task
  * ever holds the corpus order. The bin explode emits ⌈tokens/seqLen⌉
  * rows in aggregate — proportional to corpus tokens, map-side. At
  * cluster scale one typically packs per shard; that is this same
  * operator with the prefix sum keyed by shard, which
  * [[packSequencesOf]] gets for free by prepending a shard column to
  * the ordering — the global-order contract here is the stronger,
  * fully-reproducible form.
  */
object Packing {

  /** Packs the `documents` corpus with the BPE-ish token counts of
    * token_count (letter runs, single digits, punctuation singles).
    */
  def packSequences(spark: SparkSession, dir: String,
                    seqLen: Int = 512): DataFrame = {
    val bpePattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
    packSequencesOf(
      Tables.documents(spark, dir)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
            .cast("long").as("n_tokens")),
      seqLen)
  }

  /** §3 `*Of` form over any (doc_id, n_tokens) frame. Output one row
    * per (sequence, document) span: `seq_id` = the sequence ordinal,
    * `tok_start` = the 0-based position inside the sequence where this
    * document's slice begins, `tok_len` = tokens contributed. Docs
    * with zero tokens occupy no stream position and are not emitted.
    */
  def packSequencesOf(counts: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = counts.sparkSession
    val shufP = spark.sessionState.conf.numShufflePartitions
    // localCheckpoint pins ONE physical evaluation of the slice
    // assignment: both consumers below (the per-row window and the
    // per-slice offsets) would otherwise re-plan this branch, and
    // repartitionByRange samples its boundaries with an RDD-id-derived
    // seed — identical results across the two branches are guaranteed
    // only by exchange reuse, which replans or
    // spark.sql.exchange.reuse=false can defeat, silently mis-offsetting
    // token positions. The checkpointed frame is (doc_id, n_tokens,
    // slice) — three fixed-width columns, not the corpus text.
    val sliced = counts
      .filter(col("n_tokens") > 0)
      .repartitionByRange(shufP, col("doc_id"))
      .withColumn("slice", spark_partition_id())
      .localCheckpoint()
    val local = Window.partitionBy(col("slice")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sliced
      .withColumn("cum_local", sum(col("n_tokens")).over(local))
    // One row per slice: the token total; a slice's offset is the sum
    // of all PRIOR slices' totals (range partitioning makes slice ids
    // order-aligned with doc_id ranges).
    val offsets = sliced.groupBy(col("slice"))
      .agg(sum(col("n_tokens")).as("slice_toks"))
      .withColumn("offset",
        coalesce(sum(col("slice_toks")).over(
          Window.orderBy(col("slice"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("slice"), col("offset"))
    val positioned = withLocal
      .join(broadcast(offsets), Seq("slice"))
      .withColumn("start", col("offset") + col("cum_local") - col("n_tokens"))
    // A doc spanning [start, start+n) touches bins ⌊start/L⌋..⌊(start+n−1)/L⌋;
    // the explode is map-side and emits Σ⌈n/L⌉+1 rows at most.
    val L = lit(seqLen.toLong)
    positioned
      // `div` keeps bin arithmetic in exact integers — a double floor
      // would be one ulp from wrong past 2^53 stream tokens.
      .withColumn("seq_id",
        explode(sequence(expr(s"start div $seqLen"),
          expr(s"(start + n_tokens - 1) div $seqLen"))))
      .withColumn("bin_start", col("seq_id") * L)
      .withColumn("tok_start",
        greatest(col("start"), col("bin_start")) - col("bin_start"))
      .withColumn("tok_len",
        least(col("bin_start") + L, col("start") + col("n_tokens")) -
          greatest(col("start"), col("bin_start")))
      .select(col("seq_id"), col("doc_id"), col("tok_start"), col("tok_len"))
      .orderBy(col("seq_id"), col("tok_start"))
  }
}
