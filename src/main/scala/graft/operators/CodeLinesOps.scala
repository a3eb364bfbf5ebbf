package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Gap-based `seq` ordering for the `code_lines` table — midpoint
  * insertion, fragmentation detection, and file-local rebalancing
  * (code_lines_schema.rs:33-54, search_db/code_lines.rs:183
  * `rebalance_file_seqs` / :300 `min_seq_gap` / :281
  * `needs_rebalance`).
  *
  * The reference stores line order as REAL seq values with 1000-unit
  * initial gaps; interactive edits insert at midpoints
  * (`(before+after)/2`), which halves a local gap per insertion until
  * it drops below `MIN_SEQ_GAP = 0.001` — at which point the file's
  * seqs are re-assigned to `(i+1)*1000` in current order. Line
  * numbers are always the 1-based rank in seq order.
  *
  * Relational shape: everything here is windows over (file, seq) —
  * the min-gap probe is a per-file `lag` diff, the rebalance is a
  * per-file rank re-gap, both shuffle once on the file axis and scale
  * with total line count. The corpus simulates per-file midpoint
  * insertion chains (the deepest-gap pattern: repeated insertion
  * between the first two lines, exact powers of two in both engines)
  * with per-file depth 5..24, so roughly a quarter of files sit past
  * the rebalance threshold and the query exercises both branches.
  */
object CodeLinesOps {

  /** INITIAL_SEQ_GAP / MIN_SEQ_GAP (code_lines_schema.rs:33,39). */
  val InitialSeqGap = 1000.0
  val MinSeqGap = 0.001

  /** initial_seq (code_lines_schema.rs:44). */
  def initialSeq(lineIndex: Int): Double = (lineIndex + 1.0) * InitialSeqGap

  /** midpoint_seq (code_lines_schema.rs:52). */
  def midpointSeq(before: Double, after: Double): Double = (before + after) / 2.0

  /** needs_rebalance (code_lines.rs:281): strictly below the floor. */
  def needsRebalance(gap: Double): Boolean = gap < MinSeqGap

  /** The seq-maintenance pass over a (doc_id, seq, content) state:
    * per-file min adjacent gap (NULL under two lines —
    * code_lines.rs:300), the rebalance decision, re-gapped seqs for
    * files past the threshold (rebalance_file_seqs: `(i+1)*1000` in
    * current seq order), and 1-based line numbers in seq order
    * (renumber_file_line_numbers). */
  def rebalanceOf(state: DataFrame): DataFrame = {
    val wSeq = Window.partitionBy("doc_id").orderBy("seq")
    val wDoc = Window.partitionBy("doc_id")
    state
      .withColumn("line_number", row_number().over(wSeq).cast("long"))
      .withColumn("gap", col("seq") - lag(col("seq"), 1).over(wSeq))
      .withColumn("min_gap", min(col("gap")).over(wDoc))
      .withColumn("rebalanced",
        coalesce(col("min_gap") < MinSeqGap, lit(false)))
      .withColumn("seq",
        when(col("rebalanced"), col("line_number") * InitialSeqGap)
          .otherwise(col("seq")))
      .select(col("doc_id"), col("line_number"), col("content"),
        col("seq").cast("double"),
        col("rebalanced"), col("min_gap").cast("double"))
  }

  /** Fragmented corpus state: each document's slice lines at initial
    * seqs plus a midpoint-insertion chain of depth `5 + doc_id % 20`
    * between the first two lines — inserted seq `1000 + 1000/2^j`,
    * exact in binary floating point in both engines. */
  def fragmentedState(spark: SparkSession, dir: String): DataFrame = {
    val base = LineDiffOps.oldLinesOf(Tables.documents(spark, dir))
      .select(col("doc_id"),
        ((col("oi") + 1).cast("double") * InitialSeqGap).as("seq"),
        col("content"))
    val inserted = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(sequence(lit(1), (pmod(col("doc_id"), lit(20)) + 5).cast("int"))).as("j"))
      .select(col("doc_id"),
        (lit(InitialSeqGap) + lit(InitialSeqGap) / pow(lit(2.0), col("j"))).as("seq"),
        concat(lit("~mid~"), col("j").cast("string"), lit("~"),
          col("doc_id").cast("string")).as("content"))
    base.unionAll(inserted)
  }

  /** code_lines_rebalance: the maintenance pass over the fragmented
    * corpus. Files at depth >= 20 have min gap `1000/2^20 < 0.001`
    * and re-gap; the rest keep their midpoints. */
  def codeLinesRebalance(spark: SparkSession, dir: String): DataFrame =
    rebalanceOf(fragmentedState(spark, dir))
      .orderBy("doc_id", "line_number")
}
