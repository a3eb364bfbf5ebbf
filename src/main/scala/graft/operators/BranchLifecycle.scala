package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Branch/tenant lifecycle — the data half of the reference's branch
  * cleanup (branch_cleanup/mod.rs: when a branch is deleted, remove it
  * from every tracked file's `branches[]` membership; files whose
  * array empties are fully deleted as orphaned content, the rest are
  * updated in place; reconcile.rs:55 sweeps stored−live branch sets to
  * find what to clean). The git-side existence probing
  * (branch_discovery/scanner.rs) is environment I/O a batch engine
  * doesn't reproduce — the live-branch set is an input here.
  *
  * Relational shape: one projected scan, a per-row array filter
  * against the BROADCAST live set (a lambda over ≤ a few thousand
  * branch names), and a three-way action classification — map-only at
  * any scale; the delete/compact sets are the `action` partitions of
  * the output.
  */
object BranchLifecycle {

  /** The cleanup plan over a (doc_id, tenant_id, branches) membership
    * frame: action = delete (no branches remain — mod.rs's orphaned
    * full delete), update (branch removed, content retained), or keep.
    */
  def branchCleanupOf(tracked: DataFrame, liveBranches: Seq[String]): DataFrame =
    tracked
      .withColumn("remaining",
        filter(col("branches"), b => b.isInCollection(liveBranches)))
      .withColumn("action",
        when(size(col("remaining")) === 0, lit("delete"))
          .when(size(col("remaining")) < size(col("branches")), lit("update"))
          .otherwise(lit("keep")))
      .select(col("doc_id"), col("tenant_id"), col("action"),
        array_join(col("remaining"), ",").as("branches_left"))
      .orderBy(col("doc_id"))

  /** branch_cleanup query: the corpus has no branch column, so branch
    * membership derives deterministically from the ids — docs with
    * doc_id%10 >= 7 live ONLY on a feature branch `b<id%5>` (orphaned
    * when it dies), the rest also on `main`. Live set: main + b0..b2,
    * so b3/b4 are the reconcile sweep's stale branches; the feature-only
    * selector residues {7,8,9} put feature-only docs on b2/b3/b4, so
    * the stale branches carry feature-only docs and all three actions
    * (delete/update/keep) are reachable end-to-end.
    */
  def branchCleanup(spark: SparkSession, dir: String,
                    liveBranches: Seq[String] = Seq("main", "b0", "b1", "b2")): DataFrame = {
    val feature = concat(lit("b"), pmod(col("doc_id"), lit(5)).cast("string"))
    val tracked = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("tenant_id"))
      .withColumn("branches",
        when(pmod(col("doc_id"), lit(10)) >= 7, array(feature))
          .otherwise(array(lit("main"), feature)))
    branchCleanupOf(tracked, liveBranches)
  }
}
