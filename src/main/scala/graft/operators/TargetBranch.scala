package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-project branch default — the reference's fallback for explicit
  * cross-project `list`/`search` calls (mcp-server/src/tools/
  * target_branch.rs:22 `resolve_cross_project_branch`): a tool call
  * targeting a project OTHER than the session's must not inherit the
  * session's branch filter (it belongs to the wrong repository and
  * silently empties results). Resolution cascade, per target:
  *
  *   1. the branch detected from the target's checkout (`detect_branch`
  *      — filesystem git-HEAD probing, environment I/O here, so the
  *      probe result is an input map like branch_cleanup's live set;
  *      the probe's `"default"` sentinel means "not a usable checkout"
  *      and falls through, target_branch.rs:29);
  *   2. the most common `primary_branch` among the target's tracked
  *      rows (the `GROUP BY … ORDER BY COUNT(*) DESC LIMIT 1` at
  *      target_branch.rs:36) — always consistent with what a filter
  *      can match;
  *   3. None — callers then omit the branch filter entirely, which
  *      over-returns (all branches) rather than silently returning
  *      zero (target_branch.rs:21).
  *
  * Determinism quirk: SQLite's `LIMIT 1` on a COUNT tie is
  * order-of-insert dependent; here the rank-1 window breaks count ties
  * by branch name ascending, so the mode is stable under any row order
  * (a superset contract — every reference answer on tie-free data is
  * reproduced exactly).
  *
  * Relational shape: one groupBy over (folder, branch) — shuffle ∝
  * distinct pairs, not rows, with map-side partial counts — then a
  * rank-1 window PARTITIONED by folder (never global), and a broadcast
  * join of the tiny detected-branch map onto the distinct-target frame.
  * At 100 TB the only full-data pass is the pair count; everything
  * after operates on ≤ one row per (folder, branch).
  */
object TargetBranch {

  /** target_branch.rs:47 `is_cross_project`: an explicit projectId is
    * cross-project iff it differs from the session's bound project
    * (an unbound session makes every explicit target cross-project;
    * an absent projectId never is).
    */
  def isCrossProject(inputProjectId: Option[String],
                     sessionProjectId: Option[String]): Boolean =
    inputProjectId.exists(p => !sessionProjectId.contains(p))

  /** The resolution cascade over a `(watch_folder_id, primary_branch)`
    * tracked-rows frame, a distinct-target frame
    * `(watch_folder_id)`, and the checkout probe's results
    * (folder → detected branch; `"default"` = unusable checkout).
    * Output: one row per target — `branch` (nullable) + `method`
    * (`detected` | `mode` | `none`).
    */
  def resolveOf(targets: DataFrame, tracked: DataFrame,
                detected: Map[String, String]): DataFrame = {
    val spark = targets.sparkSession
    import spark.implicits._

    // Step-2 mode: count per (folder, branch), keep rank 1 per folder.
    val rank1 = Window.partitionBy(col("watch_folder_id"))
      .orderBy(col("n").desc, col("primary_branch").asc)
    val mode = tracked
      .filter(col("primary_branch").isNotNull)
      .groupBy(col("watch_folder_id"), col("primary_branch"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(rank1))
      .filter(col("rk") === 1)
      .select(col("watch_folder_id"), col("primary_branch").as("mode_branch"))

    // Step-1 probe results; "default" falls through (target_branch.rs:29).
    val probes = detected.toSeq.toDF("watch_folder_id", "probed")
      .withColumn("detected_branch",
        when(col("probed") =!= "default", col("probed")))
      .drop("probed")

    targets
      .join(broadcast(probes), Seq("watch_folder_id"), "left")
      .join(broadcast(mode), Seq("watch_folder_id"), "left")
      .select(
        col("watch_folder_id"),
        coalesce(col("detected_branch"), col("mode_branch")).as("branch"),
        when(col("detected_branch").isNotNull, lit("detected"))
          .when(col("mode_branch").isNotNull, lit("mode"))
          .otherwise(lit("none")).as("method"))
      .orderBy(col("watch_folder_id"))
  }

  /** target_branch query: watch folders are the corpus `source` axis;
    * `primary_branch` derives deterministically — every 13th doc is an
    * untracked-branch NULL row, 60% of the rest sit on `main` (the
    * dominant mode everywhere), the tail on `b0..b3`. The probe input
    * exercises all three cascade arms: `src2` has a live checkout on
    * `feature-z` (detected wins over its `main` mode), `src5`'s probe
    * returns the `"default"` sentinel (falls back to mode), and the
    * target list carries one folder with no tracked rows at all
    * (`src_gone` → None).
    */
  def targetBranch(spark: SparkSession, dir: String,
                   detected: Map[String, String] =
                     Map("src2" -> "feature-z", "src5" -> "default")): DataFrame = {
    import spark.implicits._
    val tracked = Tables.documents(spark, dir)
      .select(col("source").as("watch_folder_id"),
        when(pmod(col("doc_id"), lit(13)) === 0, lit(null).cast("string"))
          .when(pmod(col("doc_id"), lit(10)) < 6, lit("main"))
          .otherwise(concat(lit("b"), pmod(col("doc_id"), lit(4)).cast("string")))
          .as("primary_branch"))
    val targets = tracked.select(col("watch_folder_id")).distinct()
      .union(Seq("src_gone").toDF("watch_folder_id"))
    resolveOf(targets, tracked, detected)
  }

  /** §3 `*Of` form of `wqm project branches`
    * (cli/commands/project/branches.rs:74): per-branch distinct-file
    * counts for one tenant's tracked rows — the reference's
    * `json_each(tf.branches)` lateral as one explode — ordered by
    * file_count DESC, branch ASC. */
  def projectBranchesOf(tracked: DataFrame, tenant: String): DataFrame =
    tracked.filter(col("tenant_id") === tenant)
      .select(col("file_id"), explode(col("branches")).as("branch_name"))
      .groupBy(col("branch_name"))
      .agg(countDistinct(col("file_id")).as("file_count"))
      .orderBy(col("file_count").desc, col("branch_name"))

  /** project branches over a tracked-files synthesis on the documents
    * axis: branch membership arrays with a 60% `main` mode, a `b0..b3`
    * tail, a second `dev` membership every 5th file, and an
    * empty-membership row every 13th (contributing no branch rows —
    * the json_each lateral's natural drop). */
  def projectBranches(spark: SparkSession, dir: String,
                      tenant: String = "src3"): DataFrame = {
    // Residues derive from the per-tenant file index (doc_id div 20),
    // NOT doc_id itself — the corpus assigns source = doc_id % 20, so
    // doc_id residues are constant within a tenant and would collapse
    // every file onto one branch.
    val idx = floor(col("doc_id") / 20).cast("long")
    val tracked = Tables.documents(spark, dir).select(
      col("source").as("tenant_id"),
      col("doc_id").as("file_id"),
      when(pmod(idx, lit(13)) === 0, array().cast("array<string>"))
        .otherwise(concat(
          array(when(pmod(idx, lit(10)) < 6, lit("main"))
            .otherwise(concat(lit("b"), pmod(idx, lit(4))))),
          when(pmod(idx, lit(5)) === 0, array(lit("dev")))
            .otherwise(array().cast("array<string>"))))
        .as("branches"))
    projectBranchesOf(tracked, tenant)
  }
}
