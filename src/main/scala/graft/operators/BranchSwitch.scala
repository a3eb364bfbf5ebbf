package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Branch-switch handling — the data half of the daemon's git-event
  * branch logic (branch_switch/handlers.rs:71 handle_branch_switch):
  *
  *  1. Branch-add (db.rs:79 fetch_unchanged_candidates + :119 batch
  *     add): tracked files carrying the OLD branch whose path is NOT
  *     in the diff-tree change set and which don't already carry the
  *     new branch get the new branch appended to their membership
  *     array. The reference's `EXISTS (json_each(branches) = ?old)`
  *     is `array_contains`; the post-fetch filters run in the same
  *     frame.
  *  2. Changed-file enqueue (queue.rs:22): diff-tree entries map to
  *     queue ops — Modified/TypeChanged → update, Added/Copied → add,
  *     Deleted → delete, Renamed → a delete row for the old path PLUS
  *     an add row for the new path.
  *
  * (Step 3, the watch_folders last_commit_hash update, is a pointer
  * write — environment.) The git diff-tree itself is environment I/O;
  * the change list is an input axis, like branch_cleanup's live set.
  * The reference handles one watch folder per event; the batch twin
  * sweeps every watch in one pass (exclusions join on (tenant, path)).
  *
  * Scale: one broadcast-able change-set join against the tracked scan +
  * a union with the op-mapped change rows — shuffle ∝ changed paths.
  */
object BranchSwitch {

  /** §3 `*Of` form over tracked (tenant_id, path, branches) and
    * changes (tenant_id, path, status, old_path). */
  def branchSwitchOf(tracked: DataFrame, changes: DataFrame,
                     oldBranch: String, newBranch: String): DataFrame = {
    val changedPaths = changes.select(col("tenant_id"), col("path")).distinct()
    val branchAdd = tracked
      .filter(array_contains(col("branches"), oldBranch) &&
        !array_contains(col("branches"), newBranch))
      .join(broadcast(changedPaths), Seq("tenant_id", "path"), "left_anti")
      .select(col("tenant_id"), col("path"), lit("branch_add").as("action"),
        concat(col("branches"), array(lit(newBranch))).as("branches_after"))
    val opOf = when(col("status").isin("modified", "type_changed"), "update")
      .when(col("status").isin("added", "copied"), "add")
      .when(col("status") === "deleted", "delete")
      .when(col("status") === "renamed", "add") // + the delete row below
    // Empty (not NULL) membership on queue rows: branches_after is only
    // meaningful for the branch_add arm, and an empty array survives the
    // column-wise hash compare identically in Spark and the SQL oracle.
    val enqueue = changes
      .select(col("tenant_id"), col("path"), opOf.as("action"),
        array().cast("array<string>").as("branches_after"))
    val renameDeletes = changes.filter(col("status") === "renamed")
      .select(col("tenant_id"), col("old_path").as("path"),
        lit("delete").as("action"),
        array().cast("array<string>").as("branches_after"))
    branchAdd.unionByName(enqueue).unionByName(renameDeletes)
      .orderBy(col("tenant_id"), col("path"), col("action"))
  }

  /** branch_switch over synthetic tracked + diff axes (old=main →
    * new=feature-x). Branch memberships and change kinds cycle the
    * per-tenant file index so every arm is live: already-carrying,
    * not-on-old-branch, changed-excluded, and all six diff-tree
    * statuses including the two-row rename. */
  def branchSwitch(spark: SparkSession, dir: String,
                   oldBranch: String = "main",
                   newBranch: String = "feature-x"): DataFrame = {
    val idx = floor(col("doc_id") / 20).cast("long")
    val dirNames = Seq("src", "tests", "lib", "config", "e2e")
    val fileNames = Seq("main.py", "lib.rs", "util.ts", "types.d.ts", "README.md",
      "guide.pdf", "index.html", "deck.pptx", "app.yaml", "data.json",
      "table.csv", "dist.whl", "bundle.tar.gz", ".gitignore", "LICENSE",
      "test_core.py", "app.test.ts")
    val path = concat(
      element_at(array(dirNames.map(lit): _*), (pmod(idx, lit(5)) + 1).cast("int")),
      lit("/"),
      element_at(array(fileNames.map(lit): _*), (pmod(idx, lit(17)) + 1).cast("int")))
    val base = Tables.documents(spark, dir).select(
      col("source").as("tenant_id"), col("doc_id").as("file_id"),
      path.as("path"), idx.as("idx"))
    val tracked = base.select(col("tenant_id"), col("path"),
      when(pmod(col("idx"), lit(10)) < 6, array(lit(oldBranch)))
        .when(pmod(col("idx"), lit(10)) < 8,
          array(lit(oldBranch), lit(newBranch)))   // already carries new
        .when(pmod(col("idx"), lit(10)) === 8, array(lit("dev"))) // not on old
        .otherwise(array(lit(oldBranch), lit("dev"))).as("branches"))
    val changes = base.filter(pmod(col("idx"), lit(5)) === 0)
      .select(col("tenant_id"), col("path"),
        element_at(array(lit("modified"), lit("added"), lit("deleted"),
          lit("renamed"), lit("copied"), lit("type_changed")),
          (pmod(floor(col("idx") / 5).cast("long"), lit(6)) + 1).cast("int"))
          .as("status"),
        concat(col("path"), lit(".old")).as("old_path"))
    branchSwitchOf(tracked, changes, oldBranch, newBranch)
  }
}
