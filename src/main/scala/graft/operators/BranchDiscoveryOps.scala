package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Branch discovery (daemon/core/src/branch_discovery/scanner.rs) —
  * the new-branch hash-scan classification and parent inference. The
  * filesystem walk + per-file hashing is environment I/O (an input
  * axis here); the analytics are:
  *
  *  - classify_files (:186): a scanned (relative_path, file_hash)
  *    pair is SHARED when a tracked row matches on BOTH and the new
  *    branch is absent from its membership (branch add, no
  *    re-embedding), ALREADY when the membership carries it (skip),
  *    NOVEL when nothing matches (path unknown OR hash changed —
  *    both arms live).
  *  - the Qdrant membership update set (:243): per base_point of the
  *    shared rows, existing branches + the new branch, sort + dedup.
  *    The reference's HashMap insert takes whichever shared file it
  *    iterates LAST (unspecified); the twin totalizes per base_point
  *    by MIN relative_path, documented.
  *  - infer_parent_branch (:305): over ALL (path, hash)-matched rows
  *    (already-member rows included), count per-branch matches and
  *    take the max — ties unspecified in the reference (HashMap
  *    max_by_key), totalized here by (count DESC, branch ASC).
  *
  * Scale: one (path, hash) equi-join between the scan and the
  * tracked axis (shuffle ∝ files), then config-sized aggregations.
  */
object BranchDiscoveryOps {

  val NewBranch = "feature-x"

  /** The tracked side: the shared synthesis keyed by (path, hash),
    * with base_point groups and an already-member slice. */
  def knownFiles(spark: SparkSession, dir: String): DataFrame = {
    // The tracked synthesis's per-tenant file index (file_id = doc_id).
    val idx = floor(col("file_id") / 20).cast("long")
    TrackedFilesQueries.tracked(spark, dir)
      .filter(col("watch_folder_id") === "w-3")
      .withColumn("idx", idx)
      .select(col("file_id"), col("relative_path"),
        concat(lit("h"), col("idx")).as("file_hash"),
        concat(lit("bp-"), pmod(col("idx"), lit(6))).as("base_point"),
        when(pmod(col("idx"), lit(11)) === 0,
          array_union(col("branches"), array(lit(NewBranch))))
          .otherwise(col("branches")).as("branches"),
        col("idx"))
  }

  /** The new branch's filesystem scan: tracked paths mostly at the
    * same hash, every 7th at a CHANGED hash (novel-modified), plus a
    * brand-new path every 5th index (novel-new). */
  def fsScan(spark: SparkSession, dir: String): DataFrame = {
    val known = knownFiles(spark, dir)
    val same = known.select(col("relative_path"),
      when(pmod(col("idx"), lit(7)) === 1,
        concat(lit("hX"), col("idx")))
        .otherwise(concat(lit("h"), col("idx"))).as("file_hash"))
    val fresh = known.filter(pmod(col("idx"), lit(5)) === 0)
      .select(concat(lit("new/g"), col("idx"), lit(".rs")).as("relative_path"),
        concat(lit("hN"), col("idx")).as("file_hash"))
    same.unionByName(fresh)
  }

  /** §3 `*Of` form: classification rows, counters, the totalized
    * Qdrant membership update set, and the inferred parent — one long
    * (section, key, value) frame. */
  def branchDiscoveryOf(fs: DataFrame, known: DataFrame,
                        newBranch: String): DataFrame = {
    val joined = fs.join(known.withColumnRenamed("relative_path", "k_path")
        .withColumnRenamed("file_hash", "k_hash"),
      fs("relative_path") === col("k_path") &&
        fs("file_hash") === col("k_hash"), "left")
      .withColumn("matched", col("k_path").isNotNull)
      .withColumn("has_branch",
        col("matched") && array_contains(col("branches"), newBranch))

    val classify = joined.select(lit("classify").as("section"),
      col("relative_path").as("key"),
      when(!col("matched"), lit("novel"))
        .when(col("has_branch"), lit("already"))
        .otherwise(lit("shared")).as("value"))

    val counts = joined.agg(
        sum(when(col("matched") && !col("has_branch"), 1L).otherwise(0L))
          .as("shared"),
        sum(when(!col("matched"), 1L).otherwise(0L)).as("novel"))
      .select(explode(map(lit("shared_count"), col("shared"),
        lit("novel_count"), col("novel"))).as(Seq("key", "n")))
      .select(lit("count").as("section"), col("key"),
        col("n").cast("string").as("value"))

    // Qdrant updates: per base_point, the branches of ONE shared row
    // (reference: last HashMap insert, unspecified → min relative_path
    // here) + the new branch, sorted + deduped, exploded.
    val sharedRows = joined.filter(col("matched") && !col("has_branch"))
    val perBp = sharedRows
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("base_point")).orderBy(col("relative_path"))))
      .filter(col("rk") === 1 && col("base_point").isNotNull)
      .select(col("base_point"),
        array_sort(array_distinct(
          array_union(col("branches"), array(lit(newBranch))))).as("bs"))
    val qdrant = perBp.select(lit("qdrant").as("section"),
      col("base_point").as("key"), explode(col("bs")).as("value"))

    // Parent inference over ALL matched rows' memberships.
    val parent = joined.filter(col("matched"))
      .select(explode(col("branches")).as("branch"))
      .groupBy(col("branch")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("n").desc, col("branch"))))
      .filter(col("rk") === 1)
      .select(lit("parent").as("section"), lit("parent_branch").as("key"),
        col("branch").as("value"))

    classify.unionByName(counts).unionByName(qdrant).unionByName(parent)
      .orderBy(col("section"), col("key"), col("value"))
  }

  def branchDiscovery(spark: SparkSession, dir: String): DataFrame =
    branchDiscoveryOf(fsScan(spark, dir), knownFiles(spark, dir), NewBranch)
}
