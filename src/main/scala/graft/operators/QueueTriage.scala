package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Failed-item triage (queue_operations/triage.rs:32
  * triage_failed_items): classify up to 100 failed queue rows into
  * dropped (moved to DLQ, or deleted as unsalvageable) vs skipped
  * (needs manual / daemon attention). Per row:
  *
  *   1. a `[permanent_exhausted]` / `[permanent_data]` /
  *      `[permanent_gone]` error prefix → DLQ (dropped);
  *   2. any non-`file` item type → skipped (manual attention);
  *   3. a failed `delete` is droppable when it is effectively already
  *      complete (:138 should_drop_failed_delete): no file_path, the
  *      (relative_path, tenant, collection)-scoped tracked row is
  *      absent, or it has zero qdrant_chunks — a tracked file WITH
  *      chunks still needs the store;
  *   4. a failed `add`/`update` is droppable when the file is gone
  *      from disk (:228 should_drop_failed_add_update): the owning
  *      watch folder resolves AND root/path no longer exists (the
  *      watcher re-enqueues a delete if needed). The on-disk existence
  *      probe is environment I/O — an input frame here, like
  *      branch_cleanup's live set;
  *   5. any other op → skipped.
  *
  * The reference's `LIMIT 100` has no ORDER BY (SQLite rowid order);
  * totalized by queue_id. The DLQ/DELETE writes are storage effects;
  * this operator is the per-item verdict (the TriageStats counters
  * are its groupBy).
  *
  * Scale: the failed slice is rank-capped at 100 rows BEFORE the three
  * lookup joins, so the tracked/chunk/existence probes each touch ≤100
  * keys — broadcast joins, zero full-table passes beyond the slice
  * scan.
  */
object QueueTriage {

  /** The triage-shaped failed slice: permanent prefixes on three
    * residues, path-less rows every 13th, relative paths over a
    * 37-slot file axis, ops delete/add/update/scan so every verdict
    * arm is live. */
  def failedQueue(spark: SparkSession, dir: String): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    TuiViews.queue(spark, dir)
      .filter(col("status") === "failed")
      .withColumn("op",
        element_at(array(lit("delete"), lit("add"), lit("update"), lit("scan")),
          (pmod(floor(eid / 4).cast("long"), lit(4)) + 1).cast("int")))
      .withColumn("file_path",
        when(pmod(eid, lit(13)) =!= 0,
          concat(lit("src/f"), pmod(eid, lit(37)), lit(".rs"))))
      .withColumn("error_message",
        when(pmod(eid, lit(11)) === 0, lit("[permanent_exhausted] retries"))
          .when(pmod(eid, lit(11)) === 1, lit("[permanent_data] parse"))
          .when(pmod(eid, lit(11)) === 2, lit("[permanent_gone] missing"))
          .otherwise(concat(lit("io error #"), pmod(eid, lit(23)))))
  }

  /** The tracked-file lookup for the delete arm: (relative_path,
    * tenant, collection) under the owning watch folder, with a
    * qdrant_chunks count. Files on a 37-slot axis: slots %3==0 are
    * untracked, tracked slots with %5<2 have zero chunks. */
  def trackedLookup(spark: SparkSession, dir: String): DataFrame = {
    val registry = TuiViews.registry(spark, dir)
      .select(col("tenant_id"), col("collection"))
    val slots = spark.range(0, 37).select(col("id").as("slot"))
    registry.crossJoin(broadcast(slots))
      .filter(pmod(col("slot"), lit(3)) =!= 0)
      .select(col("tenant_id"), col("collection"),
        concat(lit("src/f"), col("slot"), lit(".rs")).as("relative_path"),
        when(pmod(col("slot"), lit(5)) < 2, lit(0L)).otherwise(lit(3L))
          .as("chunk_count"))
  }

  /** The on-disk existence probe for the add/update arm (environment
    * input): slots %2==1 still exist under their watch root. */
  def fsExists(spark: SparkSession, dir: String): DataFrame = {
    val registry = TuiViews.registry(spark, dir)
      .select(col("tenant_id"), col("collection"))
    val slots = spark.range(0, 37).select(col("id").as("slot"))
    registry.crossJoin(broadcast(slots))
      .filter(pmod(col("slot"), lit(2)) === 1)
      .select(col("tenant_id"), col("collection"),
        concat(lit("src/f"), col("slot"), lit(".rs")).as("exists_path"))
  }

  /** §3 `*Of` form over (failed rows, registry, tracked lookup,
    * existence probe). Output: the examined slice with (action ∈
    * dropped|skipped, route ∈ dlq|deleted|kept, reason). */
  def triageOf(failed: DataFrame, registry: DataFrame, tracked: DataFrame,
               exists: DataFrame, limit: Int = 100): DataFrame = {
    val slice = failed
      .withColumn("rk", row_number().over(Window.orderBy(col("queue_id"))))
      .filter(col("rk") <= limit).drop("rk")
      .localCheckpoint(false)
    val folders = registry
      .select(col("tenant_id").as("wf_tenant"),
        col("collection").as("wf_collection"))
    val tr = tracked.select(col("tenant_id").as("t_tenant"),
      col("collection").as("t_collection"),
      col("relative_path"), col("chunk_count"))
    val ex = exists.select(col("tenant_id").as("e_tenant"),
      col("collection").as("e_collection"), col("exists_path"))
    val joined = slice
      .join(broadcast(folders),
        col("tenant_id") === col("wf_tenant") &&
          col("collection") === col("wf_collection"), "left")
      .join(broadcast(tr),
        col("file_path") === col("relative_path") &&
          col("tenant_id") === col("t_tenant") &&
          col("collection") === col("t_collection"), "left")
      .join(broadcast(ex),
        col("file_path") === col("exists_path") &&
          col("tenant_id") === col("e_tenant") &&
          col("collection") === col("e_collection"), "left")

    val permanent = col("error_message").startsWith("[permanent_exhausted]") ||
      col("error_message").startsWith("[permanent_data]") ||
      col("error_message").startsWith("[permanent_gone]")
    def v(action: String, route: String, reason: String) =
      struct(lit(action).as("action"), lit(route).as("route"),
        lit(reason).as("reason"))
    val verdict = joined.select(
      col("queue_id"), col("item_type"), col("op"), col("tenant_id"),
      col("collection"), col("file_path"),
      when(permanent, v("dropped", "dlq", "permanent"))
        .when(col("item_type") =!= "file", v("skipped", "kept", "non_file"))
        .when(col("op") === "delete" && col("file_path").isNull,
          v("dropped", "deleted", "delete_no_path"))
        .when(col("op") === "delete" && col("relative_path").isNull,
          v("dropped", "deleted", "delete_untracked"))
        .when(col("op") === "delete" && col("chunk_count") === 0,
          v("dropped", "deleted", "delete_no_chunks"))
        .when(col("op") === "delete", v("skipped", "kept", "delete_has_chunks"))
        .when(col("op").isin("add", "update") && col("file_path").isNull,
          v("skipped", "kept", "no_path"))
        .when(col("op").isin("add", "update") && col("wf_tenant").isNull,
          v("skipped", "kept", "no_watch"))
        .when(col("op").isin("add", "update") && col("exists_path").isNull,
          v("dropped", "deleted", "file_missing"))
        .when(col("op").isin("add", "update"),
          v("skipped", "kept", "file_present"))
        .otherwise(v("skipped", "kept", "op_manual"))
        .as("v"))
    verdict.select(col("queue_id"), col("item_type"), col("op"),
        col("tenant_id"), col("collection"), col("file_path"),
        col("v.action").as("action"), col("v.route").as("route"),
        col("v.reason").as("reason"))
      .orderBy(col("queue_id"))
  }

  def queueTriage(spark: SparkSession, dir: String): DataFrame =
    triageOf(failedQueue(spark, dir), TuiViews.registry(spark, dir),
      trackedLookup(spark, dir), fsExists(spark, dir))
}
