package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The idle ring's two retention sweeps, as action-classification
  * queries (the UPDATE/DELETE execution is storage I/O; the SELECTION
  * is the analytics):
  *
  *  - Stale-project deactivation (idle/tasks/
  *    stale_project_deactivation.rs:55): watch folders with
  *    `is_active > 0`, a non-NULL `last_activity_at`, and activity
  *    older than the staleness cutoff are deactivated; inactive
  *    folders and never-active (NULL) folders are left untouched —
  *    the reference's WHERE clause arms, verbatim.
  *  - Queue cleanup (idle/tasks/queue_cleanup.rs:67): `done` queue
  *    rows older than `retention_hours` (default 24, queue_cleanup
  *    .rs:31) are reclaimed; non-done rows are kept regardless of age.
  *
  * Relational shape: each is one projected scan + a broadcast 1-row
  * `now` anchor + a codegen'd CASE — map-only at any scale; the
  * delete/deactivate sets are the `action` partitions of the output.
  */
object IdleCleanup {

  /** stale_project_deactivation.rs:55 over a
    * (project_id, is_active, last_activity_at) folder frame and a
    * 1-row (now_ts) anchor. */
  def staleProjectsOf(folders: DataFrame, now: DataFrame,
                      staleHours: Int): DataFrame =
    folders.crossJoin(broadcast(now))
      .withColumn("action",
        when(col("is_active") > 0 && col("last_activity_at").isNotNull &&
            unix_micros(col("last_activity_at")) <
              unix_micros(col("now_ts")) - lit(staleHours) * 3600L * 1000000L,
          lit("deactivate")).otherwise(lit("keep")))
      .select(col("project_id"), col("is_active"), col("last_activity_at"),
        col("action"))
      .orderBy(col("project_id"))

  /** queue_cleanup.rs:67 over an (item_id, status, updated_at) queue
    * frame and a 1-row (now_ts) anchor. */
  def queueCleanupOf(queue: DataFrame, now: DataFrame,
                     retentionHours: Int): DataFrame =
    queue.crossJoin(broadcast(now))
      .withColumn("action",
        when(col("status") === "done" &&
            unix_micros(col("updated_at")) <
              unix_micros(col("now_ts")) - lit(retentionHours) * 3600L * 1000000L,
          lit("delete")).otherwise(lit("keep")))
      .select(col("item_id"), col("status"), col("updated_at"), col("action"))
      .orderBy(col("item_id"))

  /** stale_projects query: projects are the events user axis (each
    * user a tracked folder's activity log), last_activity_at the
    * per-user max ts, `now` the log's max ts. All four WHERE arms are
    * live: user_id%11==0 folders are already inactive (skipped), the
    * synthetic never-active folder 9999 has NULL activity (skipped),
    * and the 24 h cutoff splits the rest into deactivate/keep (the
    * reference's 7 days is daemon-scale config; the corpus log is 30
    * dense days, so hours keep both arms populated — the WHERE
    * semantics are identical).
    */
  def staleProjects(spark: SparkSession, dir: String,
                    staleHours: Int = 24): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val act = ev.groupBy(col("user_id")).agg(max(col("ts")).as("last_activity_at"))
    val targets = act.select(col("user_id"))
      .union(Seq(9999L).toDF("user_id")).distinct()
    val folders = targets
      .join(act, Seq("user_id"), "left")
      .withColumn("is_active",
        when(pmod(col("user_id"), lit(11)) === 0, 0).otherwise(1))
      .select(col("user_id").as("project_id"), col("is_active"),
        col("last_activity_at"))
    staleProjectsOf(folders, ev.agg(max(col("ts")).as("now_ts")), staleHours)
  }

  /** queue_cleanup query: queue items are the events rows (item_id =
    * event_id, updated_at = ts), status cycling through the
    * unified_queue vocabulary (sql.rs:44) by event_id%4 so done-old
    * (delete), done-recent (keep), and non-done-old (keep) are all
    * reachable under the reference's default 24 h retention.
    */
  def queueCleanup(spark: SparkSession, dir: String,
                   retentionHours: Int = 24): DataFrame = {
    val ev = Tables.events(spark, dir)
    val status = when(pmod(col("event_id"), lit(4)) === 0, lit("done"))
      .when(pmod(col("event_id"), lit(4)) === 1, lit("pending"))
      .when(pmod(col("event_id"), lit(4)) === 2, lit("in_progress"))
      .otherwise(lit("failed"))
    val queue = ev.select(col("event_id").as("item_id"),
      status.as("status"), col("ts").as("updated_at"))
    queueCleanupOf(queue, ev.agg(max(col("ts")).as("now_ts")), retentionHours)
  }
}
