package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The dequeue priority SELECT — the heart of the daemon's fairness
  * scheduler (queue_operations/dequeue.rs:342 build_dequeue_query):
  * which eligible batch leaves the queue, in what order.
  *
  * Eligibility: pending with no/expired lease, or in_progress with an
  * expired lease (crashed-worker takeover). Ranking, in key order:
  *
  *   1. delete/reset precedence — always DESC (correctness: stale-data
  *      removal outranks everything on BOTH scheduler passes);
  *   2. (tenant, add|scan) line-jump (#70/#112 — a new project's
  *      registration AND its follow-up directory scan, so its files
  *      get *queued* promptly without preempting active ingestion);
  *   3. age promotion — +1 past the warning threshold, +2 past
  *      critical, always DESC (an aged item must be rescued on both
  *      passes; inverting on the ASC pass would bury exactly the items
  *      this rescues);
  *   4. collection/activity weight: rules 1, libraries 0, else the
  *      project folder's is_active (the LEFT JOIN is scoped to
  *      collection='projects' top-level folders) — direction flips
  *      with the anti-starvation pass (Task 21);
  *   5. op weight (delete 10 / reset 8 / add 5 / update 4 / rename 3 /
  *      uplift 2 / scan 1) — direction flips with the pass;
  *   6. created_at — FIFO on the DESC pass, LIFO on the ASC pass
  *      (Task 9).
  *
  * SQLite's LIMIT under full-key ties is unspecified; totalized by a
  * queue_id tiebreak (superset contract — tie-free data reproduces the
  * reference exactly). The lease-write/fetch halves of dequeue_unified
  * are storage effects; this operator is the selection.
  *
  * Scale: one scan filtered to eligible rows, a broadcast join onto
  * the registry for is_active, and a top-k rank — at scale the rank
  * window is global-ordered but bounded by LIMIT via
  * TakeOrderedAndProject once Catalyst sees the k-filter; keys are all
  * computed map-side.
  */
object QueueDequeue {

  /** The dequeue-shaped queue synthesis: the uq2 residue conventions
    * with the scheduler's FULL op vocabulary (event_id div 4, so every
    * op co-occurs with every status), the tenant item-type arm, lease
    * expiry from the McpQueueStats convention, and created_at spread
    * over the corpus month (thresholds 7d/21d split it three ways). */
  def queue(spark: SparkSession, dir: String): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    TuiViews.queue(spark, dir)
      .withColumn("op",
        element_at(array(lit("delete"), lit("reset"), lit("add"),
          lit("update"), lit("rename"), lit("uplift"), lit("scan")),
          (pmod(floor(eid / 4).cast("long"), lit(7)) + 1).cast("int")))
      .withColumn("lease_until",
        when(col("status") === "in_progress",
          expr("created_at + make_interval(0, 0, 0, 0, " +
            "CAST(CAST(substring(queue_id, 3) AS BIGINT) % 3 AS INT) * 12, 0, 0)")))
  }

  /** §3 `*Of` form over (queue, registry, now). `descending` selects
    * the scheduler pass. Output: the selected batch with its dequeue
    * rank and the computed priority keys. */
  def dequeueOf(queue: DataFrame, registry: DataFrame, now: DataFrame,
                batchSize: Int = 64, descending: Boolean = true,
                ageWarningSecs: Long = 7L * 86400,
                ageCriticalSecs: Long = 21L * 86400): DataFrame = {
    val active = registry
      .filter(col("collection") === "projects" &&
        col("parent_watch_id").isNull)
      .select(col("tenant_id").as("w_tenant"), col("is_active"))
    val eligible = queue.join(broadcast(now))
      .filter(
        (col("status") === "pending" &&
          (col("lease_until").isNull || col("lease_until") < col("now_ts"))) ||
        (col("status") === "in_progress" && col("lease_until") < col("now_ts")))
      .join(broadcast(active), col("tenant_id") === col("w_tenant"), "left")
    val age = unix_timestamp(col("now_ts")) - unix_timestamp(col("created_at"))
    val keyed = eligible.select(
      col("queue_id"), col("item_type"), col("op"), col("collection"),
      col("tenant_id"), col("created_at"),
      when(col("op").isin("delete", "reset"), 1).otherwise(0).as("k_delete"),
      when(col("item_type") === "tenant" && col("op").isin("add", "scan"), 1)
        .otherwise(0).as("k_tenant"),
      when(age >= ageCriticalSecs, 2).when(age >= ageWarningSecs, 1)
        .otherwise(0).as("k_age"),
      when(col("collection") === "rules", 1)
        .when(col("collection") === "libraries", 0)
        .when(col("is_active"), 1).otherwise(0).as("k_active"),
      when(col("op") === "delete", 10).when(col("op") === "reset", 8)
        .when(col("op") === "add", 5).when(col("op") === "update", 4)
        .when(col("op") === "rename", 3).when(col("op") === "uplift", 2)
        .otherwise(1).as("k_op"))
    val (dirActive, dirOp, dirCreated) =
      if (descending)
        (col("k_active").desc, col("k_op").desc, col("created_at").asc)
      else
        (col("k_active").asc, col("k_op").asc, col("created_at").desc)
    val rank = Window.orderBy(col("k_delete").desc, col("k_tenant").desc,
      col("k_age").desc, dirActive, dirOp, dirCreated, col("queue_id"))
    keyed.withColumn("dequeue_rank", row_number().over(rank))
      .filter(col("dequeue_rank") <= batchSize)
      .select(col("dequeue_rank"), col("queue_id"), col("item_type"),
        col("op"), col("collection"), col("tenant_id"),
        col("k_delete"), col("k_tenant"), col("k_age"), col("k_active"),
        col("k_op"))
      .orderBy(col("dequeue_rank"))
  }

  /** The default high-priority (DESC) pass, batch 64, over the corpus
    * queue and the TUI registry, anchored at the queue's max
    * timestamp. */
  def queueDequeue(spark: SparkSession, dir: String): DataFrame = {
    val q = queue(spark, dir)
    dequeueOf(q, TuiViews.registry(spark, dir),
      q.agg(max(col("created_at")).as("now_ts")))
  }
}
