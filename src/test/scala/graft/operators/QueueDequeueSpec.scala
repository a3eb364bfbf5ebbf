package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** The dequeue priority semantics (dequeue.rs:342 build_dequeue_query):
  * key order, pass direction, and lease eligibility on fixtures. */
class QueueDequeueSpec extends SparkSpec {

  import spark.implicits._

  private val now = Timestamp.valueOf("2025-01-31 00:00:00")
  private val fresh = Timestamp.valueOf("2025-01-30 23:00:00")
  private val aged = Timestamp.valueOf("2025-01-20 00:00:00")   // > 7d
  private val ancient = Timestamp.valueOf("2025-01-01 00:00:00") // > 21d

  private def q(rows: (String, String, String, String, String, String,
      Timestamp, Timestamp)*) =
    rows.toDF("queue_id", "item_type", "op", "collection", "tenant_id",
      "status", "created_at", "lease_until")

  private def reg(rows: (String, Boolean)*) =
    rows.toDF("tenant_id", "is_active")
      .selectExpr("'w-' || tenant_id AS watch_id", "tenant_id",
        "'projects' AS collection", "CAST(NULL AS STRING) AS parent_watch_id",
        "'/p' AS path", "is_active", "true AS enabled",
        "CAST(NULL AS STRING) AS library_mode", "false AS is_paused",
        "false AS is_archived")

  private val nowDf = Seq(Tuple1(now)).toDF("now_ts")

  private def order(queue: org.apache.spark.sql.DataFrame,
                    registry: org.apache.spark.sql.DataFrame,
                    descending: Boolean = true): Seq[String] =
    QueueDequeue.dequeueOf(queue, registry, nowDf, descending = descending)
      .collect().map(_.getAs[String]("queue_id")).toSeq

  test("delete/reset precedence beats everything; tenant add/scan line-jumps next (#70/#112)") {
    val queue = q(
      ("q-add", "file", "add", "projects", "t1", "pending", fresh, null),
      ("q-del", "file", "delete", "projects", "t1", "pending", fresh, null),
      ("q-scan", "tenant", "scan", "projects", "t2", "pending", fresh, null),
      ("q-reset", "file", "reset", "projects", "t1", "pending", fresh, null))
    val got = order(queue, reg(("t1", true), ("t2", false)))
    // deletes first (delete 10 > reset 8 on k_op), then the tenant scan.
    assert(got == Seq("q-del", "q-reset", "q-scan", "q-add"))
  }

  test("age promotion outranks project-active and survives the ASC pass (dequeue.rs age CASE)") {
    val queue = q(
      ("q-hot", "file", "add", "projects", "t-active", "pending", fresh, null),
      ("q-old", "file", "scan", "projects", "t-idle", "pending", aged, null),
      ("q-anc", "file", "scan", "projects", "t-idle", "pending", ancient, null))
    val registry = reg(("t-active", true), ("t-idle", false))
    assert(order(queue, registry) == Seq("q-anc", "q-old", "q-hot"))
    // ASC pass: age stays DESC (rescue on both passes), the rest flips.
    assert(order(queue, registry, descending = false) ==
      Seq("q-anc", "q-old", "q-hot"))
  }

  test("pass direction flips activity/op/created keys (Tasks 9/21)") {
    val queue = q(
      ("q-a", "file", "add", "projects", "t-active", "pending", fresh, null),
      ("q-b", "file", "scan", "projects", "t-idle", "pending", fresh, null))
    val registry = reg(("t-active", true), ("t-idle", false))
    assert(order(queue, registry) == Seq("q-a", "q-b"))
    assert(order(queue, registry, descending = false) == Seq("q-b", "q-a"))
  }

  test("eligibility: unexpired in_progress leases excluded, expired ones recovered; rules beat libraries") {
    val past = Timestamp.valueOf("2025-01-30 00:00:00")
    val future = Timestamp.valueOf("2025-02-02 00:00:00")
    val queue = q(
      ("q-leased", "file", "add", "projects", "t1", "in_progress", fresh, future),
      ("q-stale", "file", "add", "projects", "t1", "in_progress", fresh, past),
      ("q-rule", "text", "add", "rules", "t1", "pending", fresh, null),
      ("q-lib", "file", "add", "libraries", "t1", "pending", fresh, null))
    val got = order(queue, reg(("t1", false)))
    assert(!got.contains("q-leased"))
    assert(got.indexOf("q-rule") < got.indexOf("q-lib"))
    assert(got.contains("q-stale"))
  }

  test("corpus batch: 64 rows, rank-ordered, every priority key active") {
    val rows = QueueDequeue.queueDequeue(spark, sfDir).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getAs[Int]("dequeue_rank")).toSeq == (1 to 64))
    // The head of the DESC pass is all delete/reset precedence rows.
    assert(rows.head.getAs[Int]("k_delete") == 1)
  }
}
