package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Parity with the reference's idle retention sweeps: the
  * stale-project WHERE arms (stale_project_deactivation.rs:55) and the
  * done+age queue reclamation (queue_cleanup.rs:67).
  */
class IdleCleanupSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def now(sec: Long) = {
    import spark.implicits._
    Seq(ts(sec)).toDF("now_ts")
  }

  test("stale projects: only active, non-NULL, past-cutoff folders deactivate") {
    import spark.implicits._
    val day = 24 * 3600L
    val folders = Seq(
      (1L, 1, ts(0L)),            // active + stale → deactivate
      (2L, 0, ts(0L)),            // already inactive → keep
      (3L, 1, null: Timestamp),   // never active → keep
      (4L, 1, ts(9 * day))        // active + recent → keep
    ).toDF("project_id", "is_active", "last_activity_at")
    val out = IdleCleanup.staleProjectsOf(folders, now(10 * day), staleHours = 24)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "deactivate", 2L -> "keep", 3L -> "keep", 4L -> "keep"))
  }

  test("queue cleanup: only done rows past retention are reclaimed") {
    import spark.implicits._
    val day = 24 * 3600L
    val queue = Seq(
      (1L, "done", ts(0L)),        // done + old → delete
      (2L, "done", ts(9 * day)),   // done + recent → keep
      (3L, "pending", ts(0L)),     // old but not done → keep
      (4L, "failed", ts(0L))       // old but not done → keep
    ).toDF("item_id", "status", "updated_at")
    val out = IdleCleanup.queueCleanupOf(queue, now(10 * day), retentionHours = 24)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "delete", 2L -> "keep", 3L -> "keep", 4L -> "keep"))
  }

  test("corpus queries keep every gate arm reachable") {
    val sp = IdleCleanup.staleProjects(spark, sfDir).collect()
    assert(sp.exists(_.getString(3) == "deactivate") && sp.exists(_.getString(3) == "keep"))
    assert(sp.exists(r => r.getInt(1) == 0 && r.getString(3) == "keep"))
    assert(sp.exists(r => r.isNullAt(2) && r.getString(3) == "keep"))
    val qc = IdleCleanup.queueCleanup(spark, sfDir).collect()
    assert(qc.exists(_.getString(3) == "delete") && qc.exists(_.getString(3) == "keep"))
    qc.filter(_.getString(3) == "delete").foreach(r => assert(r.getString(1) == "done"))
  }
}
