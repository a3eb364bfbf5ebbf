package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with watching_queue/throttle.rs (load levels, the skip
  * gate's keep-1-in-N behavior, the F-045 reconcile flag). */
class QueueThrottleSpec extends SparkSpec {

  import spark.implicits._

  test("load levels: critical >= 5000, high >= 1000, else normal (throttle.rs update_from_queue)") {
    val got = Seq(0L, 999L, 1000L, 4999L, 5000L, 90000L).toDF("d")
      .select(QueueThrottle.levelOf(col("d")).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("normal", "normal", "high", "high", "critical",
      "critical"))
  }

  test("should_throttle KEEPS 1 in N (counter % ratio == 0 passes) — the inverse of the config doc-comment (throttle.rs:156)") {
    val rows = QueueThrottle.queueThrottle(spark, sfDir).collect()
      .filter(_.getAs[String]("section") == "throttle")
    val byLevel = rows.groupBy(_.getAs[String]("level"))
    assert(byLevel("normal").forall(!_.getAs[Boolean]("throttled")))
    byLevel("high").foreach { r =>
      assert(r.getAs[Boolean]("throttled") == (r.getAs[Long]("n") % 2 != 0))
    }
    byLevel("critical").foreach { r =>
      assert(r.getAs[Boolean]("throttled") == (r.getAs[Long]("n") % 4 != 0))
    }
    // With ratio 4, three quarters of events throttle — keep-1-in-N.
    assert(byLevel("critical").count(_.getAs[Boolean]("throttled")) == 15)
  }

  test("only critical-load throttles raise needs_full_reconcile (F-045)") {
    val rows = QueueThrottle.queueThrottle(spark, sfDir).collect()
      .filter(_.getAs[String]("section") == "throttle")
    rows.foreach { r =>
      val expect = r.getAs[String]("level") == "critical" &&
        r.getAs[Boolean]("throttled")
      assert(r.getAs[Boolean]("reconcile_flag") == expect)
    }
  }

  test("depth gauge excludes done rows; per-collection depths sum to the total (throttle.rs update_from_queue)") {
    val rows = QueueThrottle.queueThrottle(spark, sfDir).collect()
      .filter(_.getAs[String]("section") == "depth")
    val total = rows.find(_.getAs[String]("key") == "__total__").get
    val perColl = rows.filter(_.getAs[String]("key") != "__total__")
    assert(perColl.map(_.getAs[Long]("n")).sum == total.getAs[Long]("n"))
    val live = QueueStatus.queue(spark, sfDir)
      .filter(col("status") =!= "done").count()
    assert(total.getAs[Long]("n") == live)
  }
}
