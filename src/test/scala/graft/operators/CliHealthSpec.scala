package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with data/queries/queue.rs (health thresholds, reason
  * strings, worst-of, avg processing). */
class CliHealthSpec extends SparkSpec {

  private lazy val rows = CliHealth.statusHealth(spark, sfDir).collect()
  private lazy val fixture = rows
    .filter(_.getAs[String]("section") == "fixture")
    .map(r => r.getAs[String]("name") ->
      (r.getAs[String]("level"), Option(r.getAs[String]("reason")))).toMap

  test("health(): empty active set and fresh queues are healthy (queue.rs health)") {
    assert(fixture("empty") == (("healthy", None)))
    assert(fixture("clean") == (("healthy", None)))
  }

  test("degraded on age > 1h or any failed, with the exact reason strings (queue.rs health_reason)") {
    assert(fixture("aged") == (("degraded", Some("oldest pending: 2h (>1h)"))))
    // 1 failed of 11 active = 9% ≤ 10% → degraded with the count form.
    assert(fixture("failed_some") == (("degraded", Some("1 failed"))))
  }

  test("unhealthy on age > 24h (days+hours form) or fail ratio > 10% (percent form); both reasons join (queue.rs health/health_reason)") {
    assert(fixture("old_days") ==
      (("unhealthy", Some("oldest pending: 2d 2h (>24h)"))))
    // 5 failed of 6 active = 83%.
    assert(fixture("high_ratio") == (("unhealthy", Some("failed: 83% (>10%)"))))
    assert(fixture("both") ==
      (("unhealthy", Some("oldest pending: 1d 6h (>24h), failed: 83% (>10%)"))))
  }

  test("worst-of across the corpus collections; avg processing over per-item phase sums (queue.rs worst/get_avg_processing_ms)") {
    val coll = rows.filter(_.getAs[String]("section") == "collection")
    assert(coll.nonEmpty)
    val sev = Map("healthy" -> 0, "degraded" -> 1, "unhealthy" -> 2)
    val worst = coll.map(r => sev(r.getAs[String]("level"))).max
    val overall = rows.find(_.getAs[String]("section") == "overall").get
    assert(sev(overall.getAs[String]("level")) == worst)

    val avg = rows.find(_.getAs[String]("section") == "avg").get
    assert(avg.getAs[Double]("avg_ms") > 0.0)
  }
}
