package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with queue_operations/update.rs resurrect_failed_transient
  * (+ retry_tests.rs test_resurrect_failed_transient_resets_items). */
class QueueResurrectSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, String, String, String)], max: Long = 5L) =
    QueueResurrect.queueResurrectOf(
      rows.toDF("queue_id", "status", "error_message", "metadata")
        .withColumn("tenant_id", lit("t")), max)
      .collect()

  test("only failed rows with a [transient_ prefix are eligible (update.rs:62)") {
    val out = run(Seq(
      ("q1", "failed", "[transient_network] x", "{}"),
      ("q2", "failed", "[permanent_data] y", "{}"),
      ("q3", "failed", "bare message", "{}"),
      ("q4", "pending", "[transient_timeout] z", "{}")))
    val items = out.filter(_.getAs[String]("section") == "item")
      .map(_.getAs[String]("queue_id")).toSet
    assert(items == Set("q1"))
  }

  test("count under max resurrects (pending, count+1); at max promotes to [permanent_exhausted] (update.rs:90/:108)") {
    val out = run(Seq(
      ("q1", "failed", "[transient_network] conn", """{"resurrection_count":4}"""),
      ("q2", "failed", "[transient_timeout] slow", """{"resurrection_count":5}"""),
      ("q3", "failed", "[transient_rate_limit] rl", """{"resurrection_count":7}""")))
      .filter(_.getAs[String]("section") == "item")
      .map(r => r.getAs[String]("queue_id") ->
        (r.getAs[String]("verdict"), r.getAs[String]("new_status"),
          r.getAs[String]("new_error_message"),
          Option(r.getAs[java.lang.Long]("new_resurrection_count")))).toMap
    assert(out("q1") == (("resurrected", "pending",
      "[transient_network] conn", Some(5L))))
    assert(out("q2") == (("exhausted", "failed",
      "[permanent_exhausted] [transient_timeout] slow", None)))
    assert(out("q3")._1 == "exhausted")
  }

  test("absent, foreign-key, or unparseable metadata counts as 0 (the serde unwrap_or default)") {
    val out = run(Seq(
      ("q1", "failed", "[transient_network] a", null),
      ("q2", "failed", "[transient_network] b", """{"other":1}"""),
      ("q3", "failed", "[transient_network] c", "not json")))
      .filter(_.getAs[String]("section") == "item")
    assert(out.forall(_.getAs[Long]("resurrection_count") == 0L))
    assert(out.forall(_.getAs[String]("verdict") == "resurrected"))
    assert(out.forall(_.getAs[Long]("new_resurrection_count") == 1L))
  }

  test("counters tally the two verdicts (retry_tests.rs counts)") {
    val out = run(Seq(
      ("q1", "failed", "[transient_network] a", """{"resurrection_count":1}"""),
      ("q2", "failed", "[transient_network] b", """{"resurrection_count":9}"""),
      ("q3", "failed", "[transient_network] c", "{}")))
    val counts = out.filter(_.getAs[String]("section") == "count")
      .map(r => r.getAs[String]("queue_id") ->
        r.getAs[Long]("resurrection_count")).toMap
    assert(counts == Map("resurrected" -> 2L, "exhausted" -> 1L))
  }

  test("corpus: both verdicts live; exhausted messages compose with the dlq_entries category parser") {
    val rows = QueueResurrect.queueResurrect(spark, sfDir).collect()
      .filter(_.getAs[String]("section") == "item")
    assert(rows.exists(_.getAs[String]("verdict") == "resurrected"))
    assert(rows.exists(_.getAs[String]("verdict") == "exhausted"))
    // The promoted message's [category] prefix is what dlq_entries'
    // extract_error_category reads: first ]-terminated bracket.
    rows.filter(_.getAs[String]("verdict") == "exhausted").foreach { r =>
      assert(r.getAs[String]("new_error_message")
        .startsWith("[permanent_exhausted] "))
    }
  }
}
