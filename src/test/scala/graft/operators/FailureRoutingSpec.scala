package graft.operators

import org.apache.spark.sql.functions.{col, lit}
import graft.SparkSpec

/** classify_error / handle_item_failure / cost_samples parity
  * (metrics.rs + batch_processing.rs unit vectors). */
class FailureRoutingSpec extends SparkSpec {

  import spark.implicits._

  private def items(rows: (String, String, String, Int)*) =
    // (queue_id, kind, message, retry_count)
    rows.toDF("queue_id", "error_kind", "error_message", "retry_count")
      .selectExpr("queue_id", "'file' AS item_type", "'add' AS op",
        "'t1' AS tenant_id", "error_kind", "error_message", "retry_count",
        "CAST(2048 AS BIGINT) AS size_bytes", "100L AS processing_ms",
        "2.0 AS elapsed_secs")

  private def route(rows: (String, String, String, Int)*) =
    FailureRouting.failureRoutingOf(items(rows: _*)).collect()
      .map(r => r.getAs[String]("queue_id") ->
        ((r.getAs[String]("category"), r.getAs[String]("action")))).toMap

  test("variant dispatch + message cascade (metrics.rs classify_error)") {
    val v = route(
      ("q1", "file_not_found", "x", 0),
      ("q2", "invalid_payload", "x", 0),
      ("q3", "processing_failed", "Rate limit: 429", 0),
      ("q4", "queue_operation", "database is locked", 0),
      ("q5", "processing_failed", "no watch_folder found", 0),
      ("q6", "processing_failed", "Binary File detected", 0),
      ("q7", "embedding", "too many requests", 0),
      ("q8", "embedding", "inference OOM", 0),
      ("q9", "embedding_unavailable", "backoff", 0),
      ("qa", "storage", "x", 0))
    assert(v("q1") == (("permanent_gone", "delete")))
    assert(v("q2") == (("permanent_data", "dlq")))
    assert(v("q3") == (("rate_limit", "park")))
    assert(v("q4") == (("transient_infrastructure", "retry")))
    assert(v("q5") == (("permanent_gone", "delete")))
    assert(v("q6") == (("permanent_data", "dlq")))
    assert(v("q7") == (("rate_limit", "park")))
    assert(v("q8") == (("transient_resource", "retry")))
    assert(v("q9") == (("subsystem_unavailable", "park")))
    assert(v("qa") == (("transient_infrastructure", "retry")))
  }

  test("retry exhaustion: transient items DLQ once retry_count+1 reaches max (batch_processing.rs should_dlq)") {
    val v = route(
      ("q1", "storage", "x", 1),
      ("q2", "storage", "x", 2),
      ("q3", "storage", "x", 5))
    assert(v("q1") == (("transient_infrastructure", "retry")))
    assert(v("q2") == (("transient_infrastructure", "dlq")))
    assert(v("q3") == (("transient_infrastructure", "dlq")))
  }

  test("cost samples: NULL/zero sizes feed no lane, tiny files clamp, zero elapsed skips throughput only (cost_samples_* vectors)") {
    val base = Seq(
      ("qnull", null.asInstanceOf[java.lang.Long], 100L, 2.0),
      ("qzero", java.lang.Long.valueOf(0L), 100L, 2.0),
      ("qtiny", java.lang.Long.valueOf(512L), 100L, 2.0),
      ("qnoel", java.lang.Long.valueOf(8192L), 100L, 0.0),
      ("qnorm", java.lang.Long.valueOf(8192L), 100L, 2.0))
      .toDF("queue_id", "size_bytes", "processing_ms", "elapsed_secs")
      .selectExpr("queue_id", "'file' AS item_type", "'add' AS op",
        "'t1' AS tenant_id", "'storage' AS error_kind", "'x' AS error_message",
        "0 AS retry_count", "size_bytes", "processing_ms", "elapsed_secs")
    val m = FailureRouting.failureRoutingOf(base).collect()
      .map(r => r.getAs[String]("queue_id") ->
        ((Option(r.getAs[java.lang.Double]("ms_per_kb")),
          Option(r.getAs[java.lang.Double]("throughput"))))).toMap
    assert(m("qnull") == ((None, None)))
    assert(m("qzero") == ((None, None)))
    // 512 B clamps to the 4096 B floor: 100 ms / 4 KB = 25.
    assert(m("qtiny")._1.contains(25.0))
    assert(m("qnoel")._1.contains(12.5) && m("qnoel")._2.isEmpty)
    assert(m("qnorm") == ((Some(12.5), Some(4096.0))))
  }

  test("B6 sqlite-busy flag matches the three probes on the lowercased message") {
    val v = FailureRouting.failureRoutingOf(items(
      ("q1", "storage", "SQLITE_BUSY: locked", 0),
      ("q2", "storage", "Database is Locked", 0),
      ("q3", "storage", "fine", 0))).collect()
      .map(r => r.getAs[String]("queue_id") -> r.getAs[Boolean]("sqlite_busy"))
      .toMap
    assert(v == Map("q1" -> true, "q2" -> true, "q3" -> false))
  }
}
