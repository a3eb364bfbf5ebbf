package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** extract_error_category's own unit vectors (dlq.rs
  * test_extract_error_category) + the entry-derivation arms. */
class DlqOpsSpec extends SparkSpec {

  import spark.implicits._

  test("extract_error_category: bracket prefix, exhausted fallback, unknown (dlq.rs test_extract_error_category)") {
    val got = Seq(
      "[permanent_data] bad",
      "[permanent_gone] deleted",
      "[transient_infrastructure] timeout",
      "exhausted after 5 retries",
      "random error",
      "[unterminated no close")
      .toDF("m").select(DlqOps.errorCategory(col("m")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("permanent_data", "permanent_gone",
      "transient_infrastructure", "permanent_exhausted", "unknown",
      "unknown"))
  }

  test("entry derivation: resurrection default, final_failure fallback, replay gate (dlq.rs move_to_dlq/replay_from_dlq)") {
    val rows = DlqOps.dlqEntries(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // permanent_data entries are the only non-replayable ones.
    rows.foreach { r =>
      val cat = r.getAs[String]("error_category")
      assert(r.getAs[Boolean]("replayable_without_force") ==
        (cat != "permanent_data"))
    }
    // Metadata without the key (or absent) defaults to 0; the keyed arm
    // carries eid%4.
    val res = rows.map(_.getAs[Long]("resurrection_count")).toSet
    assert(res.contains(0L) && res.exists(_ > 0L))
    // The bare-exhausted arm categorizes as permanent_exhausted.
    assert(rows.exists(r =>
      r.getAs[String]("error_message").startsWith("exhausted after") &&
        r.getAs[String]("error_category") == "permanent_exhausted"))
    assert(rows.forall(_.getAs[java.sql.Timestamp]("final_failure_at") != null))
  }
}
