package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transient-failure resurrection (queue_operations/update.rs:56
  * resurrect_failed_transient, run from the processor's circuit-
  * breaker recovery and idle passes with the config default
  * max_resurrections = 5):
  *
  *  - eligibility: status = failed AND error_message LIKE
  *    `[transient_%` — category prefixes only; bare messages and
  *    permanent categories never resurrect.
  *  - resurrection_count parses out of the metadata JSON (absent or
  *    unparseable metadata → 0, the serde unwrap_or default).
  *  - count ≥ max → PROMOTED: error_message becomes
  *    `[permanent_exhausted] <original>` (which dlq_entries then
  *    classifies into the DLQ — the two operators compose).
  *  - count < max → RESURRECTED: status pending, retry_count 0,
  *    lease/worker/destination statuses cleared, count+1 written
  *    back.
  *
  * The reference runs one UPDATE per row (N+1); the twin is one scan
  * with the verdict + updated fields as columns (shuffle-free), plus
  * the (resurrected, exhausted) counters.
  */
object QueueResurrect {

  val MaxResurrections = 5L

  /** The failed-row axis: transient categories with a resurrection-
    * count spread crossing the max, permanent categories, bare
    * messages, and absent/foreign/unparseable metadata. */
  def failedRows(spark: SparkSession, dir: String): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    TuiViews.queue(spark, dir)
      .filter(col("status") === "failed")
      .withColumn("error_message",
        when(pmod(eid, lit(5)) === 0, lit("[transient_network] conn reset"))
          .when(pmod(eid, lit(5)) === 1, lit("[transient_timeout] slow io"))
          .when(pmod(eid, lit(5)) === 2, lit("[permanent_data] parse error"))
          .when(pmod(eid, lit(5)) === 3, lit("plain failure text"))
          .otherwise(lit("[transient_rate_limit] backoff")))
      .withColumn("metadata",
        when(pmod(eid, lit(9)) < 6,
          concat(lit("{\"resurrection_count\":"), pmod(eid, lit(8)), lit("}")))
          .when(pmod(eid, lit(9)) === 6, lit("{\"other\":1}"))
          .when(pmod(eid, lit(9)) === 7, lit("not json")))
  }

  /** §3 `*Of` form: per eligible row the verdict and post-update
    * fields, plus the counter rows. */
  def queueResurrectOf(failed: DataFrame, max: Long): DataFrame = {
    val eligible = failed.filter(col("status") === "failed" &&
      col("error_message").startsWith("[transient_"))
    val count = coalesce(
      when(get_json_object(col("metadata"), "$.resurrection_count")
        .rlike("^-?[0-9]+$"),
        get_json_object(col("metadata"), "$.resurrection_count")).cast("long"),
      lit(0L))
    val verdictRows = eligible.select(
        lit("item").as("section"), col("queue_id"), col("tenant_id"),
        col("error_message"), count.as("resurrection_count"),
        when(count >= max, lit("exhausted")).otherwise(lit("resurrected"))
          .as("verdict"),
        when(count >= max,
          concat(lit("[permanent_exhausted] "), col("error_message")))
          .otherwise(col("error_message")).as("new_error_message"),
        when(count >= max, lit("failed")).otherwise(lit("pending"))
          .as("new_status"),
        when(count < max, count + 1).as("new_resurrection_count"))
    val counters = verdictRows.agg(
        sum(when(col("verdict") === "resurrected", 1L).otherwise(0L)).as("r"),
        sum(when(col("verdict") === "exhausted", 1L).otherwise(0L)).as("e"))
      .select(explode(map(lit("resurrected"), col("r"),
        lit("exhausted"), col("e"))).as(Seq("k", "v")))
      .select(lit("count").as("section"), col("k").as("queue_id"),
        lit(null).cast("string").as("tenant_id"),
        lit(null).cast("string").as("error_message"),
        col("v").as("resurrection_count"),
        lit(null).cast("string").as("verdict"),
        lit(null).cast("string").as("new_error_message"),
        lit(null).cast("string").as("new_status"),
        lit(null).cast("long").as("new_resurrection_count"))
    verdictRows.unionByName(counters)
      .orderBy(col("section"), col("queue_id"))
  }

  def queueResurrect(spark: SparkSession, dir: String): DataFrame =
    queueResurrectOf(failedRows(spark, dir), MaxResurrections)
}
