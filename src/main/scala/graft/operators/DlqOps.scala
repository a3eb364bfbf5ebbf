package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dead-letter-queue ingestion (queue_operations/dlq.rs:30
  * move_to_dlq + :329 extract_error_category): the entry each
  * DLQ-bound failed row becomes, with the replay gate annotated.
  *
  *  - error_category: the `[…]` prefix when present (chars up to the
  *    FIRST `]`; an unterminated `[` falls through), else
  *    `permanent_exhausted` when the message contains `exhausted`,
  *    else `unknown`;
  *  - final_failure_at = COALESCE(last_error_at, updated_at) (:55);
  *  - resurrection_count parsed out of the metadata JSON, 0 when the
  *    key (or the metadata) is absent (:66);
  *  - replayable_without_force: replay_from_dlq (:124) refuses
  *    `permanent_data` without force — annotated per entry;
  *  - listing order: moved_to_dlq_at DESC (list_dlq :255) — here
  *    final_failure_at DESC totalized by queue id.
  *
  * The DLQ-bound set composes the two producers: triage's permanent
  * prefixes and the processing loop's retry-exhaustion messages. The
  * INSERT/DELETE transaction is a storage effect; this is the entry
  * derivation. Scale: a filtered scan with map-side expressions only —
  * no joins, no shuffle beyond the output sort.
  */
object DlqOps {

  /** extract_error_category (dlq.rs:329). */
  def errorCategory(msg: Column): Column = {
    val bracket = regexp_extract(msg, "^\\[([^\\]]*)\\]", 1)
    when(msg.startsWith("[") && msg.contains("]"), bracket)
      .when(msg.contains("exhausted"), lit("permanent_exhausted"))
      .otherwise(lit("unknown"))
  }

  /** The DLQ-bound failed slice: the triage permanent prefixes plus a
    * bare retry-exhaustion arm, with retry counts, sparse metadata
    * (with and without the resurrection key), and a NULL-last_error
    * arm exercising the final_failure_at fallback. */
  def dlqBound(spark: SparkSession, dir: String): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    TuiViews.queue(spark, dir)
      .filter(col("status") === "failed" && pmod(eid, lit(11)) < 4)
      .withColumn("error_message",
        when(pmod(eid, lit(11)) === 0, lit("[permanent_exhausted] retries"))
          .when(pmod(eid, lit(11)) === 1, lit("[permanent_data] parse"))
          .when(pmod(eid, lit(11)) === 2, lit("[permanent_gone] missing"))
          .otherwise(concat(lit("exhausted after "), pmod(eid, lit(5)) + 1,
            lit(" retries"))))
      .withColumn("retry_count", pmod(eid, lit(6)).cast("int"))
      .withColumn("metadata",
        when(pmod(eid, lit(9)) === 0,
          concat(lit("{\"resurrection_count\":"), pmod(eid, lit(4)), lit("}")))
          .when(pmod(eid, lit(9)) === 1, lit("{\"other\":1}")))
      .withColumn("last_error_at",
        when(pmod(eid, lit(7)) =!= 0, col("updated_at")))
      .withColumn("file_path",
        when(pmod(eid, lit(13)) =!= 0,
          concat(lit("src/f"), pmod(eid, lit(37)), lit(".rs"))))
  }

  /** §3 `*Of` form: failed rows → DLQ entries. */
  def dlqEntriesOf(bound: DataFrame): DataFrame =
    bound.select(
      col("queue_id").as("original_queue_id"),
      col("item_type"), col("op"), col("tenant_id"), col("collection"),
      col("file_path"),
      errorCategory(col("error_message")).as("error_category"),
      col("error_message"), col("retry_count"),
      coalesce(get_json_object(col("metadata"), "$.resurrection_count")
        .cast("long"), lit(0L)).as("resurrection_count"),
      coalesce(col("last_error_at"), col("updated_at"))
        .as("final_failure_at"),
      (errorCategory(col("error_message")) =!= "permanent_data")
        .as("replayable_without_force"))
    .orderBy(col("final_failure_at").desc, col("original_queue_id"))

  def dlqEntries(spark: SparkSession, dir: String): DataFrame =
    dlqEntriesOf(dlqBound(spark, dir))
}
