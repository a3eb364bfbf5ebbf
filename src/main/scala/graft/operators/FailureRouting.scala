package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-item failure handling in the processing loop
  * (unified_queue_processor/metrics.rs:48 classify_error + :100
  * is_permanent_category, processing_loop/batch_processing.rs:525
  * handle_item_failure, :375 cost_samples):
  *
  *  - classification: the error-variant dispatch, with the message
  *    cascade for queue/processing errors (rate-limit probes first,
  *    then sqlite-busy → transient, watch-folder/permission → gone,
  *    validation/unsupported/binary-file → permanent_data, else
  *    transient_infrastructure);
  *  - the B6 sqlite lock-wait counter flag (lowercased
  *    `database is locked` / `database locked` / `sqlite_busy`);
  *  - routing: permanent_gone → silent delete; subsystem_unavailable /
  *    rate_limit → park (re-lease 60 s, no retry burn); else DLQ when
  *    the category is permanent OR retry_count+1 reaches max_retries
  *    (3), else retry with the `[category] message` annotation;
  *  - the #133 F2b cost samples under DOM-07: NULL/non-positive sizes
  *    feed neither lane, ms/KB clamps the size to the min-item floor,
  *    throughput additionally requires elapsed > 0.
  *
  * All map-side expressions over the failed slice — no joins, no
  * shuffle; the EWMA lanes the samples feed are trend_ewma's operator.
  */
object FailureRouting {

  /** classify_message (metrics.rs:71) over a lowercased message. */
  private def classifyMessage(msg: Column): Column = {
    val l = lower(msg)
    when(l.contains("rate limit") || l.contains("429") ||
      l.contains("too many requests"), "rate_limit")
      .when(l.contains("database locked") || l.contains("sqlite_busy"),
        "transient_infrastructure")
      .when(l.contains("no watch_folder found"), "permanent_gone")
      .when(l.contains("permission denied") ||
        l.contains("access denied"), "permanent_gone")
      .when(l.contains("validation") || l.contains("invalid") ||
        l.contains("invalid format") || l.contains("malformed") ||
        l.contains("unsupported") || l.contains("binary file"),
        "permanent_data")
      .otherwise("transient_infrastructure")
  }

  /** classify_error (metrics.rs:48) over (error_kind, message). */
  def classify(kind: Column, msg: Column): Column = {
    val l = lower(msg)
    when(kind === "file_not_found", "permanent_gone")
      .when(kind === "invalid_payload", "permanent_data")
      .when(kind.isin("queue_operation", "processing_failed"),
        classifyMessage(msg))
      .when(kind === "storage", "transient_infrastructure")
      .when(kind === "embedding",
        when(l.contains("rate limit") || l.contains("429") ||
          l.contains("too many requests"), "rate_limit")
          .otherwise("transient_resource"))
      .when(kind === "embedding_unavailable", "subsystem_unavailable")
      .otherwise("transient_infrastructure")
  }

  /** The failed-item synthesis: error kinds and messages cycling every
    * classify branch, retry counts around the max-retries edge, and
    * the cost-sample axes with NULL-size / zero-elapsed arms. */
  def failedItems(spark: SparkSession, dir: String): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    val kinds = Seq("file_not_found", "invalid_payload", "queue_operation",
      "processing_failed", "storage", "embedding", "embedding_unavailable",
      "other")
    val msgs = Seq("Rate limit hit (429)", "database is locked by writer",
      "no watch_folder found for tenant", "permission denied: /srv",
      "validation failed on field", "binary file has no text",
      "connection reset by peer", "Too Many Requests")
    TuiViews.queue(spark, dir)
      .filter(col("status") === "failed")
      .select(col("queue_id"), col("item_type"), col("op"), col("tenant_id"),
        element_at(array(kinds.map(lit): _*),
          (pmod(eid, lit(8)) + 1).cast("int")).as("error_kind"),
        element_at(array(msgs.map(lit): _*),
          (pmod(floor(eid / 8).cast("long"), lit(8)) + 1).cast("int"))
          .as("error_message"),
        pmod(eid, lit(5)).cast("int").as("retry_count"),
        when(pmod(eid, lit(6)) =!= 0, (pmod(eid, lit(2000)) + 1) * 50)
          .as("size_bytes"),
        (pmod(eid, lit(500)) + 10).as("processing_ms"),
        (pmod(eid, lit(300)).cast("double") / 10.0).as("elapsed_secs"))
  }

  /** §3 `*Of` form: per failed item, the category, the B6 flag, the
    * routing verdict, and the two cost samples. */
  def failureRoutingOf(items: DataFrame, maxRetries: Int = 3,
                       minItemBytes: Long = 4096L): DataFrame = {
    val category = classify(col("error_kind"), col("error_message"))
    val lowerMsg = lower(col("error_message"))
    val permanent = category.startsWith("permanent")
    val sizeKb = greatest(col("size_bytes").cast("double") / 1024.0,
      lit(minItemBytes.toDouble / 1024.0))
    items.select(
      col("queue_id"), col("item_type"), col("op"), col("tenant_id"),
      col("error_kind"), col("error_message"), col("retry_count"),
      category.as("category"),
      permanent.as("is_permanent"),
      (lowerMsg.contains("database is locked") ||
        lowerMsg.contains("database locked") ||
        lowerMsg.contains("sqlite_busy")).as("sqlite_busy"),
      when(category === "permanent_gone", "delete")
        .when(category.isin("subsystem_unavailable", "rate_limit"), "park")
        .when(permanent || col("retry_count") + 1 >= maxRetries, "dlq")
        .otherwise("retry").as("action"),
      when(!(category === "permanent_gone") &&
        !category.isin("subsystem_unavailable", "rate_limit"),
        concat(lit("["), category, lit("] "), col("error_message")))
        .as("categorized_message"),
      when(col("size_bytes").isNotNull && col("size_bytes") > 0,
        round(col("processing_ms").cast("double") / sizeKb, 6))
        .as("ms_per_kb"),
      when(col("size_bytes").isNotNull && col("size_bytes") > 0 &&
        col("elapsed_secs") > 0.0,
        round(col("size_bytes").cast("double") / col("elapsed_secs"), 6))
        .as("throughput"))
    .orderBy(col("queue_id"))
  }

  def failureRouting(spark: SparkSession, dir: String): DataFrame =
    failureRoutingOf(failedItems(spark, dir))
}
