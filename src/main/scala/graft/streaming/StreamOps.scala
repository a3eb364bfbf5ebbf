package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch event operators — the
  * reference's continuous ingest loop (memexd file watcher →
  * debounce → processing queue) re-expressed as `readStream` →
  * watermarked windowed aggregation.
  *
  * The same column expressions power the batch `window_events` query,
  * so batch and stream agree row-for-row on the same input (asserted in
  * StreamOpsSpec and by the `streaming_window` verify entry, which
  * replays the events table through a real streaming query).
  */
object StreamOps {

  /** The events parquet carries TIMESTAMP(NANOS); streaming needs an
    * explicit schema, so read ts as long nanos and convert exactly like
    * graft.Tables.events.
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos via nanosAsLong
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over the events parquet. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file source needs a directory; scope it to the events file.
    spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked tumbling-window aggregation (shared shape with the
    * batch `window_events` operator).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Run the streaming pipeline to completion over the (static) events
    * file and return the final result as a batch DataFrame — this is
    * what the verify gate executes, so the streaming path is under the
    * same DuckDB oracle as the batch path.
    */
  def streamingWindowOnce(spark: SparkSession, dir: String): DataFrame = {
    val name = "graft_streaming_window"
    val q = windowedCounts(eventsStream(spark, dir))
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
      .orderBy(col("window_start"), col("event_type"))
  }
}
