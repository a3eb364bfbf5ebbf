package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CoreAnalytics

class StreamOpsSpec extends SparkSpec {

  test("streaming windowed counts equal the batch twin on the same input") {
    val streamed = StreamOps.streamingWindowOnce(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = CoreAnalytics.windowEvents(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (k, (n, s)) =>
      assert(streamed(k)._1 == n, s"count at $k")
      assert(math.abs(streamed(k)._2 - s) < 1e-6, s"sum at $k")
    }
  }
}
