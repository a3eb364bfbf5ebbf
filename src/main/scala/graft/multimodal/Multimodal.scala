package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeFeatures` uses a
  * clearly-marked deterministic fake decoder; the Spark-side plumbing —
  * binary column, metadata struct, mapPartitions batch shape, schema —
  * is real and is what a production pipeline would keep while swapping
  * the decoder body for (e.g.) a JNI/ONNX call.
  */
object Multimodal {

  /** Synthesize an assets table: every document's text bytes stand in
    * for an encoded media blob, with typed metadata derived from the
    * payload (what a real pipeline reads from the container header).
    */
  def assets(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("asset_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("fake/blob").as("mime"),
          length(col("text")).as("n_bytes"),
          (pmod(xxhash64(col("text")), lit(1024L)) + 16L).cast("int").as("width"),
          (pmod(xxhash64(col("text"), lit(1)), lit(768L)) + 16L).cast("int").as("height"))
          .as("meta"))

  /** Feature-extraction schema: fixed-size float vector + dims. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** "Decode" each asset and emit a fixed-size feature vector.
    *
    * FAKE DECODER: a real deployment replaces the body of `extract`
    * with the actual codec/model call; the mapPartitions shape (batch
    * iterator in, batch iterator out, no driver involvement) is the
    * production pattern.
    */
  def decodeFeatures(spark: SparkSession, dir: String, dim: Int = 16): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    val in = assets(spark, dir).select(col("asset_id"), col("payload"),
      col("meta.width").as("width"), col("meta.height").as("height"))
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        // extract: deterministic byte-histogram features in [0, 1),
        // primitive loops + in-place normalize, the array wrapped
        // without copying — no per-element boxing in the hot path.
        val feats = new Array[Float](dim)
        var i = 0
        while (i < payload.length) {
          feats(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1f
          i += 1
        }
        val total = math.max(payload.length, 1).toFloat
        var j = 0
        while (j < dim) { feats(j) /= total; j += 1 }
        Row(id, r.getInt(2), r.getInt(3),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(feats))
      }
    }(enc)
  }

  /** Per-asset feature summary as a verifiable DataFrame (counts and
    * exact-rational ratios only).
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame =
    decodeFeatures(spark, dir)
      .select(col("asset_id"), col("width"), col("height"),
        size(col("features")).as("n_features"))
      .orderBy(col("asset_id"))

  /** Text tower of the fake CLIP pair (clip/encoder.rs:130
    * `encode_text`): the SAME deterministic byte-histogram as the image
    * tower's `extract`, over the query's UTF-8 bytes — the honest
    * stand-in for "both towers project into one shared embedding space"
    * (encoder.rs: 512-dim ViT-B-32 towers; here a dim-16 fake). Queries
    * are driver-held strings, so this runs driver-side, exactly
    * mirroring the executor-side float math.
    */
  def encodeTextLocal(text: String, dim: Int = 16): Array[Float] = {
    val bytes = text.getBytes("UTF-8")
    val feats = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      feats(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1f
      i += 1
    }
    val total = math.max(bytes.length, 1).toFloat
    feats.map(_ / total)
  }

  /** Cross-modal text→asset search (clip/encoder.rs:171
    * `cosine_similarity`; daemon/core/src/image_search.rs): text queries
    * encoded by the text tower, scored by cosine against every asset's
    * image-tower features, per-query top-k.
    *
    * Plan shape = knn_join: ONE scan of the asset side, the tiny
    * encoded-query side broadcast, a per-query rank window over the
    * k·|queries| survivors — no shuffle of the asset corpus at any
    * scale.
    */
  def multimodalSearch(spark: SparkSession, dir: String,
                       queries: Seq[String] = defaultQueries,
                       k: Int = 10): DataFrame = {
    import spark.implicits._
    val q = queries.zipWithIndex
      .map { case (t, i) => (i.toLong, encodeTextLocal(t).toSeq) }
      .toDF("query_id", "q_features")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("asset_id"))
    decodeFeatures(spark, dir)
      .crossJoin(broadcast(q))
      .withColumn("score", graft.GraftFunctions.cosine(col("features"), col("q_features")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("asset_id"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Fixed cross-modal probe texts (sf-independent). */
  val defaultQueries: Seq[String] = Seq(
    "dup vector window fast",
    "select count sum group by window",
    "alpha beta gamma delta")
}
