package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("assets carry binary payloads with typed metadata") {
    val rows = Multimodal.assets(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val meta = r.getStruct(2)
      assert(payload.nonEmpty)
      assert(meta.getAs[Int]("n_bytes") == payload.length)
      assert(meta.getAs[Int]("width") >= 16 && meta.getAs[Int]("height") >= 16)
    }
  }

  test("decodeFeatures emits normalized fixed-size vectors per asset") {
    val rows = Multimodal.decodeFeatures(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val feats = r.getSeq[Float](3)
      assert(feats.length == 16)
      assert(math.abs(feats.sum - 1.0f) < 1e-3, s"asset ${r.getLong(0)} histogram sums to 1")
    }
  }

  test("decode is deterministic across runs") {
    val a = Multimodal.featureSummary(spark, sfDir).collect()
    val b = Multimodal.featureSummary(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  /** Driver-side brute force of the cross-modal search: same double
    * accumulation order as the CosineSimilarity expression (floats cast
    * to double before the multiply).
    */
  private def bruteForceTopK(queries: Seq[String],
                             assets: Array[(Long, Seq[Float])],
                             k: Int): Seq[(Long, Long, Int)] = {
    def cosine(x: Seq[Float], y: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(x.length, y.length)
      while (i < n) {
        val xv = x(i).toDouble; val yv = y(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom > 0) dot / denom else 0.0
    }
    queries.zipWithIndex.flatMap { case (q, qi) =>
      val qf = Multimodal.encodeTextLocal(q).toSeq
      assets.map { case (id, f) => (id, cosine(f, qf)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k)
        .zipWithIndex
        .map { case ((id, _), r) => (qi.toLong, id, r + 1) }
    }
  }

  test("multimodal_search matches driver-side brute force exactly") {
    val assets = Multimodal.decodeFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](3)))
    val queries = Multimodal.defaultQueries
    val got = Multimodal.multimodalSearch(spark, sfDir, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val expected = bruteForceTopK(queries, assets, 10)
    assert(got == expected, s"got=${got.take(8)}... expected=${expected.take(8)}...")
  }

  test("multimodal_search: a query of an asset's own text retrieves maximal similarity") {
    import org.apache.spark.sql.functions.col
    // the text of doc 7 IS asset 7's payload, so the text tower and the
    // image tower produce the identical histogram — cosine exactly 1.0.
    val text7 = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 7L).select(col("text")).head.getString(0)
    val assets = Multimodal.decodeFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](3)))
    val top = Multimodal.multimodalSearch(spark, sfDir, Seq(text7), k = 5).collect()
    val topId = top.head.getLong(1)
    // ties on identical histograms break by asset id; whatever wins must
    // carry the same histogram as the query encoding.
    val qf = Multimodal.encodeTextLocal(text7).toSeq
    val winnerF = assets.find(_._1 == topId).get._2
    assert(winnerF == qf, s"rank-1 asset $topId must match the query histogram")
  }
}
