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
}
