package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class VectorSearchSpec extends SparkSpec {

  /** Driver-side brute-force oracle over the small test corpus. */
  private lazy val corpus: Map[Long, Array[Double]] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def bruteTopK(queryId: Long, k: Int): Seq[Long] = {
    val q = corpus(queryId)
    corpus.toSeq.filter(_._1 != queryId)
      .map { case (id, v) => (id, cosine(q, v)) }
      .sortBy { case (id, s) => (-s, id) }
      .take(k).map(_._1)
  }

  test("dense_topk matches driver-side brute force exactly") {
    val got = VectorSearch.denseTopK(spark, sfDir, queryId = 0L, k = 20)
      .collect().map(_.getLong(0)).toSeq
    assert(got == bruteTopK(0L, 20))
  }

  test("dense_topk rank column is 1..k") {
    val ranks = VectorSearch.denseTopK(spark, sfDir, queryId = 0L, k = 20)
      .collect().map(_.getInt(1)).toSeq
    assert(ranks == (1 to 20))
  }

  test("knn_join per-probe results match brute force") {
    val got = VectorSearch.knnJoin(spark, sfDir, probeMax = 10L, k = 3)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    (0L until 10L).foreach { p =>
      assert(got(p) == bruteTopK(p, 3), s"probe $p")
    }
  }

  test("ann_lsh achieves reasonable recall vs brute force") {
    val got = VectorSearch.annLsh(spark, sfDir, probeMax = 5L, k = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val recalls = (0L until 5L).map { p =>
      val truth = bruteTopK(p, 10).toSet
      val found = got.getOrElse(p, Set.empty)
      (truth intersect found).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.3, s"mean recall@10 = $mean (per-probe: $recalls)")
  }

  test("ann_ivf achieves reasonable recall vs brute force") {
    val got = VectorSearch.annIvf(spark, sfDir, probeMax = 5L, k = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
    val recalls = (0L until 5L).map { p =>
      val truth = bruteTopK(p, 10).toSet
      val found = got.getOrElse(p, Set.empty)
      (truth intersect found).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.3, s"mean recall@10 = $mean (per-probe: $recalls)")
  }

  test("multi-probe LSH candidates are a superset, per-probe recall never drops") {
    // The property annLshMultiprobeCert's bound leans on: the Hamming
    // ball around each probe key contains the key itself, so the
    // probed candidate set contains the single-probe set, and top-k by
    // exact cosine over a superset can only raise per-probe recall.
    val single = VectorSearch.lshCandidates(spark, sfDir, probeMax = 5L)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = VectorSearch.lshCandidates(spark, sfDir, probeMax = 5L,
      probeHamming = 2)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.subsetOf(probed),
      s"single-probe candidates must survive probing: missing ${(single -- probed).take(3)}")
    assert(probed.size > single.size,
      "probeHamming=2 must actually widen the candidate set on this corpus")

    def recalls(ph: Int): Map[Long, Double] = {
      val got = VectorSearch.annLsh(spark, sfDir, probeMax = 5L, k = 10,
        probeHamming = ph)
        .collect().groupBy(_.getLong(0))
        .map { case (p, rs) => p -> rs.map(_.getLong(1)).toSet }
      (0L until 5L).map { p =>
        val truth = bruteTopK(p, 10).toSet
        p -> (truth intersect got.getOrElse(p, Set.empty)).size.toDouble / truth.size
      }.toMap
    }
    val r0 = recalls(0)
    val r2 = recalls(2)
    (0L until 5L).foreach { p =>
      assert(r2(p) >= r0(p) - 1e-9,
        s"probe $p: multiprobe recall ${r2(p)} below single-probe ${r0(p)}")
    }
  }

  test("recommend excludes the example points") {
    val ids = VectorSearch.recommend(spark, sfDir).collect().map(_.getLong(0)).toSet
    assert((ids intersect Set(1L, 2L, 3L, 4L, 5L)).isEmpty)
    assert(ids.size == 20)
  }

  test("dense_topk filtered restricts candidates to the label") {
    val labels = Tables.embeddings(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val ids = VectorSearch.denseTopK(spark, sfDir, queryId = 0L, k = 20, label = Some(3))
      .collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    ids.foreach(id => assert(labels(id) == 3))
  }
}
