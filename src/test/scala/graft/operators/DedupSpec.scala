package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {

  test("dedup_exact maps every doc to itself when corpus has no dupes") {
    val rows = Dedup.dedupExact(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("canonical_id") == r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("is_dup") == 0)
    }
  }

  test("ngram_jaccard pairs match a driver-side recomputation") {
    val got = Dedup.ngramJaccard(spark, sfDir, probeMax = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val texts = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def grams(s: String): Set[String] = s.sliding(3).toSet
    for (a <- texts.keys; b <- texts.keys if a < b) {
      val (ga, gb) = (grams(texts(a)), grams(texts(b)))
      val j = (ga intersect gb).size.toDouble / (ga union gb).size
      if (j >= 0.5)
        assert(math.abs(got((a, b)) - j) < 1e-3, s"pair ($a,$b)")
      else assert(!got.contains((a, b)), s"pair ($a,$b) should be below threshold")
    }
  }

  test("dedup_minhash finds high-jaccard pairs and verifies them exactly") {
    val rows = Dedup.dedupMinhash(spark, sfDir).collect()
    assert(rows.nonEmpty, "expected near-dup pairs in this self-similar corpus")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.6)
      assert(r.getLong(0) < r.getLong(1))
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.distinct.length == pairs.length)
  }

  test("dedup_minhash recall vs exact ngram pairs is reasonable") {
    val exact = Dedup.ngramJaccard(spark, sfDir, probeMax = 50L, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.dedupMinhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = (exact intersect approx).size.toDouble / exact.size
      assert(recall >= 0.7, s"LSH recall $recall over ${exact.size} true pairs")
    }
  }

  test("dedup_simhash pairs are within the hamming budget and symmetric-free") {
    val rows = Dedup.dedupSimhash(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getInt(2) <= 7)
      assert(r.getLong(0) < r.getLong(1))
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.distinct.length == pairs.length)
  }

  test("dedup_embedding returns the 20 most-similar pairs ranked") {
    val rows = Dedup.dedupEmbedding(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getInt(2)).toSeq == (1 to 20))
  }
}
