package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  test("sample_stratified: quota, ranks, and hash-order selection per stratum") {
    val quota = 10
    val out = Sampling.sampleStratified(spark, sfDir, quota).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty)
    val bySource = out.groupBy(_._1)
    // driver recomputation of the expected winners
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    docs.groupBy(_._1).foreach { case (src, members) =>
      val expect = members.sortBy(m => (m._3, m._2)).take(quota).map(_._2).toSeq
      val got = bySource.get(src).map(_.sortBy(_._3).map(_._2).toSeq).getOrElse(Seq())
      assert(got == expect, s"stratum $src")
      assert(bySource(src).map(_._3).sorted.toSeq == (1 to got.length))
    }
  }

  test("sample_stratified is deterministic across runs") {
    def run() = Sampling.sampleStratified(spark, sfDir, 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(run() == run())
  }

  test("sample_fraction: endpoints and reproducible subset") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("source"))
    val n = docs.count()
    assert(Sampling.sampleFraction(docs, 0.0).count() == 0)
    assert(Sampling.sampleFraction(docs, 1.0).count() == n)
    val half = Sampling.sampleFraction(docs, 0.5)
    val k = half.count()
    // md5 is uniform: the 50% cut stays within a generous band
    assert(k > n / 4 && k < 3 * n / 4, s"kept $k of $n")
    // a smaller fraction's subset nests inside a larger one (the cut
    // is a threshold on the same per-doc hash)
    val quarterIds = Sampling.sampleFraction(docs, 0.25)
      .collect().map(_.getLong(0)).toSet
    val halfIds = half.collect().map(_.getLong(0)).toSet
    assert(quarterIds.subsetOf(halfIds))
  }
}
