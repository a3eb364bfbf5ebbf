package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PayloadOpsSpec extends SparkSpec {

  test("payload_filter applies must + match-any semantics on JSON payloads") {
    val rows = PayloadOps.payloadFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("click", "view").contains(r.getString(1)))
      assert((1 to 5).contains(r.getInt(2)))
    }
  }

  test("cross_collection returns at most k per collection, ranked") {
    val rows = PayloadOps.crossCollection(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val ranks = rs.map(_.getInt(2)).sorted.toSeq
      assert(ranks == (1 to ranks.length), s"collection $src")
      assert(ranks.length <= 3)
    }
  }

  test("hapax_terms only contains per-collection df=1 terms") {
    // Schema is (source, term, only_doc); hapax is per-collection, matching
    // the reference's one-lexicon-per-collection eviction.
    val hapax = PayloadOps.hapaxTerms(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(hapax.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
    val df = SparseSearch.termFreq(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    hapax.foreach { st => assert(df(st) == 1L, s"pair $st") }
    df.filter(_._2 == 1L).keys.foreach(st => assert(hapax.contains(st), s"missing $st"))
  }

  test("cooccurrence pairs are ordered and thresholded") {
    val rows = PayloadOps.cooccurrence(spark, sfDir, minCount = 10L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 10L)
    }
  }

  test("rules_select packs rules by priority within the token budget") {
    val rows = PayloadOps.rulesSelect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum_tokens"))
    assert(cums.forall(_ <= 500L))
    assert(cums.toSeq == cums.sorted.toSeq, "cumulative sums increase in selection order")
    val prios = rows.map(_.getAs[Int]("priority")).toSeq
    assert(prios == prios.sorted.reverse, "higher-priority rules selected first")
  }

  test("session_window_agg matches the lag/cumsum sessionize row counts") {
    val sw = PayloadOps.sessionWindowAgg(spark, sfDir).collect()
    val manual = CoreAnalytics.sessionize(spark, sfDir).collect()
    assert(sw.length == manual.length, "same number of sessions")
    val swByUser = sw.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sorted.toSeq)
    val mByUser = manual.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sorted.toSeq)
    assert(swByUser.toMap == mByUser.toMap, "same per-user session sizes")
  }
}
