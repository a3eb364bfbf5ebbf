package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with admin/perf_queries.rs: nearest-rank percentiles, the
  * std-error guard, the tenant display-name map, and the '(unknown)'
  * empty-group rendering.
  */
class PerfStatsSpec extends SparkSpec {

  import spark.implicits._

  private def stats(durations: Seq[Long]) = {
    val t = durations.map(d => ("t1", "p", d)).toDF("tenant_id", "phase", "duration_ms")
    val names = Seq.empty[(String, String)].toDF("map_tenant", "display_name")
    PerfStats.groupedStatsOf(t, Seq("phase" -> "phase"), names).collect().head
  }

  test("nearest-rank percentiles: round-half-away index, clamped (perf_queries.rs:390)") {
    val r = stats(Seq(1L, 2L, 3L, 4L))
    // p50: round(0.5*3)=2 → sorted[2]=3 (half rounds away from zero)
    assert(r.getAs[Double]("p50_ms") == 3.0)
    assert(r.getAs[Double]("p95_ms") == 4.0)
    assert(r.getAs[Double]("p99_ms") == 4.0)
    val one = stats(Seq(7L))
    assert(one.getAs[Double]("p50_ms") == 7.0 && one.getAs[Double]("std_err") == 0.0)
  }

  test("std error is sample stddev over sqrt(n); zero under two samples") {
    val r = stats(Seq(1L, 2L, 3L))
    assert(math.abs(r.getAs[Double]("std_err") - 1.0 / math.sqrt(3.0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("avg_ms") - 2.0) < 1e-9)
  }

  test("tenant name map: basename, trailing slash, collisions, scope filters") {
    val folders = Seq(
      ("t1", "/work/alpha", null, "projects"),        // collides with t2
      ("t2", "/work/sub/alpha", null, "projects"),    // → "alpha (t2)"
      ("t3", "/work/beta/", null, "projects"),        // trailing slash → beta
      ("t4", "///", null, "projects"),                // no segment → tenant_id
      ("t5", "/work/gamma", "parent", "projects"),    // sub-watch excluded
      ("t6", "/work/delta", null, "libraries")        // non-projects excluded
    ).toDF("tenant_id", "path", "parent_watch_id", "collection")
    val m = PerfStats.tenantNamesOf(folders).collect()
      .map(r => r.getAs[String]("map_tenant") -> r.getAs[String]("display_name")).toMap
    assert(m("t1") == "alpha (t1)" && m("t2") == "alpha (t2)")
    assert(m("t3") == "beta")
    assert(m("t4") == "t4")
    assert(!m.contains("t5") && !m.contains("t6"))
  }

  test("project dimension resolves display names; empty groups render (unknown)") {
    val t = Seq(
      ("t1", null: String, 5L), ("t1", "index", 6L)
    ).toDF("tenant_id", "language", "duration_ms")
    val names = Seq(("t1", "myproj")).toDF("map_tenant", "display_name")
    val out = PerfStats.groupedStatsOf(t,
      Seq("project" -> "tenant_id", "language" -> "language"), names)
      .collect().map(r => (r.getAs[String]("dim"), r.getAs[String]("group_key"))).toSet
    assert(out.contains(("project", "myproj")))
    assert(out.contains(("language", "(unknown)")))
    assert(out.contains(("language", "index")))
  }

  test("corpus queries: all dimensions present, unknown arm live, nesting non-empty") {
    val ps = PerfStats.perfStats(spark, sfDir).collect()
    assert(ps.map(_.getAs[String]("dim")).toSet ==
      Set("project", "phase", "language", "op"))
    assert(ps.exists(_.getAs[String]("group_key") == "(unknown)"))
    assert(ps.exists(_.getAs[String]("group_key").contains("(src")),
      "colliding basenames carry the (tenant) suffix")
    val p2 = PerfStats.perfStats2d(spark, sfDir).collect()
    assert(p2.map(_.getAs[String]("group1_key")).toSet ==
      Set("projects", "libraries"))
    p2.foreach { r =>
      assert(r.getAs[Double]("p50_ms") <= r.getAs[Double]("p95_ms"))
      assert(r.getAs[Double]("p95_ms") <= r.getAs[Double]("p99_ms"))
    }
  }
}
