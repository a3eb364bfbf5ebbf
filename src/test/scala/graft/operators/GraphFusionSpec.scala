package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference vectors for the graph-augmented search passes:
  * graph_fusion_tests.rs (all six), the graph_context.rs eligibility
  * divergences, and impact_analysis's stable-sort + dedup contract —
  * plus cap/break interplay cases the reference exercises only
  * implicitly. */
class GraphFusionSpec extends SparkSpec {
  import spark.implicits._

  private def resultsDf(rows: Seq[(String, Double, Int, String, String, String, String, String)]): DataFrame =
    rows.toDF("id", "score", "rnk", "tenant_id", "relative_path", "file_path",
      "symbol_name", "chunk_type")

  private def edgesDf(rows: Seq[(String, String, String, String)]): DataFrame =
    rows.toDF("tenant_id", "src_node_id", "dst_node_id", "edge_type")

  private def nodesDf(rows: Seq[(String, String, String, String, String)]): DataFrame =
    rows.toDF("tenant_id", "node_id", "symbol_name", "symbol_type", "file_path")

  private val emptyEdges = edgesDf(Seq.empty)
  private val emptyNodes = nodesDf(Seq.empty)

  private def nid(t: String, f: String, s: String, c: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"$t|$f|$s|$c".getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.take(32)
  }

  private def fuse(results: DataFrame, edges: DataFrame, nodes: DataFrame): Map[String, (Int, Double, String)] =
    GraphFusion.fuseWithGraphOf(results, edges, nodes,
        edgeTypes = Seq("CALLS", "USES_TYPE", "CONTAINS"))
      .collect().map(r => r.getString(1) ->
        ((r.getInt(0), r.getDouble(2), r.getString(3)))).toMap

  // graph_fusion_tests.rs: no_code_candidates_is_noop
  test("fusion: non-code chunk type produces no candidates, results untouched") {
    val res = resultsDf(Seq(("v1", 0.9, 1, "t", "README.md", "README.md", "readme", "text")))
    val out = fuse(res, emptyEdges, emptyNodes)
    assert(out.size === 1)
    assert(out("v1")._2 === 0.9) // no alpha scaling
  }

  // graph_fusion_tests.rs: candidates_but_no_expansion_still_alpha_scales
  test("fusion: candidate with no expansion still alpha-scales originals") {
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "foo", "function")))
    val out = fuse(res, emptyEdges, emptyNodes)
    assert(out("v1")._2 === 0.7)
  }

  // graph_fusion_tests.rs: expansion_adds_nodes_and_fuses_scores
  test("fusion: expansion adds nodes at (1-alpha)*proximity, sorted") {
    val seed = nid("t", "src/a.rs", "foo", "function")
    val edges = edgesDf(Seq(
      ("t", seed, "expanded_1", "CALLS"),
      ("t", "expanded_1", "expanded_2", "CALLS")))
    val nodes = nodesDf(Seq(
      ("t", "expanded_1", "bar", "function", "src/other.rs"),
      ("t", "expanded_2", "baz", "function", "src/other.rs")))
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "foo", "function")))
    val out = fuse(res, edges, nodes)
    assert(out.size === 3)
    assert(out("v1") === ((1, 0.7, "vector")))
    assert(out("expanded_1") === ((2, 0.24, "graph_expansion"))) // 0.3*0.8
    assert(out("expanded_2") === ((3, 0.15, "graph_expansion"))) // 0.3*0.5
  }

  // graph_fusion_tests.rs: convergence_bonus_applies_to_existing_vector_result
  test("fusion: convergence bonus lands BEFORE alpha scaling") {
    val seed = nid("t", "src/a.rs", "foo", "function")
    val edges = edgesDf(Seq(("t", seed, "v2_id", "CALLS")))
    val nodes = nodesDf(Seq(("t", "v2_id", "bar", "function", "src/b.rs")))
    val res = resultsDf(Seq(
      ("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "foo", "function"),
      ("v2_id", 0.5, 2, "t", "src/b.rs", "src/b.rs", "bar", "function")))
    val out = fuse(res, edges, nodes)
    assert(out.size === 2)
    assert(math.abs(out("v2_id")._2 - 0.42) < 1e-9) // (0.5+0.1)*0.7
    assert(out("v1")._2 === 0.7)
  }

  // graph_fusion_tests.rs: self_node_skipped_and_per_result_cap_enforced
  test("fusion: self node consumes one of the 5 sliced slots") {
    val seed = nid("t", "src/a.rs", "foo", "function")
    // self-cycle orders FIRST in the response (symbol 'foo' < 'sym')
    val edges = edgesDf(
      ("t", seed, seed, "CALLS") +:
      (0 until 7).map(i => ("t", seed, s"n$i", "CALLS")))
    val nodes = nodesDf(
      ("t", seed, "foo", "function", "src/a.rs") +:
      (0 until 7).map(i => ("t", s"n$i", "sym", "function", "src/other.rs")))
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "foo", "function")))
    val out = fuse(res, edges, nodes)
    val expanded = out.filter(_._2._3 == "graph_expansion")
    assert(expanded.size === 4, "self node consumes one sliced slot")
    assert(!out.contains(seed))
    assert(expanded.keySet === Set("n0", "n1", "n2", "n3"))
  }

  // graph_fusion_tests.rs: empty_relative_path_does_not_fall_back_to_file_path
  test("fusion: empty relative_path is nullish-taken, row skipped, no scaling") {
    val fallback = nid("t", "src/a.rs", "foo", "function")
    val edges = edgesDf(Seq(("t", fallback, "expanded_1", "CALLS")))
    val nodes = nodesDf(Seq(("t", "expanded_1", "bar", "function", "src/other.rs")))
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "", "src/a.rs", "foo", "function")))
    val out = fuse(res, edges, nodes)
    assert(out.size === 1)
    assert(out("v1")._2 === 1.0) // candidates empty -> scores untouched
  }

  test("fusion: 50-node total cap; post-cap duplicates bonus until first new node breaks") {
    // candidates r01..r10 contribute 5 distinct nodes each = exactly 50.
    // candidate r11's response then reads: [dup of original r12] -> bonus,
    // [new node z1] -> break, [dup of original r10] -> never examined.
    val t = "t"
    def rid(i: Int) = f"r$i%02d"
    def rpath(i: Int) = s"src/r$i.rs"
    val results = (1 to 12).map(i =>
      (rid(i), 1.0 - 0.01 * i, i, t, rpath(i), rpath(i), s"sym$i", "function"))
    val fill = (1 to 10).flatMap { i =>
      val seed = nid(t, rpath(i), s"sym$i", "function")
      (0 until 5).map(j => (t, seed, f"x$i%02d$j", "CALLS"))
    }
    val c11 = nid(t, rpath(11), "sym11", "function")
    val edges = edgesDf(fill ++ Seq(
      (t, c11, "r12", "CALLS"), (t, c11, "z1", "CALLS"), (t, c11, "r10", "CALLS")))
    val nodes = nodesDf(
      fill.map(e => (t, e._3, "fill", "function", "f.rs")) ++ Seq(
        (t, "r12", "aaa", "function", "f.rs"),   // orders first
        (t, "z1", "bbb", "function", "f.rs"),    // then the new node
        (t, "r10", "ccc", "function", "f.rs")))  // never examined
    val out = fuse(resultsDf(results), edges, nodes)
    val expanded = out.filter(_._2._3 == "graph_expansion")
    assert(expanded.size === 50, "total cap")
    assert(!expanded.contains("z1"), "new node past the cap never added")
    assert(math.abs(out("r12")._2 - (1.0 - 0.12 + 0.1) * 0.7) < 1e-9,
      "post-cap duplicate still bonuses")
    assert(math.abs(out("r10")._2 - (1.0 - 0.10) * 0.7) < 1e-9,
      "duplicate after the break is never examined")
  }

  test("fusion: stable sort keeps insertion order on score ties") {
    // two expanded nodes from the same depth tie at 0.24 — insertion
    // (add) order must decide, as Rust's stable sort does
    val seed = nid("t", "src/a.rs", "foo", "function")
    val edges = edgesDf(Seq(("t", seed, "e1", "CALLS"), ("t", seed, "e2", "CALLS")))
    val nodes = nodesDf(Seq(
      ("t", "e1", "zz", "function", "f.rs"),
      ("t", "e2", "am", "function", "f.rs")))
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "foo", "function")))
    val ranked = GraphFusion.fuseWithGraphOf(resultsDf(
        Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "foo", "function"))),
        edges, nodes, edgeTypes = Seq("CALLS"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    // response order is symbol-name asc: e2('am') examined before e1('zz')
    assert(ranked.toSeq === Seq((1, "v1"), (2, "e2"), (3, "e1")))
  }

  // ── graph_context ────────────────────────────────────────────────────

  test("context: plain Option-or uses a present-but-empty relative_path") {
    // graph_context.rs has NO JS-falsy skip: relative_path "" is used
    // verbatim in the node id (divergence from the fusion pass)
    val seedEmpty = nid("t", "", "foo", "function")
    val edges = edgesDf(Seq(("t", seedEmpty, "c1", "CALLS")))
    val nodes = nodesDf(Seq(("t", "c1", "callee", "function", "src/c.rs")))
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "", "src/a.rs", "foo", "function")))
    val out = GraphFusion.graphContextOf(res, edges, nodes).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("rel_symbol") === "callee")
    assert(out.head.getAs[String]("direction") === "callees")
  }

  test("context: CONTAINS classifies as callers, others as callees; self skipped") {
    val seed = nid("t", "src/a.rs", "Widget", "class")
    val edges = edgesDf(Seq(
      ("t", seed, seed, "CALLS"),           // self — skipped
      ("t", seed, "m1", "CONTAINS"),
      ("t", seed, "m2", "CONTAINS"),
      ("t", seed, "u1", "USES_TYPE")))
    val nodes = nodesDf(Seq(
      ("t", seed, "Widget", "class", "src/a.rs"),
      ("t", "m1", "draw", "method", "src/a.rs"),
      ("t", "m2", "area", "method", "src/a.rs"),
      ("t", "u1", "Shape", "trait", "src/s.rs")))
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "Widget", "class")))
    val out = GraphFusion.graphContextOf(res, edges, nodes)
      .orderBy(col("direction"), col("ord")).collect()
      .map(r => (r.getAs[String]("direction"), r.getAs[Int]("ord"), r.getAs[String]("rel_symbol")))
    assert(out.toSeq === Seq(
      ("callees", 1, "Shape"),
      // response order is symbol_name asc: area before draw
      ("callers", 1, "area"), ("callers", 2, "draw")))
  }

  test("context: wide type set admits constant; scores and membership never change") {
    val res = resultsDf(Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "MAX", "constant")))
    // eligible (constant is in the wide set) but empty graph -> no rows
    assert(GraphFusion.graphContextOf(res, emptyEdges, emptyNodes).count() === 0)
    val narrow = resultsDf(Seq(("v1", 1.0, 1, "t", "src/a.rs", "src/a.rs", "MAX", "constant")))
    // the fusion pass's NARROW set rejects 'constant' -> no candidates -> untouched
    assert(fuse(narrow, emptyEdges, emptyNodes)("v1")._2 === 1.0)
  }

  // ── impact analysis ──────────────────────────────────────────────────

  private def probesDf(rows: Seq[(String, String, String, Option[String])]): DataFrame =
    rows.map(p => (p._1, p._2, p._3, p._4.orNull))
      .toDF("probe_id", "tenant_id", "symbol_name", "file_path")

  test("impact: stable distance sort across targets with first-occurrence dedup") {
    // symbol 'sym' resolves to T1 and T2; X impacts both at distance 1,
    // Y impacts via X at distance 2 — each node reported ONCE
    val edges = edgesDf(Seq(
      ("t", "X", "T1", "CALLS"), ("t", "X", "T2", "CALLS"), ("t", "Y", "X", "CALLS")))
    val nodes = nodesDf(Seq(
      ("t", "T1", "sym", "function", "f1.rs"), ("t", "T2", "sym", "function", "f2.rs"),
      ("t", "X", "xx", "function", "fx.rs"), ("t", "Y", "yy", "function", "fy.rs")))
    val out = GraphFusion.impactOf(probesDf(Seq(("p", "t", "sym", None))), edges, nodes)
      .orderBy(col("impact_rank")).collect()
      .map(r => (r.getAs[Int]("impact_rank"), r.getAs[String]("node_id"), r.getAs[Int]("distance")))
    assert(out.toSeq === Seq((1, "X", 1), (2, "Y", 2)))
  }

  test("impact: file_path scopes targets; traversal bounded at 3 hops") {
    val edges = edgesDf(Seq(
      ("t", "U", "T1", "CALLS"), ("t", "V", "U", "CALLS"),
      ("t", "W", "V", "CALLS"), ("t", "Z", "W", "CALLS"),
      ("t", "A2", "T2", "CALLS")))
    val nodes = nodesDf(Seq(
      ("t", "T1", "sym", "function", "f1.rs"), ("t", "T2", "sym", "function", "f2.rs"),
      ("t", "U", "u", "function", "f.rs"), ("t", "V", "v", "function", "f.rs"),
      ("t", "W", "w", "function", "f.rs"), ("t", "Z", "z", "function", "f.rs"),
      ("t", "A2", "a2", "function", "f.rs")))
    val out = GraphFusion.impactOf(probesDf(Seq(("p", "t", "sym", Some("f1.rs")))), edges, nodes)
      .collect().map(r => (r.getAs[String]("node_id"), r.getAs[Int]("distance"))).toSet
    // only T1's reverse cone, depth <= 3: U(1), V(2), W(3); Z at 4 excluded,
    // A2 impacts only the out-of-scope T2
    assert(out === Set(("U", 1), ("V", 2), ("W", 3)))
  }

  // ── corpus queries ───────────────────────────────────────────────────

  test("corpus: graph_fusion is deterministic and well-formed") {
    val a = GraphFusion.graphFusion(spark, sfDir).collect()
    val b = GraphFusion.graphFusion(spark, sfDir).collect()
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    val ranks = a.map(_.getInt(0)).toSeq
    assert(ranks === (1 to a.length))
    // originals alpha-scaled: every vector row's score is <= 0.7*(1/61 + k*0.07)
    val sources = a.map(_.getString(3)).toSet
    assert(sources.contains("vector"))
    val expanded = a.filter(_.getString(3) == "graph_expansion")
    assert(expanded.length <= GraphFusion.MaxExpandedTotal)
    assert(expanded.forall(r => !r.isNullAt(4) && r.getInt(4) >= 1 && r.getInt(4) <= 2))
  }

  test("corpus: graph_context exercises both classification branches") {
    val rows = GraphFusion.graphContext(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dirs = rows.map(_.getAs[String]("direction")).toSet
    assert(dirs === Set("callers", "callees"))
    // callers only ever come from file-chunk results (CONTAINS edges)
    val callerIds = rows.filter(_.getAs[String]("direction") == "callers")
      .map(_.getAs[String]("id")).toSet
    assert(callerIds.forall(_.startsWith("file:")))
  }

  test("corpus: graph_impact dedups node_ids per probe with contiguous ranks") {
    val rows = GraphFusion.graphImpact(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getAs[String]("probe_id"))
    byProbe.foreach { case (_, rs) =>
      val ids = rs.map(_.getAs[String]("node_id"))
      assert(ids.distinct.length === ids.length)
      assert(rs.map(_.getAs[Int]("impact_rank")).sorted.toSeq === (1 to rs.length))
      assert(rs.forall(r => r.getAs[Int]("distance") >= 1 && r.getAs[Int]("distance") <= 3))
    }
  }
}
