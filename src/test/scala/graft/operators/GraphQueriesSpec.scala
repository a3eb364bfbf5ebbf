package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Reference vectors for the remaining GraphStore read surface:
  * find_path (ladybug_store/tests.rs:545-760 conformance suite — the
  * backend-agnostic contract both stores must satisfy), stats
  * (query_tests.rs:230-265), and prune_orphans' selection set
  * (query_tests.rs test_prune_orphans). */
class GraphQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val T = "tenant"

  private def probesDf(rows: Seq[(String, String, String, String)]): DataFrame =
    rows.toDF("probe_id", "tenant_id", "source_id", "target_id")

  private def edgesDf(rows: Seq[(String, String, String, String)]): DataFrame =
    rows.toDF("tenant_id", "src_node_id", "dst_node_id", "edge_type")

  private def nodesDf(rows: Seq[(String, String, String, String, String)]): DataFrame =
    rows.toDF("tenant_id", "node_id", "symbol_name", "symbol_type", "file_path")

  private val chain4Nodes = nodesDf(Seq(
    (T, "a", "alpha", "function", "a.rs"), (T, "b", "beta", "function", "b.rs"),
    (T, "c", "gamma", "function", "c.rs"), (T, "d", "delta", "function", "d.rs")))
  private val chain4Edges = edgesDf(Seq(
    (T, "a", "b", "CALLS"), (T, "b", "c", "CALLS"), (T, "c", "d", "CALLS")))

  private def path(probes: Seq[(String, String, String, String)],
                   edges: DataFrame = chain4Edges, nodes: DataFrame = chain4Nodes,
                   maxDepth: Int = 5, types: Seq[String] = Seq.empty) =
    GraphQueries.findPathOf(probesDf(probes), edges, nodes, maxDepth, types)
      .orderBy("probe_id", "hop")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3), r.getDouble(7)))
    // (hop, node_id, symbol_name, edge_confidence)

  // tests.rs test_find_path_2hop
  test("find_path: 2-hop path returns [A,B,C] at depths 0,1,2") {
    val out = path(Seq(("p", T, "a", "c")))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((0, "a"), (1, "b"), (2, "c")))
    assert(out.map(_._3).toSeq === Seq("alpha", "beta", "gamma"))
    assert(out.forall(_._4 == 1.0), "edge_confidence sentinel must be 1.0")
  }

  // tests.rs test_find_path_3hop
  test("find_path: 3-hop path returns all four nodes in order") {
    val out = path(Seq(("p", T, "a", "d")))
    assert(out.map(t => (t._1, t._2)).toSeq ===
      Seq((0, "a"), (1, "b"), (2, "c"), (3, "d")))
  }

  // tests.rs test_find_path_no_path
  test("find_path: disconnected nodes emit no rows") {
    val nodes = nodesDf(Seq((T, "a", "alpha", "function", "a.rs"),
      (T, "b", "beta", "function", "b.rs")))
    assert(path(Seq(("p", T, "a", "b")), edges = edgesDf(Seq.empty), nodes = nodes).isEmpty)
  }

  // tests.rs test_find_path_self
  test("find_path: self-path is the single seed node at depth 0") {
    val out = path(Seq(("p", T, "a", "a")))
    assert(out.toSeq === Seq((0, "a", "alpha", 1.0)))
  }

  // tests.rs test_find_path_edge_type_filter_excludes / _allows
  test("find_path: edge-type filter excludes or admits the path") {
    val edges = edgesDf(Seq((T, "a", "b", "USES_TYPE")))
    assert(path(Seq(("p", T, "a", "b")), edges = edges, types = Seq("CALLS")).isEmpty)
    val allowed = path(Seq(("p", T, "a", "c")), types = Seq("CALLS"))
    assert(allowed.map(_._2).toSeq === Seq("a", "b", "c"))
  }

  // sqlite_store.rs:456 WHERE bfs.depth < max_depth — the budget is a
  // hop count, and a too-small budget yields None
  test("find_path: max_depth bounds the search") {
    assert(path(Seq(("p", T, "a", "d")), maxDepth = 2).isEmpty)
    assert(path(Seq(("p", T, "a", "d")), maxDepth = 3).nonEmpty)
  }

  test("find_path: shortest path wins over a longer alternative") {
    val edges = edgesDf(Seq((T, "a", "b", "CALLS"), (T, "b", "d", "CALLS"),
      (T, "a", "d", "CALLS")))
    val out = path(Seq(("p", T, "a", "d")), edges = edges)
    assert(out.map(_._2).toSeq === Seq("a", "d"))
  }

  // tenant scoping: edges of another tenant are invisible
  test("find_path: traversal never crosses tenants") {
    val edges = edgesDf(Seq(("other", "a", "b", "CALLS")))
    val nodes = nodesDf(Seq((T, "a", "alpha", "function", "a.rs"),
      (T, "b", "beta", "function", "b.rs"),
      ("other", "a", "alpha", "function", "a.rs"),
      ("other", "b", "beta", "function", "b.rs")))
    assert(path(Seq(("p", T, "a", "b")), edges = edges, nodes = nodes).isEmpty)
  }

  private def stats(nodes: DataFrame, edges: DataFrame): Map[(Int, String, String, String), Long] =
    GraphQueries.graphStatsOf(nodes, edges).collect()
      .map(r => (r.getInt(0), r.getString(1),
        Option(r.getString(2)).getOrElse("-"), Option(r.getString(3)).getOrElse("-")) ->
        r.getLong(4)).toMap

  // query_tests.rs test_stats_by_type + test_stats_empty
  test("graph_stats: node counts by type and per-tenant totals") {
    val nodes = nodesDf(Seq((T, "a", "a", "function", "a.rs"),
      (T, "b", "b", "function", "b.rs"), (T, "c", "C", "struct", "c.rs")))
    val out = stats(nodes, edgesDf(Seq.empty))
    assert(out((0, "node", T, "function")) === 2L)
    assert(out((0, "node", T, "struct")) === 1L)
    assert(out((1, "node", T, "-")) === 3L) // stats(Some(T)).total_nodes
    assert(stats(nodesDf(Seq.empty), edgesDf(Seq.empty)).isEmpty)
  }

  // query_tests.rs test_stats_all_tenants
  test("graph_stats: cross-tenant grand total") {
    val nodes = nodesDf(Seq(("tenant-a", "a", "x", "function", "a.rs"),
      ("tenant-b", "b", "y", "function", "b.rs")))
    val out = stats(nodes, edgesDf(Seq((T, "a", "b", "CALLS"))))
    assert(out((3, "node", "-", "-")) === 2L) // stats(None).total_nodes
    assert(out((3, "edge", "-", "-")) === 1L)
    assert(out((2, "node", "-", "function")) === 2L)
  }

  // query_tests.rs test_prune_orphans
  test("graph_orphans: a node with no incident edge is selected") {
    val nodes = nodesDf(Seq((T, "a", "a", "function", "a.rs"),
      (T, "b", "b", "function", "b.rs"), (T, "orphan", "o", "function", "c.rs")))
    val edges = edgesDf(Seq((T, "a", "b", "CALLS")))
    val out = GraphQueries.orphansOf(nodes, edges).collect().map(_.getString(1))
    assert(out.toSeq === Seq("orphan"))
  }

  // orphanhood is tenant-scoped: an edge in ANOTHER tenant does not
  // rescue a node with the same id
  test("graph_orphans: edges of another tenant do not count") {
    val nodes = nodesDf(Seq((T, "a", "a", "function", "a.rs")))
    val edges = edgesDf(Seq(("other", "a", "b", "CALLS")))
    val out = GraphQueries.orphansOf(nodes, edges).collect().map(_.getString(1))
    assert(out.toSeq === Seq("a"))
  }
}
