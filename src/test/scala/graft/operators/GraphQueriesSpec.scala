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

  // ── NarrativeQuery RPC (grpc graph_service/tests.rs narrative_query) ──

  private def nquery(name: String, isConcept: Boolean,
                     edges: DataFrame, nodes: DataFrame,
                     types: Seq[String] = Seq.empty, maxDepth: Int = 2,
                     maxResults: Int = 50, tenant: String = "t1") = {
    val probes = Seq(("p", tenant, name)).toDF("probe_id", "tenant_id", "query_name")
    val seeds = GraphQueries.resolveNarrativeSeeds(probes, nodes, isConcept)
    GraphQueries.narrativeQueryOf(seeds, edges, nodes, maxDepth, maxResults, types)
      .collect().map(r => (r.getString(3), r.getString(4), r.getString(6), r.getInt(7)))
    // (symbol_name, symbol_type, edge_type, depth)
  }

  // tests.rs finds_narrative_nodes_via_symbol
  test("narrative_query: symbol seed finds its docstring via EXPLAINS") {
    val nodes = nodesDf(Seq(("t1", "fn1", "my_func", "function", "src/lib.rs"),
      ("t1", "doc1", "my_func docs", "docstring", "src/lib.rs")))
    val edges = edgesDf(Seq(("t1", "fn1", "doc1", "EXPLAINS")))
    val out = nquery("my_func", isConcept = false, edges, nodes)
    assert(out.toSeq === Seq(("my_func docs", "docstring", "EXPLAINS", 1)))
  }

  // tests.rs finds_narrative_nodes_via_concept_incoming_edges / _outgoing
  test("narrative_query: concept seed reaches docs via incoming AND outgoing edges") {
    val nodes = nodesDf(Seq(("", "c1", "error_handling", "concept_node", "global"),
      ("t1", "d1", "Error Handling Guide", "document_section", "docs/errors.md")))
    val incoming = edgesDf(Seq(("t1", "d1", "c1", "COVERS_TOPIC")))
    val outI = nquery("error_handling", isConcept = true, incoming, nodes)
    assert(outI.toSeq === Seq(("Error Handling Guide", "document_section", "COVERS_TOPIC", 1)))
    val outgoing = edgesDf(Seq(("t1", "c1", "d1", "COVERS_TOPIC")))
    val outO = nquery("error_handling", isConcept = true, outgoing, nodes)
    assert(outO.toSeq === Seq(("Error Handling Guide", "document_section", "COVERS_TOPIC", 1)))
  }

  // tests.rs cycle_does_not_produce_duplicates
  test("narrative_query: a cycle yields each narrative node exactly once") {
    val nodes = nodesDf(Seq(("t1", "a", "func_a", "function", "src/lib.rs"),
      ("t1", "b", "section_b", "document_section", "docs/b.md"),
      ("t1", "c", "section_c", "document_section", "docs/c.md")))
    val edges = edgesDf(Seq(("t1", "a", "b", "EXPLAINS"),
      ("t1", "b", "c", "EXPLAINS"), ("t1", "c", "a", "EXPLAINS")))
    val out = nquery("func_a", isConcept = false, edges, nodes, maxDepth = 5)
    assert(out.map(_._1).sorted.toSeq === Seq("section_b", "section_c"))
  }

  // tests.rs filters_by_edge_type
  test("narrative_query: edge-type filter keeps only matching narrators") {
    val nodes = nodesDf(Seq(("t1", "fn1", "filter_fn", "function", "src/lib.rs"),
      ("t1", "d1", "filter_fn doc", "docstring", "src/lib.rs"),
      ("t1", "cm1", "filter_fn comment", "code_comment", "src/lib.rs")))
    val edges = edgesDf(Seq(("t1", "fn1", "d1", "EXPLAINS"),
      ("t1", "fn1", "cm1", "DESCRIBES")))
    val out = nquery("filter_fn", isConcept = false, edges, nodes,
      types = Seq("EXPLAINS"))
    assert(out.toSeq === Seq(("filter_fn doc", "docstring", "EXPLAINS", 1)))
  }

  // tests.rs respects_max_results_limit + empty_graph_returns_zero_results
  test("narrative_query: max_results caps output; unknown seed yields nothing") {
    val nodes = nodesDf(Seq(("t1", "fn1", "limited_fn", "function", "src/lib.rs"),
      ("t1", "d1", "doc_a", "docstring", "a.rs"),
      ("t1", "d2", "doc_b", "docstring", "b.rs"),
      ("t1", "d3", "doc_c", "docstring", "c.rs")))
    val edges = edgesDf(Seq(("t1", "fn1", "d1", "EXPLAINS"),
      ("t1", "fn1", "d2", "EXPLAINS"), ("t1", "fn1", "d3", "EXPLAINS")))
    assert(nquery("limited_fn", isConcept = false, edges, nodes,
      maxResults = 2).length === 2)
    assert(nquery("nonexistent", isConcept = false, edges, nodes).isEmpty)
  }

  // narrative_query.rs:90: hop-1 arms exclude the probe's own seed set
  // as targets — a second seed node of the same name is never returned
  // even when narrative-typed (concept-mode self pairs)
  test("narrative_query: seed nodes are excluded from hop-1 results") {
    val nodes = nodesDf(Seq(("", "c1", "dup", "concept_node", "g1"),
      ("", "c2", "dup", "concept_node", "g2"),
      ("t1", "d1", "doc", "document_section", "d.md")))
    val edges = edgesDf(Seq(("t1", "c1", "c2", "RELATES"),
      ("t1", "c1", "d1", "COVERS_TOPIC")))
    val out = nquery("dup", isConcept = true, edges, nodes, maxDepth = 1)
    // c2 is a seed itself -> excluded; only the doc arrives
    assert(out.map(_._1).toSeq === Seq("doc"))
  }
}
