package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining GraphStore read surface: shortest-path search
  * (sqlite_store.rs:456 find_path, conformance vectors in
  * ladybug_store/tests.rs:545-760), graph stats
  * (sqlite_store.rs:343 stats), and orphan-node detection — the data
  * half of prune_orphans (sqlite_store.rs:440: a node of the tenant
  * appearing as neither edge source nor target).
  *
  * find_path semantics reproduced exactly:
  *  - DIRECTED BFS source→target over tenant-scoped edges, optional
  *    edge-type IN filter, the same literal `INSTR(path, node_id)=0`
  *    substring cycle gate as cross_boundary (ids joined by `,` here);
  *  - the depth-0 seed row participates, so find_path(A, A) returns
  *    the single-node path — and the target must RESOLVE in
  *    graph_nodes under the tenant (the final join), but the SOURCE
  *    need not;
  *  - `ORDER BY depth ASC LIMIT 1` picks one shortest path; SQLite
  *    leaves equal-depth ties unspecified, we totalize with `path`
  *    asc — a documented deterministic refinement (same policy as
  *    queryRelatedOf / impactOf);
  *  - the winning path is re-joined node-by-node tenant-scoped,
  *    SILENTLY skipping ids that no longer resolve while KEEPING the
  *    original hop ordinals (the reference's enumerate-then-skip
  *    loop), sentinel fields edge_type=''/conf 1.0.
  *
  * Scale: probes are a bounded axis, so each hop is one broadcast
  * join of the frontier against the corpus-shaped edge table —
  * shuffle ∝ reachable paths, never corpus². Stats is one
  * CUBE-grouped count over nodes ∪ edges (a single shuffle); orphan
  * detection is one left-anti join against the distinct edge
  * endpoints, both map-side combinable.
  */
object GraphQueries {

  /** find_path over a probe frame (probe_id, tenant_id, source_id,
    * target_id). Returns one row per hop of each probe's winning path:
    * (probe_id, hop, node_id, symbol_name, symbol_type, file_path,
    *  tenant_id, edge_confidence); probes with no path emit no rows.
    */
  def findPathOf(probes: DataFrame, edges: DataFrame, nodes: DataFrame,
                 maxDepth: Int, edgeTypes: Seq[String] = Seq.empty): DataFrame = {
    val e = (if (edgeTypes.nonEmpty)
               edges.filter(col("edge_type").isin(edgeTypes: _*))
             else edges)
      .select(col("tenant_id"), col("src_node_id"), col("dst_node_id"))
    val nodeKeys = nodes.select(col("tenant_id"), col("node_id"))

    // Early termination, exact: `ORDER BY depth LIMIT 1` means a probe
    // whose target is already reached (and resolves tenant-scoped) can
    // never be won by a DEEPER path — expanding it further only
    // enumerates losers. Each hop therefore drops finished probes from
    // the frontier before joining. This is what bounds the all-paths
    // blow-up (unpruned, hop 4 on the sf0.1 EXPLAINS graph is 36.6M
    // path rows; pruned, the frontier collapses once targets resolve).
    // Frontiers are localCheckpoint'd per hop: the done-set feedback
    // would otherwise nest each hop's plan inside the next
    // (exponential lineage), and BFS frontiers are the same
    // truncation point pagerank uses.
    var frontier = probes.select(col("probe_id"), col("tenant_id"),
      col("target_id"), col("source_id").as("node_id"),
      lit(0).as("depth"), col("source_id").as("path"))
    var acc = frontier
    for (d <- 1 to maxDepth) {
      val done = acc.filter(col("node_id") === col("target_id"))
        .join(nodeKeys, Seq("tenant_id", "node_id"))
        .select(col("probe_id")).distinct()
      val f = frontier.join(broadcast(done), Seq("probe_id"), "left_anti")
        .localCheckpoint().as("f")
      frontier = broadcast(f).join(e.as("e"),
          col("f.tenant_id") === col("e.tenant_id") &&
            col("e.src_node_id") === col("f.node_id"))
        // the reference's INSTR substring cycle gate on the ','-path
        .filter(!col("f.path").contains(col("e.dst_node_id")))
        .select(col("f.probe_id").as("probe_id"),
          col("f.tenant_id").as("tenant_id"),
          col("f.target_id").as("target_id"),
          col("e.dst_node_id").as("node_id"), lit(d).as("depth"),
          concat(col("f.path"), lit(","), col("e.dst_node_id")).as("path"))
        .localCheckpoint()
      acc = acc.unionByName(frontier)
    }

    // rows reaching the target; the target must resolve tenant-scoped
    val win = acc.filter(col("node_id") === col("target_id"))
      .join(nodeKeys, Seq("tenant_id", "node_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("depth"), col("path"))))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("tenant_id"), col("path"))

    // enumerate-then-skip: hop ordinals from the ORIGINAL path, the
    // inner node join drops unresolvable ids without renumbering. The
    // exploded winner set is one path per probe (bounded) → broadcast
    // it past the corpus-sized node table, never the reverse.
    val hops = win.select(col("probe_id"), col("tenant_id"),
      posexplode(split(col("path"), ",")).as(Seq("hop", "node_id")))
    nodes.join(broadcast(hops), Seq("tenant_id", "node_id"))
      .select(col("probe_id"), col("hop"), col("node_id"),
        col("symbol_name"), col("symbol_type"), col("file_path"),
        col("tenant_id"), lit(1.0).as("edge_confidence"))
  }

  /** stats (sqlite_store.rs:343): node counts by symbol_type + edge
    * counts by edge_type. One CUBE over (tenant_id, type_name) per
    * kind covers all four reference scoping modes in a single pass:
    * lvl 0 = (tenant, type) detail, lvl 1 = per-tenant totals
    * (`stats(Some(t))`), lvl 2 = cross-tenant by-type, lvl 3 = grand
    * totals (`stats(None)`). Branch scoping is an input filter the
    * corpus does not carry (documented).
    */
  def graphStatsOf(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val rows = nodes
      .select(col("tenant_id"), lit("node").as("kind"),
        col("symbol_type").as("type_name"))
      .unionByName(edges.select(col("tenant_id"), lit("edge").as("kind"),
        col("edge_type").as("type_name")))
    rows.cube(col("kind"), col("tenant_id"), col("type_name"))
      .agg(count(lit(1)).as("cnt"),
        (grouping(col("tenant_id")) * 2 + grouping(col("type_name")))
          .cast("int").as("lvl"),
        grouping(col("kind")).as("kgrp"))
      .filter(col("kgrp") === 0) // kind is never rolled up
      .select(col("lvl"), col("kind"), col("tenant_id"), col("type_name"), col("cnt"))
  }

  /** prune_orphans' selection set (sqlite_store.rs:440): tenant nodes
    * appearing as neither source nor target of any of the SAME
    * tenant's edges. */
  def orphansOf(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val endpoints = edges
      .select(col("tenant_id"), col("src_node_id").as("node_id"))
      .unionByName(edges.select(col("tenant_id"), col("dst_node_id").as("node_id")))
      .distinct()
    nodes.join(endpoints, Seq("tenant_id", "node_id"), "left_anti")
      .select(col("tenant_id"), col("node_id"), col("symbol_name"),
        col("symbol_type"), col("file_path"))
  }

  /** find_path query: per tenant, the shortest DIRECTED path from the
    * `window` symbol node to the `batch` symbol node over the symmetric
    * EXPLAINS graph (window → explaining section → co-explained
    * symbol), depth ≤ 4. Tenants with no co-explaining section emit no
    * rows — the reference's `None`. */
  def findPath(spark: SparkSession, dir: String,
               source: String = "window", target: String = "batch"): DataFrame = {
    val (edges, nodes) = GraphFusion.explainsGraph(spark, dir)
    val probes = Tables.documents(spark, dir)
      .select(col("source").as("tenant_id")).distinct()
      .select(col("tenant_id").as("probe_id"), col("tenant_id"),
        concat(lit("node:"), col("tenant_id"), lit("/f0.rs:"), lit(source))
          .as("source_id"),
        concat(lit("node:"), col("tenant_id"), lit("/f0.rs:"), lit(target))
          .as("target_id"))
    findPathOf(probes, edges, nodes, maxDepth = 4)
      .orderBy(col("probe_id"), col("hop"))
  }

  /** graph_stats query: the four-scope CUBE over the symmetric
    * EXPLAINS graph's nodes and edges. */
  def graphStats(spark: SparkSession, dir: String): DataFrame = {
    val (edges, nodes) = GraphFusion.explainsGraph(spark, dir)
    graphStatsOf(nodes, edges)
      .orderBy(col("lvl"), col("kind"), col("tenant_id"), col("type_name"))
  }

  /** graph_orphans query: unreferenced nodes of the EXPLAINS graph —
    * symbols no section resolves to (ambiguous `hash`/`join`, the
    * never-matching `windo` prefix, sub-floor names) and sections
    * that explain nothing. */
  def graphOrphans(spark: SparkSession, dir: String): DataFrame = {
    val (edges, nodes) = GraphFusion.explainsGraph(spark, dir)
    orphansOf(nodes, edges)
      .orderBy(col("tenant_id"), col("node_id"))
  }

  // ── NarrativeQuery RPC (grpc graph_service/narrative_query.rs) ────────

  /** The five narrative node types the RPC returns
    * (narrative_query.rs:15 NARRATIVE_TYPES). */
  val NarrativeTypes: Seq[String] = Seq(
    "document_section", "code_comment", "docstring", "library_section",
    "concept_node")

  /** find_seed_nodes (narrative_query.rs:188): symbol queries resolve
    * (tenant, name) over NON-narrative node types; concept queries
    * resolve the name GLOBALLY over concept_node. The reference's bare
    * `LIMIT 100` has no ORDER BY — totalized by node_id asc, a
    * documented refinement. */
  def resolveNarrativeSeeds(probes: DataFrame, nodes: DataFrame,
                            isConcept: Boolean): DataFrame = {
    val matched =
      if (isConcept)
        probes.select(col("probe_id"), col("tenant_id").as("probe_tenant"),
            col("query_name"))
          .join(nodes.filter(col("symbol_type") === "concept_node"),
            col("query_name") === col("symbol_name"))
      else
        probes.select(col("probe_id"), col("tenant_id").as("probe_tenant"),
            col("query_name"))
          .join(nodes.filter(!col("symbol_type").isin(NarrativeTypes: _*)),
            col("query_name") === col("symbol_name") &&
              col("probe_tenant") === col("tenant_id"))
    matched
      .withColumn("srank", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("node_id"))))
      .filter(col("srank") <= 100)
      .select(col("probe_id"), col("probe_tenant").as("tenant_id"), col("node_id"))
  }

  /** execute_narrative_query's traversal (narrative_query.rs:38):
    * bidirectional expansion whose four CTE arms collapse to TWO over a
    * direction-annotated symmetrized adjacency (` -> ` forward,
    * ` <- ` backward); hop-1 rows exclude the probe's OWN seed set as
    * targets; cycle prevention is the `|`-delimited EXACT-id visited
    * check (INSTR on `|id|` — deliberately unlike cross_boundary's raw
    * substring quirk); edges are tenant-scoped, the node attribute join
    * is NOT (concept ids are global); output filtered to the five
    * narrative types, one row per node by (depth, edge_type) rank,
    * ordered (depth, symbol_name) and capped at max_results per probe.
    * The reference leaves the rank and order ties unspecified
    * (unordered SELECT) — totalized with path / node_id ascending.
    * `metadata_json` is pass-through edge payload the corpus does not
    * carry; omitted.
    *
    * Scale: seeds are a bounded probe axis (≤100 per probe), each hop
    * one broadcast frontier join over the corpus-shaped edge table —
    * the same posture as crossBoundaryOf.
    */
  def narrativeQueryOf(seeds: DataFrame, edges: DataFrame, nodes: DataFrame,
                       maxDepth: Int, maxResults: Int,
                       edgeTypes: Seq[String] = Seq.empty): DataFrame = {
    val e = (if (edgeTypes.nonEmpty)
               edges.filter(col("edge_type").isin(edgeTypes: _*))
             else edges)
      .select(col("tenant_id"), col("src_node_id"), col("dst_node_id"),
        col("edge_type"))
    val adj = e.select(col("tenant_id"), col("src_node_id").as("from_id"),
        col("dst_node_id").as("to_id"), col("edge_type"), lit(" -> ").as("dir"))
      .unionByName(e.select(col("tenant_id"), col("dst_node_id").as("from_id"),
        col("src_node_id").as("to_id"), col("edge_type"), lit(" <- ").as("dir")))

    val s = seeds.select(col("probe_id"), col("tenant_id"), col("node_id"))
    val hop1 = broadcast(s.as("s")).join(adj.as("a"),
        col("s.tenant_id") === col("a.tenant_id") &&
          col("a.from_id") === col("s.node_id"))
      .select(col("s.probe_id").as("probe_id"),
        col("s.tenant_id").as("tenant_id"),
        col("a.to_id").as("node_id"), col("a.edge_type").as("edge_type"),
        lit(1).as("depth"),
        concat(col("a.from_id"), col("a.dir"), col("a.to_id")).as("path"),
        concat(lit("|"), col("a.from_id"), lit("|"), col("a.to_id"), lit("|"))
          .as("visited"))
      // hop-1 arms exclude the probe's own seeds as targets
      .join(s.select(col("probe_id"), col("node_id")), Seq("probe_id", "node_id"),
        "left_anti")

    var frontier = hop1
    var acc = hop1
    for (_ <- 2 to maxDepth) {
      val f = frontier.as("f")
      frontier = broadcast(f).join(adj.as("a2"),
          col("f.tenant_id") === col("a2.tenant_id") &&
            col("a2.from_id") === col("f.node_id"))
        .filter(!col("f.visited").contains(
          concat(lit("|"), col("a2.to_id"), lit("|"))))
        .select(col("f.probe_id").as("probe_id"),
          col("f.tenant_id").as("tenant_id"),
          col("a2.to_id").as("node_id"), col("a2.edge_type").as("edge_type"),
          (col("f.depth") + 1).as("depth"),
          concat(col("f.path"), col("a2.dir"), col("a2.to_id")).as("path"),
          concat(col("f.visited"), col("a2.to_id"), lit("|")).as("visited"))
      acc = acc.unionByName(frontier)
    }

    val narrative = acc.join(
        nodes.filter(col("symbol_type").isin(NarrativeTypes: _*))
          .select(col("node_id"), col("symbol_name"), col("symbol_type"),
            col("file_path")),
        Seq("node_id")) // node attribute join is tenant-agnostic
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("probe_id"), col("node_id"))
          .orderBy(col("depth"), col("edge_type"), col("path"))))
      .filter(col("rn") === 1)
    narrative
      .withColumn("nrank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("depth"), col("symbol_name"), col("node_id"))))
      .filter(col("nrank") <= maxResults)
      .select(col("probe_id"), col("nrank"), col("node_id"),
        col("symbol_name"), col("symbol_type"), col("file_path"),
        col("edge_type"), col("depth"), col("path"))
  }

  /** narrative_query: per tenant, the symbol-mode RPC for `window`
    * (is_concept=false) over the EXPLAINS + __global__ concept graph
    * with doc chunks typed `document_section` — 2 hops, 40 results:
    * explaining sections arrive at depth 1, the symbol's concept at
    * depth 1, co-covering sections through the concept at depth 2. */
  def narrativeQuery(spark: SparkSession, dir: String,
                     symbol: String = "window"): DataFrame = {
    val (edges, nodes) = narrativeGraph(spark, dir)
    val probes = Tables.documents(spark, dir)
      .select(col("source").as("tenant_id")).distinct()
      .select(col("tenant_id").as("probe_id"), col("tenant_id"),
        lit(symbol).as("query_name"))
    val seeds = resolveNarrativeSeeds(probes, nodes, isConcept = false)
    narrativeQueryOf(seeds, edges, nodes, maxDepth = 2, maxResults = 40)
      .orderBy(col("probe_id"), col("nrank"))
  }

  /** The narrative-typed corpus graph: the EXPLAINS pairs (doc →
    * symbol, tenant-scoped) plus the deterministic __global__ concept
    * layer, with doc chunks presented as `document_section` — the node
    * type the RPC filter keeps. */
  def narrativeGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    CorpusGraphCache.graphOf(spark, dir, "narrative")(narrativeGraphUncached(spark, dir))

  private def narrativeGraphUncached(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val (exEdges, exNodes) = GraphFusion.explainsGraph(spark, dir)
    val explains = exEdges.filter(col("edge_type") === "EXPLAINS")
      .select(col("tenant_id"), col("src_node_id"), col("dst_node_id"),
        col("edge_type"))
    val (cEdges, cNodes) = CrossBoundary.conceptGraph(spark, dir)
    val edges = explains.unionByName(
      cEdges.select(col("tenant_id"), col("src_node_id"), col("dst_node_id"),
        col("edge_type")))
    val nodes = exNodes
      .withColumn("symbol_type",
        when(col("symbol_type").isin("module", "text"), lit("document_section"))
          .otherwise(col("symbol_type")))
      .unionByName(cNodes).distinct()
    (edges, nodes)
  }
}
