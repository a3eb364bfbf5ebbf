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

    var frontier = probes.select(col("probe_id"), col("tenant_id"),
      col("target_id"), col("source_id").as("node_id"),
      lit(0).as("depth"), col("source_id").as("path"))
    var acc = frontier
    for (d <- 1 to maxDepth) {
      val f = frontier.as("f")
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
    // inner node join drops unresolvable ids without renumbering
    win.select(col("probe_id"), col("tenant_id"),
        posexplode(split(col("path"), ",")).as(Seq("hop", "node_id")))
      .join(nodes, Seq("tenant_id", "node_id"))
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
}
