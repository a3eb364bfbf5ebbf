package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph-augmented search: RRF results expanded over the code-relationship
  * graph with score fusion (client/src/search/graph_fusion.rs, GitHub #80),
  * 1-hop context enrichment (client/src/search/graph_context.rs), and
  * impact analysis (graph/sqlite_store.rs:1231 reverse_traverse + mod.rs
  * impact_analysis).
  *
  * The daemon's `query_related` (sqlite_store.rs:238) is a directed
  * source→target recursive expansion bounded by `max_hops`, returning
  * `DISTINCT (node_id, edge_type, depth, path)` rows joined to node
  * attributes, ordered `depth, symbol_name`. We reproduce it as one
  * broadcast-seed join per hop over the corpus-shaped edge table — the
  * seed axis is a bounded top-k result list, so each hop is one streamed
  * pass over `graph_edges`, shuffle ∝ reachable rows, never corpus².
  * The reference's ORDER BY leaves `(depth, symbol_name)` ties (a node
  * reached by two paths) unspecified; we totalize with `(path, node_id)`
  * tiebreaks — a documented deterministic refinement.
  *
  * The fusion pass (graph_fusion.rs:165 expand_and_fuse_with_graph) is a
  * SEQUENTIAL fold over at most MAX_CANDIDATES×MAX_EXPANDED_PER_RESULT
  * examined rows: per-response slice of 5 (self and duplicate rows
  * consume slots — graph_fusion_tests.rs "self node consumes one of the
  * 5 sliced slots"), a 50-node total cap whose `break` skips only the
  * REST of the current candidate (duplicates seen before the first new
  * node still earn convergence bonuses), `+0.1` per re-discovery of an
  * ORIGINAL result (expanded nodes never bonus — TS `results.find`),
  * then `score *= ALPHA` on originals (bonuses included — the test's
  * `(0.5+0.1)*0.7 = 0.42`) and `(1-ALPHA)*proximity` on expanded rows,
  * re-sorted by score with Rust's STABLE sort (ties keep insertion
  * order — we materialize the insertion sequence and sort on it).
  * Like the MMR tag selection, the fold is a pure `aggregate` HOF over
  * one collected ≤100-element array — map-only, no driver loop.
  *
  * `edge_types` is a request parameter of the reference API
  * (QueryRelatedRequest); the client's LSP-graph caller passes
  * CALLS/USES_TYPE/CONTAINS, while the corpus queries here traverse the
  * narrative EXPLAINS edge set (an EdgeType of the same graph schema,
  * graph/mod.rs:153) materialized symmetrically (EXPLAINS plus
  * EXPLAINS_REVERSE rows) so a 2-hop expansion reaches co-explaining
  * documents.
  */
object GraphFusion {

  /** graph_fusion.rs:26-35 constants (mirroring search-graph-expansion.ts). */
  val Alpha = 0.7
  val ConvergenceBonus = 0.1
  val MaxExpandedPerResult = 5
  val MaxExpandedTotal = 50
  val MaxCandidates = 20
  val FusionMaxHops = 2

  /** The NARROW 10-entry chunk-type set of the fusion pass
    * (graph_fusion.rs:43 FUSION_CODE_CHUNK_TYPES — deliberately distinct
    * from the 13-entry context set). */
  val FusionCodeChunkTypes: Seq[String] = Seq(
    "function", "async_function", "method", "class", "struct", "trait",
    "interface", "enum", "impl", "module")

  /** The WIDE 13-entry set of the context pass (graph_context.rs:25). */
  val ContextCodeChunkTypes: Seq[String] =
    FusionCodeChunkTypes ++ Seq("constant", "type_alias", "macro")

  /** SHA256(tenant|file|symbol|type)[..32 hex] — graph_context.rs:62
    * compute_node_id, shared by the fusion pass. */
  def computeNodeId(tenant: Column, path: Column, sym: Column, ctype: Column): Column =
    substring(sha2(concat(tenant, lit("|"), path, lit("|"), sym, lit("|"), ctype), 256), 1, 32)

  /** JS-falsy nullish `relative_path ?? file_path` then `!filePath` skip
    * (graph_fusion.rs:83-90): a present-but-EMPTY relative_path must NOT
    * fall back to file_path. */
  def effectivePath(relativePath: Column, filePath: Column): Column =
    when(relativePath.isNotNull, relativePath).otherwise(filePath)

  /** The daemon traversal over an edge frame (tenant_id, src_node_id,
    * dst_node_id, edge_type) from a bounded seed frame (seed_id,
    * tenant_id, node_id): one broadcast join per hop, union, DISTINCT on
    * (seed, node, edge_type, depth, path), node attributes joined from
    * `nodes` (tenant_id, node_id, symbol_name, symbol_type, file_path),
    * and `pos` = the slice rank in the reference's response order.
    */
  def queryRelatedOf(seeds: DataFrame, edges: DataFrame, nodes: DataFrame,
                     maxHops: Int, edgeTypes: Seq[String]): DataFrame = {
    val e = (if (edgeTypes.nonEmpty) edges.filter(col("edge_type").isin(edgeTypes: _*))
             else edges)
      .select(col("tenant_id"), col("src_node_id"), col("dst_node_id"), col("edge_type"))
    val s = seeds.select(col("seed_id"), col("tenant_id"), col("node_id").as("origin"))
    var hop = broadcast(s).join(e,
        s("tenant_id") === e("tenant_id") && e("src_node_id") === s("origin"))
      .select(col("seed_id"), s("tenant_id").as("tenant_id"), col("origin"),
        col("dst_node_id").as("node_id"), col("edge_type"), lit(1).as("depth"),
        concat(col("src_node_id"), lit(" -> "), col("dst_node_id")).as("path"))
    var acc = hop
    for (d <- 2 to maxHops) {
      // NOTE (round 9): the cross_boundary unhint-and-checkpoint
      // treatment was applied here and MEASURED SLOWER at every scale
      // (sf0.1 4.5→7.0 s, ×10 11.7→24.4 s, ×100 ~195 s) — this hop
      // frame stays far under broadcast limits through ×100 and the
      // lazy unroll pipelines whole-stage; reverted on the probes.
      val h = hop.as("h")
      hop = broadcast(h).join(e.as("e2"),
          col("h.tenant_id") === col("e2.tenant_id") &&
            col("e2.src_node_id") === col("h.node_id"))
        .select(col("h.seed_id").as("seed_id"), col("h.tenant_id").as("tenant_id"),
          col("h.origin").as("origin"), col("e2.dst_node_id").as("node_id"),
          col("e2.edge_type").as("edge_type"), lit(d).as("depth"),
          concat(col("h.path"), lit(" -> "), col("e2.dst_node_id")).as("path"))
      acc = acc.unionByName(hop)
    }
    val distinctRows = acc
      .select(col("seed_id"), col("tenant_id"), col("origin"), col("node_id"),
        col("edge_type"), col("depth"), col("path"))
      .distinct()
    // traversal rows are bounded by the seed fan-out → broadcast them
    // past the corpus-sized node table, never the reverse
    val attributed = nodes
      .select(col("tenant_id"), col("node_id"), col("symbol_name"),
        col("symbol_type"), col("file_path"))
      .join(broadcast(distinctRows), Seq("tenant_id", "node_id"))
    attributed.withColumn("pos",
      row_number().over(Window.partitionBy(col("seed_id"))
        .orderBy(col("depth"), col("symbol_name"), col("path"), col("node_id"))))
  }

  /** The distinct reach set (seed, node, edge_type, depth) + node
    * attributes — EXACTLY the rows impact's `reverse_traverse` keeps
    * after its DISTINCT drops `path`. The traversal has no cycle gate
    * (faithful to the reference's recursive CTE), so walk-reachability
    * is path-independent: a length-d walk ending with edge (u,v,t)
    * exists iff u is reachable at d-1 and the edge exists. Level-wise
    * DISTINCT frontiers therefore replace all-walk enumeration — the
    * frontier is bounded by the node set (≤ |V| per seed), never by
    * the walk count (which multiplies per hop on a symmetric graph:
    * 4M+ walk rows at depth 3 on the sf0.1 EXPLAINS graph, all
    * collapsing right back in impact's DISTINCT).
    */
  def reachSetOf(seeds: DataFrame, edges: DataFrame, nodes: DataFrame,
                 maxHops: Int, edgeTypes: Seq[String]): DataFrame = {
    val e = (if (edgeTypes.nonEmpty) edges.filter(col("edge_type").isin(edgeTypes: _*))
             else edges)
      .select(col("tenant_id"), col("src_node_id"), col("dst_node_id"), col("edge_type"))
    var frontier = seeds.select(col("seed_id"), col("tenant_id"), col("node_id"))
    var acc: DataFrame = null
    for (d <- 1 to maxHops) {
      val f = frontier.as("f")
      val reached = broadcast(f).join(e.as("e2"),
          col("f.tenant_id") === col("e2.tenant_id") &&
            col("e2.src_node_id") === col("f.node_id"))
        .select(col("f.seed_id").as("seed_id"), col("f.tenant_id").as("tenant_id"),
          col("e2.dst_node_id").as("node_id"), col("e2.edge_type").as("edge_type"),
          lit(d).as("depth"))
        .distinct()
      frontier = reached.select(col("seed_id"), col("tenant_id"), col("node_id"))
        .distinct()
      acc = if (acc == null) reached else acc.unionByName(reached)
    }
    acc.join(nodes.select(col("tenant_id"), col("node_id"), col("symbol_name"),
      col("symbol_type"), col("file_path")), Seq("tenant_id", "node_id"))
  }

  private def proximity(depth: Column): Column =
    when(depth === 0, lit(1.0)).when(depth === 1, lit(0.8)).otherwise(lit(0.5))

  /** expand_and_fuse_with_graph over a result frame (id, score, rnk,
    * tenant_id, relative_path, file_path, symbol_name, chunk_type) and a
    * graph (edges/nodes as in queryRelatedOf). Returns the fused ranked
    * list: (rank, id, score, source, depth).
    */
  def fuseWithGraphOf(results: DataFrame, edges: DataFrame, nodes: DataFrame,
                      edgeTypes: Seq[String] = Seq("CALLS", "USES_TYPE", "CONTAINS"),
                      maxHops: Int = FusionMaxHops): DataFrame = {
    val fp = effectivePath(col("relative_path"), col("file_path"))
    // collect_candidates (graph_fusion.rs:70): every gate is JS-falsy
    // (empty == missing), then the narrow chunk-type set; candidate
    // order is result order, top MAX_CANDIDATES seed expansion. The
    // result list is a bounded top-k — the single-partition window IS
    // the right plan.
    val cands = results
      .withColumn("fp", fp)
      .filter(col("symbol_name").isNotNull && length(col("symbol_name")) > 0 &&
        col("tenant_id").isNotNull && length(col("tenant_id")) > 0 &&
        col("fp").isNotNull && length(col("fp")) > 0 &&
        col("chunk_type").isin(FusionCodeChunkTypes: _*))
      .withColumn("seed_id", row_number().over(Window.orderBy(col("rnk"))))
      .filter(col("seed_id") <= MaxCandidates)
      .select(col("seed_id"), col("tenant_id"),
        computeNodeId(col("tenant_id"), col("fp"), col("symbol_name"), col("chunk_type"))
          .as("node_id"))

    val trav = queryRelatedOf(cands, edges, nodes, maxHops, edgeTypes)
      .filter(col("pos") <= MaxExpandedPerResult) // take(5) of the response

    // One examined array, ordered (candidate, slice position) — struct
    // field order makes array_sort produce exactly the loop's order.
    val exRow = trav.agg(array_sort(collect_list(struct(
      col("seed_id").as("cand"), col("pos").as("pos"), col("origin").as("cnode"),
      col("node_id").as("node"), col("depth").as("depth"),
      col("symbol_name").as("sym"), col("file_path").as("fpath")))).as("ex"))
    val origRow = results.agg(
      transform(array_sort(collect_list(struct(col("rnk"), col("id")))),
        o => o("id")).as("orig_ids"),
      count(lit(1)).cast("int").as("n_orig"))
    val candRow = cands.agg(count(lit(1)).cast("int").as("n_cand"))

    val addedT = "array<struct<node_id:string,depth:int,aseq:int,symbol_name:string,file_path:string>>"
    val folded = exRow.crossJoin(origRow).crossJoin(candRow)
      .withColumn("st", aggregate(
        col("ex"),
        struct(col("orig_ids").as("existing"), expr(s"CAST(array() AS $addedT)").as("added"),
          array().cast("array<string>").as("bonus"), lit(0).as("total"), lit(-1).as("broken")),
        (st, e) => {
          val keep = struct(st("existing").as("existing"), st("added").as("added"),
            st("bonus").as("bonus"), st("total").as("total"), st("broken").as("broken"))
          val bonused = struct(st("existing").as("existing"), st("added").as("added"),
            concat(st("bonus"), array(e("node"))).as("bonus"),
            st("total").as("total"), st("broken").as("broken"))
          val broke = struct(st("existing").as("existing"), st("added").as("added"),
            st("bonus").as("bonus"), st("total").as("total"), e("cand").as("broken"))
          val added = struct(
            concat(st("existing"), array(e("node"))).as("existing"),
            concat(st("added"), array(struct(e("node").as("node_id"), e("depth").as("depth"),
              st("total").as("aseq"), e("sym").as("symbol_name"),
              e("fpath").as("file_path")))).as("added"),
            st("bonus").as("bonus"), (st("total") + 1).as("total"), st("broken").as("broken"))
          when(st("broken") === e("cand"), keep)        // break skipped the candidate's tail
            .when(e("node") === e("cnode"), keep)       // self
            .when(array_contains(st("existing"), e("node")), bonused)
            .when(st("total") >= MaxExpandedTotal, broke)
            .otherwise(added)
        }))
      .select(col("st"), col("n_orig"), col("n_cand"))

    val originals = results.crossJoin(broadcast(folded))
      .withColumn("bonus_n",
        size(filter(col("st.bonus"), b => b === col("id"))).cast("double"))
      .select(col("id"),
        // no candidates → the whole pass is a no-op, scores untouched
        when(col("n_cand") > 0,
          (col("score") + lit(ConvergenceBonus) * col("bonus_n")) * lit(Alpha))
          .otherwise(col("score")).as("fscore"),
        (col("rnk") - 1).cast("int").as("seq"),
        lit("vector").as("source"), lit(null).cast("int").as("depth"))
    val expanded = folded
      .select(col("n_orig"), explode(col("st.added")).as("a"))
      .select(col("a.node_id").as("id"),
        ((lit(1.0) - lit(Alpha)) * proximity(col("a.depth"))).as("fscore"),
        (col("n_orig") + col("a.aseq")).as("seq"),
        lit("graph_expansion").as("source"), col("a.depth").as("depth"))

    originals.unionByName(expanded)
      .withColumn("score", round(col("fscore"), 9))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("seq"))))
      .select(col("rank"), col("id"), col("score"), col("source"), col("depth"))
      .orderBy(col("rank"))
  }

  // ── Corpus graph scaffolding (shared by the three queries) ────────────

  /** Document-chunk payload axis: tenant, narrative file path (shared
    * with the narrative edge queries), a per-doc symbol, and a chunk
    * type — ~1/7 of docs are `text` chunks, exercising the
    * code-chunk-type gate. */
  private def docPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source").as("tenant_id"),
      Explains.corpusFilePath.as("file_path"),
      concat(lit("doc"), col("doc_id")).as("symbol_name"),
      when(col("doc_id") % 7 === 3, lit("text")).otherwise(lit("module")).as("chunk_type"))

  private def withNodeId(docs: DataFrame): DataFrame =
    docs.withColumn("node_id", computeNodeId(
      col("tenant_id"), col("file_path"), col("symbol_name"), col("chunk_type")))

  /** Symbol nodes from the shared corpus symbol axis; file_path recovered
    * from the `node:<tenant>/f<i>.rs:<name>` id scheme. */
  private def symbolNodes(spark: SparkSession, dir: String): DataFrame =
    Explains.corpusSymbols(spark, dir)
      .select(col("tenant_id"), col("node_id"), col("symbol_name"),
        lit("function").as("symbol_type"),
        regexp_extract(col("node_id"), "^node:(.+\\.rs):", 1).as("file_path"))
      .distinct()

  /** The narrative EXPLAINS graph, symmetrically materialized:
    * doc —EXPLAINS→ symbol plus symbol —EXPLAINS_REVERSE→ doc, one row
    * per distinct (doc, resolved symbol) pair of the doc_explains edge
    * set. */
  def explainsGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    CorpusGraphCache.graphOf(spark, dir, "explains")(explainsGraphUncached(spark, dir))

  private def explainsGraphUncached(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docNodes = withNodeId(docPayload(spark, dir))
    val pairs = Explains.docExplains(spark, dir)
      .select(col("tenant_id"), col("doc_id"), col("node_id").as("sym_node")).distinct()
      .join(docNodes.select(col("doc_id"), col("node_id").as("doc_node")), "doc_id")
    val edges = pairs
      .select(col("tenant_id"), col("doc_node").as("src_node_id"),
        col("sym_node").as("dst_node_id"), lit("EXPLAINS").as("edge_type"))
      .unionByName(pairs.select(col("tenant_id"), col("sym_node").as("src_node_id"),
        col("doc_node").as("dst_node_id"), lit("EXPLAINS_REVERSE").as("edge_type")))
    val nodes = docNodes
      .select(col("tenant_id"), col("node_id"), col("symbol_name"),
        col("chunk_type").as("symbol_type"), col("file_path"))
      .unionByName(symbolNodes(spark, dir))
    (edges, nodes)
  }

  /** graph_fusion query: the hybrid RRF top-20 over documents (ids are
    * the docs' graph node ids; score is the same monotone `1/(60+rank)`
    * stand-in diversity_rerank uses) expanded ≤2 hops over the symmetric
    * EXPLAINS graph and score-fused. */
  def graphFusion(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = withNodeId(docPayload(spark, dir))
    val hyb = SparseSearch.hybridRrf(spark, dir, k = k)
      .withColumn("score", lit(1.0) / (lit(60.0) + col("rnk")))
    val results = docs.join(broadcast(hyb), docs("doc_id") === hyb("id"))
      .select(col("node_id").as("id"), col("score"), col("rnk"), col("tenant_id"),
        col("file_path").as("relative_path"), col("file_path"),
        col("symbol_name"), col("chunk_type"))
    val (edges, nodes) = explainsGraph(spark, dir)
    fuseWithGraphOf(results, edges, nodes, Seq("EXPLAINS", "EXPLAINS_REVERSE"))
  }

  // ── 1-hop context enrichment (graph_context.rs expand_graph_context) ──

  /** Per-result 1-hop graph context. Unlike the fusion pass, eligibility
    * uses the WIDE 13-type set and PLAIN Option chaining — no JS-falsy
    * empty-string skip, and `relative_path.or(file_path)` is a plain
    * Option-or (a present-but-empty relative_path IS used) — both
    * faithful divergences between the two reference modules
    * (graph_context.rs:131-148 `?` on as_str vs graph_fusion.rs:76-90).
    * Scores and result membership never change; the output is the
    * flattened callers/callees attachment: one row per context node,
    * `CALLS_REVERSE`/`CONTAINS` edges classify as callers, everything
    * else as callees (graph_context.rs:185, mirroring TS), ordered by
    * the daemon response order. Results whose response is empty emit no
    * rows (`graph_context = None`).
    */
  def graphContextOf(results: DataFrame, edges: DataFrame, nodes: DataFrame,
                     edgeTypes: Seq[String] = Seq.empty): DataFrame = {
    val fp = coalesce(col("relative_path"), col("file_path"))
    val eligible = results
      .withColumn("fp", fp)
      .filter(col("symbol_name").isNotNull && col("tenant_id").isNotNull &&
        col("fp").isNotNull && col("chunk_type").isin(ContextCodeChunkTypes: _*))
      .select(col("id"), col("rnk"), col("tenant_id"), col("fp"),
        col("symbol_name").as("res_symbol"),
        computeNodeId(col("tenant_id"), col("fp"), col("symbol_name"), col("chunk_type"))
          .as("node_id"))
    val seeds = eligible.select(col("rnk").as("seed_id"), col("tenant_id"), col("node_id"))
    val trav = queryRelatedOf(seeds, edges, nodes, maxHops = 1, edgeTypes = edgeTypes)
      .filter(col("node_id") =!= col("origin")) // self skip (graph_context.rs:181)
      .withColumn("direction",
        when(col("edge_type") === "CALLS_REVERSE" || col("edge_type") === "CONTAINS",
          lit("callers")).otherwise(lit("callees")))
      .withColumn("ord", row_number().over(
        Window.partitionBy(col("seed_id"), col("direction")).orderBy(col("pos"))))
    eligible.join(trav.select(col("seed_id"), col("direction"), col("ord"),
        col("symbol_name").as("rel_symbol"), col("file_path").as("rel_file_path")),
        eligible("rnk") === trav("seed_id"))
      .select(col("id"), col("res_symbol"), col("fp").as("res_file_path"),
        col("direction"), col("ord"), col("rel_symbol"), col("rel_file_path"))
  }

  /** graph_context query: the hybrid top-20 document chunks PLUS one
    * code-file chunk per top-5 tenant (the two record shapes the
    * reference's search returns), enriched 1-hop over the EXPLAINS
    * graph extended with file —CONTAINS→ symbol containment edges, so
    * both classification branches are live: a file chunk's contained
    * symbols arrive as callers, a doc chunk's explained symbols as
    * callees. */
  def graphContext(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = withNodeId(docPayload(spark, dir))
    val hyb = SparseSearch.hybridRrf(spark, dir, k = k)
    val docResults = docs.join(broadcast(hyb), docs("doc_id") === hyb("id"))
      .select(col("node_id").as("id"), col("rnk"), col("tenant_id"),
        col("file_path").as("relative_path"), col("file_path"),
        col("symbol_name"), col("chunk_type"))
    // one file-chunk result per distinct tenant of the top-5 doc hits,
    // appended after the doc results in tenant order
    val topTenants = docs.join(broadcast(hyb.filter(col("rnk") <= 5)),
        docs("doc_id") === hyb("id"))
      .select(col("tenant_id")).distinct()
      .withColumn("trnk", row_number().over(Window.orderBy(col("tenant_id"))))
    val fileResults = topTenants
      .select(concat(lit("file:"), col("tenant_id"), lit("/f0.rs")).as("id"),
        (col("trnk") + k).as("rnk"), col("tenant_id"),
        concat(col("tenant_id"), lit("/f0.rs")).as("relative_path"),
        concat(col("tenant_id"), lit("/f0.rs")).as("file_path"),
        lit("f0").as("symbol_name"), lit("module").as("chunk_type"))
    val results = docResults.unionByName(fileResults)
    val (exEdges, exNodes) = explainsGraph(spark, dir)
    val (cEdges, cNodes) = containsGraph(spark, dir)
    graphContextOf(results, exEdges.unionByName(cEdges),
        exNodes.unionByName(cNodes).distinct())
      .orderBy(col("id"), col("direction"), col("ord"))
  }

  /** File —CONTAINS→ symbol containment: one code-file node per
    * `<tenant>/f<i>.rs` of the symbol axis, containing its symbols. */
  private def containsGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val syms = symbolNodes(spark, dir)
      .withColumn("fidx", regexp_extract(col("file_path"), "/f(\\d+)\\.rs$", 1))
    val fileNodes = syms.select(col("tenant_id"), col("file_path"),
        concat(lit("f"), col("fidx")).as("symbol_name")).distinct()
      .select(col("tenant_id"),
        computeNodeId(col("tenant_id"), col("file_path"), col("symbol_name"), lit("module"))
          .as("node_id"),
        col("symbol_name"), lit("module").as("symbol_type"), col("file_path"))
    val edges = syms.join(
        fileNodes.select(col("tenant_id"), col("file_path"), col("node_id").as("file_node")),
        Seq("tenant_id", "file_path"))
      .select(col("tenant_id"), col("file_node").as("src_node_id"),
        col("node_id").as("dst_node_id"), lit("CONTAINS").as("edge_type"))
    (edges, fileNodes)
  }

  // ── Impact analysis (sqlite_store.rs:1231 + impact_analysis) ──────────

  /** Impact analysis over a probe frame (probe_id, tenant_id,
    * symbol_name, file_path nullable): target nodes matched by
    * (tenant, symbol[, file]) (find_target_nodes, :1169), each
    * reverse-traversed ≤3 hops over INCOMING edges with
    * `DISTINCT (node, edge_type, depth)` and the reference's
    * `ORDER BY depth, symbol_name` per target, targets concatenated
    * and STABLY sorted by distance (Rust sort_by_key), then deduped by
    * node_id keeping the first occurrence (mod.rs impact_analysis).
    * The reference leaves the target order and same-(depth,symbol)
    * ties unspecified (unordered SELECTs); we totalize with
    * (node_id-ordered targets, edge_type, node_id) — a documented
    * deterministic refinement. */
  def impactOf(probes: DataFrame, edges: DataFrame, nodes: DataFrame,
               maxDepth: Int = 3): DataFrame = {
    val targets = probes.join(
        nodes.select(col("tenant_id"), col("node_id"), col("symbol_name"),
          col("file_path").as("node_file")),
        Seq("tenant_id", "symbol_name"))
      .filter(col("file_path").isNull || col("file_path") === col("node_file"))
      .withColumn("target_ord", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("node_id"))))
      .select(col("probe_id"), col("target_ord"), col("tenant_id"),
        col("node_id"))
    // reverse traversal = the forward traversal over the transposed
    // edge set; seed ids carry (probe, target) so per-target DISTINCT
    // and ordering survive the shared pass
    val seeds = targets.select(
      concat(col("probe_id"), lit("#"), col("target_ord")).as("seed_id"),
      col("tenant_id"), col("node_id"))
    val reversed = edges.select(col("tenant_id"),
      col("dst_node_id").as("src_node_id"), col("src_node_id").as("dst_node_id"),
      col("edge_type"))
    // reverse_traverse's DISTINCT drops `path` — so the path-free
    // level-wise reach set is exact (and walk-count-free)
    val trav = reachSetOf(seeds, reversed, nodes, maxHops = maxDepth,
        edgeTypes = Seq.empty)
      .select(col("seed_id"), col("node_id"), col("edge_type"), col("depth"),
        col("symbol_name"), col("file_path"))
      .distinct()
      .withColumn("probe_id", split(col("seed_id"), "#").getItem(0))
      .withColumn("target_ord", split(col("seed_id"), "#").getItem(1).cast("int"))
    // stable distance sort across concatenated targets, then
    // first-occurrence dedup per probe
    val ordW = Window.partitionBy(col("probe_id")).orderBy(
      col("depth"), col("target_ord"), col("symbol_name"), col("edge_type"), col("node_id"))
    val dedupW = Window.partitionBy(col("probe_id"), col("node_id")).orderBy(col("seq"))
    val ranked = trav
      .withColumn("seq", row_number().over(ordW))
      .withColumn("first", row_number().over(dedupW))
      .filter(col("first") === 1)
    ranked
      .withColumn("impact_rank", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("seq"))))
      .select(col("probe_id"), col("impact_rank"), col("node_id"),
        col("symbol_name"), col("file_path"),
        col("edge_type").as("impact_type"), col("depth").as("distance"))
  }

  /** graph_impact query: for every tenant, the blast radius of the
    * `window` symbol (no file scope) over the symmetric EXPLAINS
    * graph — sections explaining it at distance 1, co-explained
    * symbols at distance 2, their other sections at distance 3. */
  def graphImpact(spark: SparkSession, dir: String,
                  symbol: String = "window"): DataFrame = {
    val (edges, nodes) = explainsGraph(spark, dir)
    val probes = Tables.documents(spark, dir)
      .select(col("source").as("tenant_id")).distinct()
      .select(col("tenant_id").as("probe_id"), col("tenant_id"),
        lit(symbol).as("symbol_name"), lit(null).cast("string").as("file_path"))
    impactOf(probes, edges, nodes)
      .orderBy(col("probe_id"), col("impact_rank"))
  }
}
