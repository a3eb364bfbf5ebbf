package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-boundary graph traversal — the GraphRAG expansion that hops from
  * code through `__global__` concept nodes into narrative (and library)
  * tenants (graph/cross_boundary.rs + sqlite_store.rs:762
  * query_cross_boundary).
  *
  * Reference semantics reproduced exactly:
  *  - Tenant relaxation set `{source_tenant, __global__} ∪ library_tenants`
  *    (cross_boundary.rs:44); every REACHED node's tenant must be in the
  *    set, and the traversal may only START from a node inside it (the
  *    seed-ownership guard at sqlite_store.rs:790).
  *  - BIDIRECTIONAL expansion: each hop follows an allowed-type edge in
  *    either direction (two recursive members in the reference CTE — we
  *    symmetrize the adjacency once, which is equivalent).
  *  - Cycle avoidance is the reference's literal `INSTR(path, node_id)=0`
  *    SUBSTRING test on the ` -> `-joined path — a node id that happens
  *    to be a substring of a visited id is also skipped (e.g. the corpus
  *    `windo`/`window` symbol pair); both engines reproduce the quirk
  *    identically.
  *  - `conf` is the REACHING edge's `coalesce(weight,1) × per-type base`
  *    (EXPLAINS .6, COVERS_TOPIC .6, IMPLEMENTS_CONCEPT .7, else 1 —
  *    cross_boundary.rs:30), NOT a product along the path.
  *  - Per reached node keep the best row by (depth asc, conf desc,
  *    path asc) — the reference's ROW_NUMBER dedup.
  *  - apply_fan_out_caps (cross_boundary.rs:69): rank all rows by
  *    (conf desc, depth asc, node_id asc); cap depth-1 rows at
  *    max_per_hit; cap deeper rows attributed to a concept (LAST
  *    concept-node id on the path, membership by the result set's own
  *    concept nodes) at max_per_concept; keep the first max_total
  *    survivors; final depth-major stable sort (depth, symbol_name —
  *    stability totalized by the rank order, i.e. conf desc, node_id).
  *    The reference's sequential loop is cap-equivalent to per-class
  *    window ranks because a row is only ever skipped by its OWN class
  *    cap, so class ordinals are unaffected by other classes' skips.
  *
  * Scale: seeds are bounded probe lists, so the FIRST hop broadcasts the
  * frontier against the corpus-shaped adjacency; deeper frontiers (and
  * `reached`, `parents`, the node-attribute axis) scale with the corpus,
  * so they carry NO broadcast hint — checkpointed stats let the planner
  * broadcast them exactly while they are small and shuffle past that
  * (the ×100 sweep measured the forced-broadcast + O(|mids|)-per-arrival
  * form at e2=1.36; the short-circuit mid lookup and unhinted joins
  * restore ~linear). Shuffle ∝ reachable rows, never corpus². Caps/dedup
  * are per-probe windows over ≤ reachable-set rows.
  */
object CrossBoundary {

  val GlobalTenant = "__global__"
  val MaxHopsCap = 3 // CROSS_BOUNDARY_MAX_HOPS
  val DefaultMaxPerHit = 5
  val DefaultMaxPerConcept = 8
  val DefaultMaxTotal = 50

  /** Per-edge-type base confidence (cross_boundary.rs:30). */
  def baseConfidence(edgeType: Column): Column =
    when(edgeType === "EXPLAINS", 0.6)
      .when(edgeType === "COVERS_TOPIC", 0.6)
      .when(edgeType === "IMPLEMENTS_CONCEPT", 0.7)
      .otherwise(1.0)

  /** First element of the sorted `mids` array that does NOT contain
    * `toId` as a substring (the lex-min INSTR-allowed interior node).
    * `filter(...)` materializes the whole filtered array per row — O(|mids|)
    * per arrival, and a concept hub's mids set grows with the corpus, so
    * the naive form is O(n²/concepts) at scale (measured: the ×100
    * sweep's e2=1.36 on cross_boundary). Substring hits are the rare
    * quirk case, so test mids[0] first and fall back to the full filter
    * only when it is itself blocked — semantically identical because
    * mids is sorted ascending.
    */
  private def firstAllowedMid(mids: Column, toId: Column): Column = {
    val head = element_at(mids, 1)
    when(!head.contains(toId), head)
      .otherwise(element_at(filter(mids, mid => !mid.contains(toId)), 1))
  }

  /** The §3 `*Of` form. `seeds`: (probe_id, source_tenant, node_id);
    * `edges`: (src_node_id, dst_node_id, edge_type, weight — nullable);
    * `nodes`: (tenant_id, node_id, symbol_name, symbol_type, file_path).
    * Returns the capped traversal, one row per surviving reached node:
    * (probe_id, rank, node_id, symbol_name, symbol_type, file_path,
    *  tenant_id, depth, edge_type, edge_confidence, path).
    */
  def crossBoundaryOf(seeds: DataFrame, edges: DataFrame, nodes: DataFrame,
                      edgeTypes: Seq[String], maxHops: Int,
                      libraryTenants: Seq[String],
                      maxPerHit: Int = DefaultMaxPerHit,
                      maxPerConcept: Int = DefaultMaxPerConcept,
                      maxTotal: Int = DefaultMaxTotal): DataFrame = {
    val spark = seeds.sparkSession
    if (edgeTypes.isEmpty || maxHops == 0)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        crossBoundarySchema)
    val hops = maxHops.max(1).min(MaxHopsCap)

    def allowedTenant(sourceTenant: Column, tenant: Column): Column =
      tenant === sourceTenant || tenant.isin((GlobalTenant +: libraryTenants): _*)

    // Bidirectional adjacency: one symmetrized frame, equivalent to the
    // reference CTE's two recursive members.
    val typed = edges.filter(col("edge_type").isin(edgeTypes: _*))
      .select(col("src_node_id"), col("dst_node_id"), col("edge_type"),
        col("weight").cast("double").as("weight"))
    val adj = typed.select(col("src_node_id").as("from_id"),
        col("dst_node_id").as("to_id"), col("edge_type"), col("weight"))
      .unionByName(typed.select(col("dst_node_id").as("from_id"),
        col("src_node_id").as("to_id"), col("edge_type"), col("weight")))

    val nodeT = nodes.select(col("node_id").as("n_id"),
      col("tenant_id").as("n_tenant"))

    // Enrich the adjacency with the DESTINATION tenant once — the
    // reached-node tenant gate then evaluates inline in every hop join
    // instead of re-joining each level's arrival stream (∝ corpus at
    // depth ≥ 2) against the corpus-sized node table. One corpus join,
    // materialized with fresh stats, reused by all three levels — the
    // ×100 sweep measured the per-level arrival shuffles as the
    // dominant disk writer here.
    val adjT = graft.GraftFunctions.localCheckpointFreshStats(
      adj.join(nodeT, adj("to_id") === nodeT("n_id")).drop("n_id"))

    // Seed-ownership guard: the seed node must exist inside the
    // relaxation set.
    val frontier0 = seeds
      .join(nodeT, seeds("node_id") === nodeT("n_id"))
      .filter(allowedTenant(col("source_tenant"), col("n_tenant")))
      .select(col("probe_id"), col("source_tenant"), col("node_id"),
        lit(0).as("depth"), col("node_id").as("path"),
        lit("").as("edge_type"), lit(1.0).as("conf"))

    // ── Exact first-reach prune ────────────────────────────────────────
    // The reference CTE enumerates EVERY simple path (gated by the INSTR
    // substring test) and dedupes per node by (depth, conf desc, path)
    // at the end. Under the ≤3-hop clamp that enumeration is provably
    // equivalent to first-reach BFS: every path to node X contains
    // {seed, X}, so the INSTR gate of X's depth-1 path ({seed, X}) is
    // weaker than ANY longer path's gate — an extension blocked from the
    // min-depth row is blocked from every deeper row of the same node,
    // hence (i) arrivals at an already-reached node can never produce a
    // descendant at ITS minimal depth, and (ii) a node's min-depth
    // arrival set is exactly the extensions of the previous level's
    // first-reach rows (a parent at depth 2 re-reached from depth-1
    // would contradict the target's minimality through the weaker gate).
    // Deeper rows of a reached node only ever lose the (depth asc, …)
    // dedup, so dropping them from BOTH the frontier and the
    // accumulator changes no output row — while collapsing the
    // depth-3 hub re-expansion that dominated the enumeration (the
    // measured 36M-row analogue in find_path). Beyond 3 hops the
    // subset argument fails for min-depth ≥ 2 parents; the prune is
    // sound precisely because MaxHopsCap = 3 (cross_boundary.rs cap).
    var frontier = frontier0
    var reached = frontier0.select(col("probe_id"), col("node_id"))
    var acc: DataFrame = null
    for (d <- 1 to hops) {
      val f = frontier.as("f")
      // The third level expands COMPACTED parents — one row per
      // (probe, parent) carrying the sorted SET of interior (mid) nodes
      // across that parent's depth-2 paths — instead of one row per
      // path. Sound because node ids contain none of the " -> "
      // separator's characters (no ' ' or '>', every id carries ':'),
      // so the INSTR gate decomposes per visited node: arrival m via
      // parent X is allowed iff neither seed nor X contains m AND some
      // mid has ¬mid.contains(m); and the lex-min allowed full path is
      // seed -> (min allowed mid) -> X -> m, because the shared
      // prefix/suffix make full-path order coincide with mid order
      // (space < every id character, so a prefix id sorts first in both
      // orders). Collapses the dominant (paths × degree) expansion to
      // (parents × degree) — measured ~20× fewer level-3 rows.
      val step =
        if (d == 3) {
          val parents = frontier
            .groupBy(col("probe_id"), col("source_tenant"),
              col("node_id").as("p_node"))
            .agg(min(element_at(split(col("path"), " -> "), 1)).as("seed_id"),
              sort_array(collect_set(
                element_at(split(col("path"), " -> "), 2))).as("mids"))
          // parents ∝ corpus (one row per reached depth-2 node) — no
          // broadcast hint; the planner broadcasts while the frame is
          // small and falls back to a shuffled join past the threshold
          // (a forced broadcast here is a driver-OOM at real scale).
          parents.join(adjT.as("a"),
              col("a.from_id") === col("p_node"))
            .filter(!col("seed_id").contains(col("a.to_id")) &&
              !col("p_node").contains(col("a.to_id")) &&
              exists(col("mids"), mid => !mid.contains(col("a.to_id"))))
            .filter(allowedTenant(col("source_tenant"), col("a.n_tenant")))
            .select(col("probe_id"), col("source_tenant"),
              col("a.to_id").as("node_id"), lit(d).as("depth"),
              concat(col("seed_id"), lit(" -> "),
                firstAllowedMid(col("mids"), col("a.to_id")),
                lit(" -> "), col("p_node"), lit(" -> "), col("a.to_id"))
                .as("path"),
              col("a.edge_type").as("edge_type"),
              (coalesce(col("a.weight"), lit(1.0)) *
                baseConfidence(col("a.edge_type"))).as("conf"))
        // Only the depth-1 frontier is probe-bounded; the depth-2
        // frontier is the depth-1 arrival set (∝ corpus), so it gets no
        // hint — its localCheckpoint carries exact stats and the planner
        // broadcasts it exactly while it is actually small.
        } else (if (d == 1) broadcast(f) else f).join(adjT.as("a"),
          col("a.from_id") === col("f.node_id"))
        // cycle gate: the reference's literal substring INSTR test
        .filter(!col("f.path").contains(col("a.to_id")))
        .filter(allowedTenant(col("f.source_tenant"), col("a.n_tenant")))
        .select(col("f.probe_id").as("probe_id"),
          col("f.source_tenant").as("source_tenant"),
          col("a.to_id").as("node_id"), lit(d).as("depth"),
          concat(col("f.path"), lit(" -> "), col("a.to_id")).as("path"),
          col("a.edge_type").as("edge_type"),
          (coalesce(col("a.weight"), lit(1.0)) *
            baseConfidence(col("a.edge_type"))).as("conf"))
      // First-reach only: arrivals at known nodes are (depth asc)-dominated.
      // The LAST level feeds no further expansion, so it skips the
      // frontier checkpoint entirely — its (largest) arrival set streams
      // straight into the aggregate below and is never materialized.
      // reached ∝ probes × reached nodes — corpus-scaled, so no forced
      // broadcast; its checkpointed stats let the planner broadcast the
      // anti-join build side while it genuinely fits.
      val anti = step.join(reached,
        Seq("probe_id", "node_id"), "left_anti")
      val stepNew = if (d == hops) anti
        else graft.GraftFunctions.localCheckpointFreshStats(anti)
      // The min-depth best row per node is decided WITHIN this level
      // ((conf desc, path asc) over the complete arrival set — intact
      // because the previous level kept every path of its new nodes).
      // min(struct(−conf, path, …)) instead of a rank window: the
      // partial (map-side) aggregation collapses the per-node path fan
      // BEFORE the shuffle — the window would sort the full arrival set.
      val accStep = stepNew
        .groupBy(col("probe_id"), col("node_id"))
        .agg(min(struct((-col("conf")).as("nc"), col("path").as("p"),
          col("edge_type").as("et"), col("conf").as("c"),
          col("source_tenant").as("st"))).as("o"))
        .select(col("probe_id"), col("o.st").as("source_tenant"),
          col("node_id"), lit(d).as("depth"), col("o.p").as("path"),
          col("o.et").as("edge_type"), col("o.c").as("conf"))
      acc = if (acc == null) accStep else acc.unionByName(accStep)
      if (d < hops) {
        frontier = stepNew
        reached = reached.unionByName(
          stepNew.select(col("probe_id"), col("node_id")).distinct())
      }
    }

    // Per-node dedup (sqlite_store.rs ranked CTE) — acc already holds
    // one min-depth row per (probe, node); the window is kept as the
    // (now cheap) structural twin of the reference's ROW_NUMBER.
    // localCheckpoint: the cap stage references this frame on two plan
    // branches (the concept-id aggregate and the main rank path) — a
    // ~|reached| materialization here keeps the traversal from
    // executing twice in one query.
    val best = acc
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("probe_id"), col("node_id"))
          .orderBy(col("depth"), col("conf").desc, col("path"))))
      .filter(col("rn") === 1)
      .join(nodes, Seq("node_id"))
      .localCheckpoint()

    // apply_fan_out_caps as per-class window ranks.
    val ranked = best.withColumn("grank", row_number().over(
      Window.partitionBy(col("probe_id"))
        .orderBy(col("conf").desc, col("depth"), col("node_id"))))
    val concepts = ranked.filter(col("symbol_type") === "concept_node")
      .groupBy(col("probe_id")).agg(collect_set(col("node_id")).as("concept_ids"))
    val attributed = ranked
      // per-probe concept-id sets are probe-axis tiny — broadcast so
      // the capped frame never shuffles for the attribution join
      .join(broadcast(concepts), Seq("probe_id"), "left")
      .withColumn("via_concept", try_element_at(
        filter(split(col("path"), " -> "),
          c => array_contains(coalesce(col("concept_ids"),
            array().cast("array<string>")), c)), lit(-1)))
      // depth-1 rows consume ONLY direct budget (the reference's loop
      // `continue`s before the concept branch), so the concept-rank
      // partition must exclude them — cap_concept is null for them.
      .withColumn("cap_concept", when(col("depth") > 1, col("via_concept")))
      .withColumn("direct_rank", row_number().over(
        Window.partitionBy(col("probe_id"), col("depth") === 1)
          .orderBy(col("grank"))))
      .withColumn("concept_rank", row_number().over(
        Window.partitionBy(col("probe_id"), col("cap_concept"))
          .orderBy(col("grank"))))
    val capped = attributed.filter(
      when(col("depth") === 1, col("direct_rank") <= maxPerHit)
        .otherwise(col("cap_concept").isNull ||
          col("concept_rank") <= maxPerConcept))
      .withColumn("total_rank", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("grank"))))
      .filter(col("total_rank") <= maxTotal)

    // Final depth-major stable sort; stability totalized by the kept
    // (grank) order.
    capped
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("depth"), col("symbol_name"), col("grank"))))
      .select(col("probe_id"), col("rank"), col("node_id"),
        col("symbol_name"), col("symbol_type"), col("file_path"),
        col("tenant_id"), col("depth"), col("edge_type"),
        round(col("conf"), 9).as("edge_confidence"), col("path"))
  }

  private def crossBoundarySchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("probe_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("rank",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("node_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("symbol_name",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("symbol_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("file_path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("tenant_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("depth",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("edge_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("edge_confidence",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType)))

  // ── Corpus graph: narrative EXPLAINS + __global__ concept layer ────────

  /** 60 global concepts; a doc covers concept `doc_id % 60` with a
    * varying edge weight, a symbol implements concept
    * `(7·len(name) + ascii(first)) % 60` at weight 0.9 — both arithmetic
    * so the oracle derives the identical layer. */
  def conceptId(k: Column): Column =
    concat(lit("concept:"), lpad(k.cast("string"), 2, "0"))

  def conceptGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    CorpusGraphCache.graphOf(spark, dir, "concept")(conceptGraphUncached(spark, dir))

  private def conceptGraphUncached(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("tenant_id"),
        Explains.corpusFilePath.as("file_path"),
        concat(lit("doc"), col("doc_id")).as("symbol_name"),
        when(col("doc_id") % 7 === 3, lit("text")).otherwise(lit("module"))
          .as("chunk_type"))
      .withColumn("node_id", GraphFusion.computeNodeId(
        col("tenant_id"), col("file_path"), col("symbol_name"), col("chunk_type")))
    val covers = docs.select(
      col("tenant_id"),
      col("node_id").as("src_node_id"),
      conceptId(col("doc_id") % 60).as("dst_node_id"),
      lit("COVERS_TOPIC").as("edge_type"),
      (lit(0.5) + (col("doc_id") % 5).cast("double") * 0.1).as("weight"),
      (col("doc_id") % 60).as("k"))
    val syms = Explains.corpusSymbols(spark, dir)
      .select(col("tenant_id"), col("node_id"), col("symbol_name")).distinct()
    val implementsE = syms.select(
      col("tenant_id"),
      col("node_id").as("src_node_id"),
      conceptId((length(col("symbol_name")) * 7 +
        ascii(substring(col("symbol_name"), 1, 1))) % 60).as("dst_node_id"),
      lit("IMPLEMENTS_CONCEPT").as("edge_type"),
      lit(0.9).as("weight"),
      ((length(col("symbol_name")) * 7 +
        ascii(substring(col("symbol_name"), 1, 1))) % 60).as("k"))
    val edges = covers.unionByName(implementsE)
    val conceptNodes = edges.select(col("k")).distinct()
      .select(lit(GlobalTenant).as("tenant_id"),
        conceptId(col("k")).as("node_id"),
        concat(lit("concept-"), col("k")).as("symbol_name"),
        lit("concept_node").as("symbol_type"), lit("").as("file_path"))
    (edges.drop("k"), conceptNodes)
  }

  /** cross_boundary query: one probe per tenant seeded at its `window`
    * symbol node, expanded ≤3 hops over EXPLAINS + COVERS_TOPIC +
    * IMPLEMENTS_CONCEPT with `src2`/`src5` as library tenants — code →
    * concept → foreign-tenant narrative traversal with all three caps
    * live. */
  def crossBoundary(spark: SparkSession, dir: String,
                    symbol: String = "window",
                    libraryTenants: Seq[String] = Seq("src2", "src5")): DataFrame = {
    val (exEdges, exNodes) = GraphFusion.explainsGraph(spark, dir)
    // raw EXPLAINS only — bidirectional traversal replaces the
    // symmetric _REVERSE materialization the fusion pass needs
    val explains = exEdges.filter(col("edge_type") === "EXPLAINS")
      .select(col("src_node_id"), col("dst_node_id"), col("edge_type"),
        lit(null).cast("double").as("weight"))
    val (cEdges, cNodes) = conceptGraph(spark, dir)
    val edges = explains.unionByName(cEdges.drop("tenant_id"))
    val nodes = exNodes.unionByName(cNodes).distinct()
    val probes = Tables.documents(spark, dir)
      .select(col("source").as("tenant_id")).distinct()
      .select(col("tenant_id").as("probe_id"),
        col("tenant_id").as("source_tenant"),
        concat(lit("node:"), col("tenant_id"), lit("/f0.rs:"), lit(symbol))
          .as("node_id"))
    crossBoundaryOf(probes, edges, nodes,
        Seq("EXPLAINS", "COVERS_TOPIC", "IMPLEMENTS_CONCEPT"),
        maxHops = 3, libraryTenants = libraryTenants)
      .orderBy(col("probe_id"), col("rank"))
  }
}
