package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Narrative EXPLAINS edges — documentation sections resolved against a
  * tenant's REAL code symbols (narrative/explains.rs + the per-tenant
  * `SymbolAutomaton` of narrative/symbol_index.rs).
  *
  * The reference builds an Aho-Corasick automaton (LeftmostLongest) over
  * a tenant's code-symbol names, scans each narrative (`.md`/`.markdown`/
  * `.txt`) document, and tallies matches per containing section span. A
  * (section, symbol) pair becomes an EXPLAINS edge only when every gate
  * passes (explains.rs:7-12):
  *   - the symbol resolves to exactly ONE code node (symbol_index.rs:112
  *     `resolve_unique`; ambiguous → dropped, never stubbed);
  *   - its name is >= `explains_min_symbol_length` chars (default 4,
  *     config/narrative.rs:16 — applied both at automaton build,
  *     symbol_index.rs:44, and per match, explains.rs:148);
  *   - it occurs >= 2 times within the section (explains.rs:176);
  *   - it is not on the 46-word STOP_LIST (explains.rs:30);
  *   - the section has emitted fewer than `explains_max_per_section`
  *     edges (default 10), ranked by occurrence count desc then name asc
  *     (explains.rs:179).
  * Files over `max_input_kb` (default 256) are skipped whole
  * (explains.rs:127), as are non-narrative extensions (explains.rs:85).
  *
  * Spark-first shape: Aho-Corasick LeftmostLongest over a LITERAL
  * pattern set is exactly a longest-first ordered regex alternation —
  * both Java regex (Spark) and RE2 (DuckDB) scan leftmost with ordered
  * alternation, so `(longest|...|shortest)` reproduces the automaton's
  * match set, including the "HttpServer beats its Http substring
  * symbol" suppression the reference calls out (symbol_index.rs:58).
  * The symbol axis is per-tenant and config-sized → the compiled
  * pattern joins BROADCAST onto the corpus-shaped section scan; one
  * regexp pass per section, a groupBy keyed (doc, section, symbol)
  * whose shuffle is proportional to matches, and a broadcast resolution
  * join. No corpus-side explosion at any scale.
  */
object Explains {

  /** Words filtered out even when they look like code identifiers
    * (explains.rs:30 STOP_LIST, verbatim — a public rule table). */
  val StopList: Seq[String] = Seq(
    "self", "impl", "test", "main", "init", "drop", "send", "sync", "read", "from", "into", "next",
    "iter", "push", "poll", "copy", "move", "loop", "data", "name", "type", "path", "node", "file",
    "list", "true", "none", "some", "this", "that", "will", "with", "have", "been", "also", "when",
    "then", "each", "used", "only", "more", "than", "both", "most", "string", "result", "option",
    "error", "value", "index")

  /** Narrative-file + input-size gate over a frame carrying `file_path`
    * and `content` (explains.rs:85 is_narrative_file — case-folded
    * extension in md/markdown/txt — and :127 the byte-size cap). */
  def narrativeDocs(docs: DataFrame, maxInputKb: Int = 256): DataFrame =
    docs
      .filter(lower(regexp_extract(col("file_path"), "\\.([^./\\\\]+)$", 1))
        .isin("md", "markdown", "txt"))
      .filter(octet_length(col("content")) <= maxInputKb * 1024)

  /** symbol_name -> (n_nodes, node_id) per tenant: the automaton's
    * resolution map (symbol_index.rs:41 build — names under
    * `minSymbolLength` never enter; :112 resolve_unique — a name
    * resolves only when exactly one distinct node id bears it).
    */
  def resolutionOf(symbols: DataFrame, minSymbolLength: Int = 4): DataFrame =
    symbols
      .filter(length(col("symbol_name")) >= minSymbolLength)
      .groupBy(col("tenant_id"), col("symbol_name"))
      .agg(countDistinct(col("node_id")).as("n_nodes"), min(col("node_id")).as("node_id"))

  /** Per-tenant leftmost-longest alternation pattern over the symbol
    * names (the automaton twin). Names sort by length desc then name
    * asc and are \Q...\E-quoted (names containing a literal `\E` are
    * not supported — code identifiers never do).
    */
  def symbolPatternsOf(symbols: DataFrame, minSymbolLength: Int = 4): DataFrame =
    symbols
      .filter(length(col("symbol_name")) >= minSymbolLength)
      .select(col("tenant_id"), col("symbol_name")).distinct()
      .groupBy(col("tenant_id"))
      .agg(array_sort(collect_list(col("symbol_name")),
        (l, r) => when(length(l) =!= length(r), length(r) - length(l))
          .otherwise(when(l < r, -1).when(l > r, 1).otherwise(lit(0)))).as("names"))
      .select(col("tenant_id"),
        concat(lit("("),
          array_join(transform(col("names"),
            n => concat(lit("\\Q"), n, lit("\\E"))), "|"),
          lit(")")).as("pat"))

  /** EXPLAINS edges over a section-span frame (tenant_id, doc_id,
    * section_index, section_text, ...) and a symbol frame (tenant_id,
    * symbol_name, node_id). Returns one row per emitted edge with the
    * occurrence count and per-section rank.
    *
    * Scanning per-section text is equivalent to the reference's
    * whole-document scan + line_at_offset mapping (explains.rs:94-105):
    * symbol names contain no newlines, so no match crosses a section
    * boundary, and preamble text outside any span is simply absent
    * from the section axis.
    */
  def explainsOf(sections: DataFrame, symbols: DataFrame,
                 minSymbolLength: Int = 4, maxPerSection: Int = 10): DataFrame = {
    val patterns = symbolPatternsOf(symbols, minSymbolLength)
    val matches = sections
      .join(broadcast(patterns), Seq("tenant_id"))
      .select(col("tenant_id"), col("doc_id"), col("section_index"),
        explode(expr("regexp_extract_all(section_text, pat, 1)")).as("symbol"))
      // per-match gates (explains.rs:148-153): min length, stop list
      .filter(length(col("symbol")) >= minSymbolLength)
      .filter(!lower(col("symbol")).isin(StopList: _*))
    val counts = matches
      .groupBy(col("tenant_id"), col("doc_id"), col("section_index"), col("symbol"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2) // explains.rs:176 min-occurrence gate
    val resolution = resolutionOf(symbols, minSymbolLength)
      .filter(col("n_nodes") === 1) // unique resolution only — skipped
      // symbols never consume cap budget (explains.rs:186 continue)
      .withColumnRenamed("symbol_name", "symbol")
      .drop("n_nodes")
    val w = Window.partitionBy(col("tenant_id"), col("doc_id"), col("section_index"))
      .orderBy(col("n_occ").desc, col("symbol"))
    counts
      .join(broadcast(resolution), Seq("tenant_id", "symbol"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= maxPerSection) // explains.rs:183 per-section cap
  }

  /** The corpus symbol axis: per tenant, a fixed identifier set drawn
    * from the corpus vocabulary so occurrence counting happens on the
    * NATURAL prose (no planted mentions) —
    *   - 15 unconditionally unique names;
    *   - `merge` gains a second node for even tenants, `slow` for
    *     tenants divisible by 3 (tenant-varying ambiguity);
    *   - `hash` and `join` are ambiguous everywhere;
    *   - `value`/`data` resolve but sit on the stop list;
    *   - `agg`/`row`/`key` are under the 4-char automaton floor;
    *   - `windo` is a strict prefix of `window` — LeftmostLongest means
    *     it can never match (symbol_index.rs:58 semantics).
    */
  def corpusSymbols(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows: Seq[(String, Int, String)] =
      Seq("window", "batch", "spark", "filter", "stream", "customer", "query",
        "table", "column", "vector", "order", "small", "sort", "group", "scan")
        .map(n => (n, 0, "all")) ++ Seq(
        ("merge", 0, "all"), ("merge", 1, "even"),
        ("slow", 0, "all"), ("slow", 1, "mod3"),
        ("hash", 0, "all"), ("hash", 1, "all"),
        ("join", 1, "all"), ("join", 2, "all"),
        ("value", 0, "all"), ("data", 0, "all"), ("windo", 0, "all"),
        ("agg", 0, "all"), ("row", 0, "all"), ("key", 0, "all"))
    val defs = rows.toDF("symbol_name", "fidx", "cond")
    val tenants = Tables.documents(spark, dir)
      .select(col("source").as("tenant_id"),
        expr("CAST(substring(source, 4, 10) AS INT)").as("t")).distinct()
    tenants.crossJoin(broadcast(defs))
      .filter(col("cond") === "all" ||
        (col("cond") === "even" && col("t") % 2 === 0) ||
        (col("cond") === "mod3" && col("t") % 3 === 0))
      .select(col("tenant_id"), col("symbol_name"),
        concat(lit("node:"), col("tenant_id"), lit("/f"), col("fidx"),
          lit(".rs:"), col("symbol_name")).as("node_id"))
  }

  /** The corpus file-path scheme shared by the narrative edge queries:
    * ~8% `.rs` (never narrative), plus `.markdown`/`.txt`/uppercase
    * `.MD` variants exercising the extension case fold (txt counts for
    * EXPLAINS but not REFERENCES_DOC, per the two extractors' gates).
    */
  def corpusFilePath: Column =
    concat(col("source"), lit("/doc"), col("doc_id"),
      when(col("doc_id") % 12 === 7, ".rs")
        .when(col("doc_id") % 12 === 8, ".markdown")
        .when(col("doc_id") % 12 === 9, ".txt")
        .when(col("doc_id") % 12 === 10, ".MD")
        .otherwise(".md"))

  /** Section spans routed by FileKind exactly as the reference's
    * section extractor (sections.rs:106 is_supported_extension →
    * markdown ATX headings for md/markdown, blank-line paragraphs for
    * txt) over an already-gated narrative frame. */
  def routedSectionSpans(gated: DataFrame): DataFrame = {
    val ext = lower(regexp_extract(col("file_path"), "\\.([^./\\\\]+)$", 1))
    val common = Seq(col("tenant_id"), col("doc_id"), col("section_index"), col("section_text"))
    Narrative.sectionSpansOf(gated.filter(ext.isin("md", "markdown"))).select(common: _*)
      .unionByName(
        Narrative.textSectionSpansOf(gated.filter(ext === "txt")).select(common: _*))
  }

  /** doc_explains query: the corpus prose in its three-section markdown
    * shape (shared with doc_sections) scanned against the per-tenant
    * symbol axis. Sections route by FileKind: the ~8% `.txt` docs parse
    * as blank-line paragraphs (one paragraph here — the synthetic
    * content has no blank lines), the rest as ATX markdown.
    */
  def docExplains(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      col("source").as("tenant_id"), col("doc_id"),
      corpusFilePath.as("file_path"),
      Narrative.syntheticMarkdown(col("text")).as("content"))
    val sections = routedSectionSpans(narrativeDocs(docs))
    explainsOf(sections, corpusSymbols(spark, dir))
      .select(col("tenant_id"), col("doc_id"), col("section_index"),
        col("symbol"), col("node_id"), col("n_occ"), col("rnk"))
      .orderBy(col("doc_id"), col("section_index"), col("rnk"))
  }
}

/** ELABORATES edges — shallow narrative nodes linked to deeper ones
  * covering the same concept (idle/tasks/elaborates_maintenance.rs:
  * run_elaborates_pass + :150 generate_elaborates_edges). The reference
  * runs this as an idle-time single batch over all COVERS_TOPIC edges:
  * group by concept, and for every ordered depth pair (shallow < deep by
  * the DepthLevel ordinal, graph/mod.rs:327 — qualitative 0 <
  * introductory 1 < intermediate 2 < rigorous 3 < reference 4) link
  * every shallow node to every deep node, tenant `__global__`, source
  * `elaborates_task`. Edges with unparseable depth metadata are dropped
  * (elaborates_maintenance.rs:109 filter_map).
  *
  * Spark-first shape: ONE key-equality self-join on the concept id with
  * an ordinal inequality filter — shuffle proportional to per-concept
  * coverage pairs (the reference materializes exactly the same pair
  * set); a pathologically hot concept would take the skew-salting path
  * dedup_minhash demonstrates.
  */
object Elaborates {

  /** DepthLevel::as_ordinal (graph/mod.rs:327); null for strings
    * from_str rejects — the caller's drop-unparseable filter. */
  def depthOrdinal(depth: Column): Column =
    when(depth === "qualitative", 0)
      .when(depth === "introductory", 1)
      .when(depth === "intermediate", 2)
      .when(depth === "rigorous", 3)
      .when(depth === "reference", 4)

  /** ELABORATES edges over a COVERS_TOPIC frame (source_node_id,
    * concept_id, depth). */
  def elaboratesOf(covers: DataFrame): DataFrame = {
    // Pinned at explicit width (round 16): shallow and deep are BOTH
    // derived from this frame, and without the checkpoint the whole
    // covers derivation (the docSections parse chain) runs once per
    // join arm — the broadcast side cannot reuse the other arm's
    // exchange (measured: two full scan→Generate→Window chains in the
    // plan). The explicit repartition spreads the pair-generation join
    // across the session width: AQE otherwise coalesces the tiny
    // byte-sized covers frame to ~one partition and the join's
    // quadratic-per-concept output runs single-task (measured 3.6 of
    // 4.1 s wall on one core at sf0.1).
    val shufP = covers.sparkSession.sessionState.conf.numShufflePartitions
    val withOrd = covers
      .withColumn("ord", depthOrdinal(col("depth")))
      .filter(col("ord").isNotNull)
      .repartition(shufP, col("concept_id"))
      .localCheckpoint()
    val shallow = withOrd.select(col("concept_id"),
      col("source_node_id").as("shallow_id"), col("ord").as("shallow_ord"))
    val deep = withOrd.select(col("concept_id"),
      col("source_node_id").as("deep_id"), col("ord").as("deep_ord"))
    shallow.join(deep, Seq("concept_id"))
      .filter(col("shallow_ord") < col("deep_ord"))
      .select(lit("__global__").as("tenant_id"), col("concept_id"),
        col("shallow_id"), col("deep_id"),
        lit("elaborates").as("edge_type"),
        lit("elaborates_task").as("source_file"))
  }

  /** Depth-ADJACENT materialization of the same relation — the 100×
    * scale lever (SURVEY §4): instead of every shallower node × every
    * deeper node per concept, link each node only to the nodes at the
    * NEXT depth ordinal actually present in that concept. The
    * transitive closure of this edge set regenerates the full
    * `elaboratesOf` pair set exactly (every skipped level is bridged
    * through the intermediate level that caused it to be skipped —
    * "next present ordinal" guarantees the bridge is non-empty), so no
    * information is lost; stored volume drops from Σ level-pair
    * products to Σ ADJACENT level-pair products. Same single
    * key-equality shuffle on concept_id, plus one tiny
    * distinct-levels window (rows ∝ concepts × 5, broadcast-able).
    */
  def elaboratesAdjacentOf(covers: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Pinned at explicit width — same rationale as elaboratesOf, one
    // stronger: THREE arms (nextLevel, shallow, deep) derive from this
    // frame, so the unpinned plan ran the covers derivation three times.
    val shufP = covers.sparkSession.sessionState.conf.numShufflePartitions
    val withOrd = covers
      .withColumn("ord", depthOrdinal(col("depth")))
      .filter(col("ord").isNotNull)
      .repartition(shufP, col("concept_id"))
      .localCheckpoint()
    val nextLevel = withOrd.select(col("concept_id"), col("ord")).distinct()
      .withColumn("next_ord",
        lead(col("ord"), 1).over(
          Window.partitionBy("concept_id").orderBy("ord")))
      .filter(col("next_ord").isNotNull)
    val shallow = withOrd.select(col("concept_id"),
      col("source_node_id").as("shallow_id"), col("ord"))
    val deep = withOrd.select(col("concept_id"),
      col("source_node_id").as("deep_id"), col("ord").as("next_ord"))
    shallow.join(broadcast(nextLevel), Seq("concept_id", "ord"))
      .join(deep, Seq("concept_id", "next_ord"))
      .select(lit("__global__").as("tenant_id"), col("concept_id"),
        col("shallow_id"), col("deep_id"),
        lit("elaborates").as("edge_type"),
        lit("elaborates_task").as("source_file"))
  }

  /** VIRTUAL query form of the ELABORATES relation — the decade-3
    * posture (SURVEY §4) as a registered operator: at 100 TB neither
    * materialization survives (per-(concept, level) membership grows
    * linearly with the corpus over a BOUNDED concept axis, so the edge
    * set is quadratic in corpus density — BENCH_scale_x100_r13 records
    * both forms as deaths BY OUTPUT CONTRACT). A deployment therefore
    * stores only the linear COVERS_TOPIC frame (or its depth-adjacent
    * edge set) and answers elaborates queries PER CONCEPT, on demand.
    *
    * This operator is that query: given the queried concept ids, it
    *   1. prunes covers to those concepts FIRST (the predicate sits on
    *      the equi-join key, so Catalyst pushes it into the scan —
    *      everything downstream is sized by the QUERIED concepts, not
    *      the corpus);
    *   2. rebuilds the adjacent generator's per-concept DEPTH CHAIN
    *      (distinct present ordinals → lead());
    *   3. closes that chain transitively — the ≤5-ordinal axis closes
    *      in ≤4 hop-extension rounds, all on a frame of at most
    *      |concepts| × 10 rows. Closing at the LEVEL axis instead of
    *      over node edges is what makes on-demand closure cheap: the
    *      node-level closure of the adjacent edges reaches each
    *      (shallow, deep) pair once PER INTERMEDIATE PATH, so a naive
    *      edge closure needs a distinct over a super-quadratic frame,
    *      while the chain closure bridges each closed level pair with
    *      one join (ElaboratesSpec locks closure(adjacent) == full;
    *      the virtual spec locks this == full filtered to concepts);
    *   4. joins shallow membership × closed level pairs (broadcast) ×
    *      deep membership, SALTED: a concept-predicate query
    *      concentrates all work on ≤|concepts| join keys, so the deep
    *      side takes a hash(deep_id) salt and the shallow side
    *      replicates across the salt axis — the per-concept quadratic
    *      output spreads over saltBuckets × levels tasks instead of
    *      one straggler per concept.
    */
  def elaboratesVirtualOf(covers: DataFrame, concepts: Seq[String],
                          saltBuckets: Int = 32): DataFrame = {
    val filtered = covers
      .filter(col("concept_id").isin(concepts: _*))
      .withColumn("ord", depthOrdinal(col("depth")))
      .filter(col("ord").isNotNull)
    // the stored adjacent relation's level chain for the queried concepts
    val chain = filtered.select(col("concept_id"), col("ord")).distinct()
      .withColumn("next_ord",
        lead(col("ord"), 1).over(
          Window.partitionBy("concept_id").orderBy("ord")))
      .filter(col("next_ord").isNotNull)
      .select(col("concept_id").as("c"), col("ord").as("hop_lo"),
        col("next_ord").as("hop_hi"))
    // on-demand transitive closure of the chain, iterated to a
    // FIXPOINT (round-14 advice): a fixed round count silently
    // under-closes if depthOrdinal ever grows a 6th arm, so extend by
    // one hop until the closed count stops growing instead. The frame
    // is ≤ |concepts| × levels² rows, localCheckpoint'd so each round
    // is a millisecond-scale local job (and the covers scan runs once
    // for the chain, not once per round).
    // The hop side joins under RENAMED columns — a closed("c") ===
    // chain("c") self-join silently resolves both sides to one column
    // (Spark's trivially-true-predicate trap) and would close across
    // concepts.
    val hop = chain.select(col("c").as("hop_c"), col("hop_lo"), col("hop_hi"))
      .localCheckpoint()
    var closed = hop
      .select(col("hop_c").as("c"), col("hop_lo").as("lo"), col("hop_hi").as("hi"))
    var prevCount = -1L
    var closedCount = closed.count()
    while (closedCount > prevCount) {
      prevCount = closedCount
      closed = closed.unionByName(
        closed.join(hop, col("c") === col("hop_c") && col("hi") === col("hop_lo"))
          .select(col("c"), col("lo"), col("hop_hi").as("hi"))
      ).distinct().localCheckpoint()
      closedCount = closed.count()
    }
    val levelPairs = closed
      .select(col("c").as("concept_id"), col("lo"), col("hi"))
    val shallow = filtered.select(col("concept_id"),
      col("source_node_id").as("shallow_id"), col("ord").as("lo"))
    val deep = filtered.select(col("concept_id"),
      col("source_node_id").as("deep_id"), col("ord").as("hi"),
      pmod(xxhash64(col("source_node_id")), lit(saltBuckets)).cast("int").as("salt"))
    shallow
      .join(broadcast(levelPairs), Seq("concept_id", "lo"))
      .withColumn("salt", explode(lit((0 until saltBuckets).toArray)))
      .join(deep, Seq("concept_id", "hi", "salt"))
      .select(lit("__global__").as("tenant_id"), col("concept_id"),
        col("shallow_id"), col("deep_id"),
        lit("elaborates").as("edge_type"),
        lit("elaborates_task").as("source_file"))
  }

  /** The COVERS_TOPIC frame both elaborates queries derive from: each
    * doc_sections row covers a deterministic concept (doc_id % 60) at
    * ITS OWN estimated depth, so the depth mix (reference overviews,
    * introductory bodies, rigorous appendixes) produces real
    * shallow→deep structure per concept.
    */
  private def coversFrame(spark: SparkSession, dir: String): DataFrame =
    Narrative.docSections(spark, dir).select(
      concat(lit("sec:"), col("doc_id"), lit(":"), col("section_index"))
        .as("source_node_id"),
      concat(lit("concept-"), (col("doc_id") % 60).cast("string")).as("concept_id"),
      col("depth"))

  /** doc_elaborates query: the reference's FULL enumeration — per
    * concept, every shallower node × every deeper node
    * (elaborates_maintenance.rs:150 generate_elaborates_edges inserts
    * all ordinal pairs). This is the registered/oracle shape so the
    * harness pins reference parity edge-for-edge; the depth-ADJACENT
    * storage optimization is the SEPARATE `doc_elaborates_adjacent`
    * query below.
    */
  def docElaborates(spark: SparkSession, dir: String): DataFrame =
    elaboratesOf(coversFrame(spark, dir))
      .orderBy(col("concept_id"), col("shallow_id"), col("deep_id"))

  /** doc_elaborates_adjacent query: the depth-ADJACENT materialization
    * of the same relation — the 100× scale lever (SURVEY §4). The
    * transitive closure of this edge set regenerates the full
    * `docElaborates` pair set exactly (ElaboratesSpec locks the
    * closure equivalence, including ordinal-gap bridging), so a 100 TB
    * deployment stores this form and closes on demand; stored volume
    * drops from Σ level-pair products to Σ adjacent level-pair
    * products (1.106M → 833k edges at sf0.1).
    */
  def docElaboratesAdjacent(spark: SparkSession, dir: String): DataFrame =
    elaboratesAdjacentOf(coversFrame(spark, dir))
      .orderBy(col("concept_id"), col("shallow_id"), col("deep_id"))

  /** The registered virtual query's concept predicate: 3 of the
    * corpus's 60 concept lanes (1/20 of the axis — a realistic
    * "elaborates for THESE topics" ask). */
  val VirtualConcepts: Seq[String] = Seq("concept-7", "concept-23", "concept-42")

  /** doc_elaborates_virtual query: the concept-predicate virtual form
    * — edge-identical to `docElaborates` restricted to
    * [[VirtualConcepts]] (the oracle is the full-enumeration CTE with
    * that WHERE clause), but computed from the pruned covers scan via
    * the closed level chain, so the work is sized by the queried
    * concepts and spread across the salt axis. This is the ONLY
    * elaborates form that completes at decade 3, where both
    * materializations are recorded deaths (BENCH_scale_x100_r13).
    */
  def docElaboratesVirtual(spark: SparkSession, dir: String,
                           ordered: Boolean = true): DataFrame =
    docElaboratesVirtualFor(spark, dir, VirtualConcepts, ordered = ordered)

  /** Parameterized form — the OracleProps randomization axis (round
    * 14, family 9): any concept subset, any salt-bucket count; the
    * generated DuckDB twin regenerates the WHERE list from the same
    * subset. */
  def docElaboratesVirtualFor(spark: SparkSession, dir: String,
                              concepts: Seq[String], saltBuckets: Int = 32,
                              ordered: Boolean = true): DataFrame = {
    val edges = elaboratesVirtualOf(coversFrame(spark, dir), concepts, saltBuckets)
    // ordered=false is the SINK form (the dedupMinhashCappedOf
    // precedent): at decade 3 the presentation sort is a global range
    // exchange over the full queried-slice output — callers writing to
    // a partitioned sink should skip it.
    if (ordered)
      edges.orderBy(col("concept_id"), col("shallow_id"), col("deep_id"))
    else edges
  }
}

/** REFERENCES_DOC edges from markdown cross-references
  * (narrative/references.rs): inline `[text](target)` and
  * reference-style `[label]: target` links, remote/anchor targets
  * dropped, fragments stripped, paths resolved against the source
  * file's directory and normalized lexically, one edge per UNIQUE
  * resolved target per document.
  *
  * Pure projection work — two regexp_extract_all passes over one
  * pruned scan, a codegen'd path-normalization fold, and a distinct
  * keyed (doc, target). No join at any scale.
  */
object DocReferences {

  /** Inline `[text](target)` — references.rs:27. The reference scans
    * line-by-line; excluding `\n` from both character classes makes the
    * whole-content scan equivalent (no part of a match may cross a
    * line).
    */
  private val InlinePattern = """\[[^\]\n]+\]\(([^)\n]+)\)"""

  /** Reference-style `[label]: target` — references.rs:28, `^`
    * anchored per line (multiline flag replaces the per-line loop;
    * `[^\S\n]` is the reference's `\s+` minus the newline a per-line
    * scan could never consume).
    */
  private val RefStylePattern = """(?m)^\[[^\]\n]+\]:[^\S\n]+(\S+)"""

  /** URL-scheme / anchor prefixes marking non-local targets
    * (references.rs:41, case-folded check :45). */
  private def isRemoteOrAnchor(target: Column): Column =
    Seq("http://", "https://", "mailto:", "#")
      .map(p => lower(target).startsWith(p)).reduce(_ || _)

  /** Lexical `.`/`..` normalization (references.rs:59 normalize_path):
    * a fold over `/`-components — `.` and empty segments skip, `..`
    * pops whatever precedes it (including the root marker, matching
    * Rust's `Components` behaviour where `/../a` collapses to `a`).
    */
  def normalizePath(p: Column): Column = {
    val cleaned = filter(split(p, "/"), c => c =!= "" && c =!= ".")
    val comps = when(p.startsWith("/"), concat(array(lit("/")), cleaned))
      .otherwise(cleaned)
    val folded = aggregate(comps, array().cast("array<string>"),
      (acc, c) => when(c === "..", slice(acc, lit(1), greatest(size(acc) - 1, lit(0))))
        .otherwise(array_append(acc, c)))
    when(size(folded) > 0 && folded.getItem(0) === "/",
      concat(lit("/"), array_join(slice(folded, lit(2), greatest(size(folded) - 1, lit(0))), "/")))
      .otherwise(array_join(folded, "/"))
  }

  /** REFERENCES_DOC edges over a (tenant_id, doc_id, file_path,
    * content) frame: one row per unique resolved local target, with
    * the resolved path and its filename (the target node identity —
    * references.rs:189-191).
    */
  def referencesOf(docs: DataFrame): DataFrame = {
    // only markdown files are processed (references.rs:88 — txt is not
    // a REFERENCES_DOC source, unlike EXPLAINS)
    val md = docs.filter(
      lower(regexp_extract(col("file_path"), "\\.([^./\\\\]+)$", 1))
        .isin("md", "markdown"))
    val keys = Seq(col("tenant_id"), col("doc_id"), col("file_path"))
    val raw = md.select(keys :+
      explode(regexp_extract_all(col("content"), lit(InlinePattern), lit(1))).as("raw_target"): _*)
      .unionByName(md.select(keys :+
        explode(regexp_extract_all(col("content"), lit(RefStylePattern), lit(1))).as("raw_target"): _*))
    val parent = when(col("file_path").contains("/"),
      regexp_extract(col("file_path"), "^(.*)/[^/]*$", 1)).otherwise("")
    raw
      .filter(!isRemoteOrAnchor(col("raw_target")))
      // strip_fragment (references.rs:51): everything before the first #
      .withColumn("path_part", substring_index(col("raw_target"), "#", 1))
      .filter(col("path_part") =!= "")
      // Path::join semantics: an absolute right side replaces the parent
      .withColumn("joined",
        when(col("path_part").startsWith("/"), col("path_part"))
          .otherwise(when(parent === "", col("path_part"))
            .otherwise(concat(parent, lit("/"), col("path_part")))))
      .withColumn("target_path", normalizePath(col("joined")))
      .select(col("tenant_id"), col("doc_id"), col("file_path"), col("target_path"))
      .distinct() // seen_targets dedup (references.rs:184) — per doc run
      .withColumn("target_filename", regexp_extract(col("target_path"), "([^/]*)$", 1))
  }

  /** doc_references query: deterministic link scaffolding around the
    * corpus prose — inline local/remote/anchor/mailto targets,
    * `..`-relative and fragment-carrying paths, a duplicate link, and
    * reference-style definitions (one conditional on doc_id so edge
    * counts vary per doc). Paths reuse the shared corpus scheme, so
    * `.rs`/`.txt` docs are excluded here.
    */
  def docReferences(spark: SparkSession, dir: String): DataFrame = {
    def mod(k: Int): Column = (col("doc_id") % k).cast("string")
    val content = concat(
      lit("# Doc\n"),
      lit("See [guide](./guide"), mod(5), lit(".md) and [spec](specs/spec"),
      mod(3), lit(".md) here.\n"),
      substring(col("text"), 1, 60), lit("\n"),
      lit("Visit [site](https://example.com/page) or [mail](mailto:x@y.z) or [anchor](#top).\n"),
      lit("Back [root](../shared/common.md) plus [dup](./guide"), mod(5),
      lit(".md) again.\n"),
      lit("Jump [frag](./install.md#quickstart) now.\n"),
      lit("[api]: refs/api-"), mod(4), lit(".md\n"),
      lit("[ext]: https://remote.example.com/x\n"),
      when(col("doc_id") % 3 === 0, "[extra]: ./extra.md\n").otherwise(""))
    val docs = Tables.documents(spark, dir).select(
      col("source").as("tenant_id"), col("doc_id"),
      Explains.corpusFilePath.as("file_path"),
      content.as("content"))
    referencesOf(docs)
      .orderBy(col("doc_id"), col("target_path"))
  }
}
