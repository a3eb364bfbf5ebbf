package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Plan-shape assertions: the properties that make these operators hold
  * up at 100 TB, checked against the actual physical plans.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("single-table scans push their filters into parquet") {
    val p = plan("retrieve_scroll")
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]")
      || p.contains("EqualTo(lang,en)"), p.take(2000))
  }

  test("scans prune columns (grep reads only doc_id + text)") {
    val p = plan("grep_search")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(2000))
  }

  test("star joins broadcast every dimension") {
    val p = plan("q5_join_agg")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    assert(!p.contains("CartesianProduct"), "no cartesian in the star join")
  }

  test("corpus_pipeline reads the corpus exactly once: zero parquet scans in the plan") {
    // The composed pipeline pins its single documents scan in a
    // localCheckpoint and every stage reads that frame (or a derived
    // pinned frame) — so the FINAL physical plan must contain no file
    // scan at all. A `Scan parquet`/FileScan appearing here means a
    // stage re-derived its input from disk and the shared-frame
    // contract broke (at 100 TB that is N extra corpus scans).
    for (name <- Seq("corpus_pipeline", "corpus_pipeline_fast",
        "corpus_pipeline_fast_capped")) {
      val p = plan(name)
      assert(!p.contains("FileScan") && !p.contains("Scan parquet"),
        s"$name must read only the checkpointed corpus frame:\n" + p.take(2000))
      assert(!p.contains("CartesianProduct"), s"no cartesian in $name")
    }
  }

  test("global windows only rank limit-bounded or allowlisted frames — every registered query") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LocalRelation, OneRowRelation, Window => LWindow, WindowGroupLimit}

    // The mechanical lock the round-10 verdict assigned: a window with
    // NO (or an all-foldable, i.e. single-valued) partition spec moves
    // every input row to one task. That is correct ONLY when the input
    // frame is bounded — by a limit below it in the plan, by being
    // driver-local config data, or by an aggregation whose group count
    // is structurally small (which the plan cannot show, hence the
    // explicit allowlist with per-query justifications). Any NEW
    // corpus-scaled global window fails here instead of at 100 TB.
    val allow: Map[String, String] = Map(
      // one row per shuffle partition: the per-slice offset prefix sum
      // (Packing.scala:81) ranks ≤ spark.sql.shuffle.partitions rows
      "pack_sequences" -> "slice-offset window over one row per shuffle partition",
      "corpus_pipeline" -> "inherits pack_sequences' slice-offset window",
      "corpus_pipeline_fast" -> "inherits pack_sequences' slice-offset window",
      "corpus_pipeline_fast_capped" -> "inherits pack_sequences' slice-offset window",
      // config/registry-sized daemon state, not corpus rows
      "project_registry" -> "ranks the registered-projects table (daemon registry state)",
      "rules_select" -> "budget prefix sum over the memory-rules table (config-sized)",
      // result-page re-ranking: inputs are the rank-filtered legs
      // (≤ limit rows per leg) fused into one page
      "search_pipeline" -> "diversity walk over the fused top-k page, not the corpus",
      // the reference's autoincrement canonical-id over the distinct
      // keyword vocabulary (≥2-doc keywords) — vocabulary-scaled by
      // construction; a corpus-scaled input would be a tag-store bug
      "tag_tree" -> "canonical-id assignment over the distinct keyword vocabulary",
      // list_tracked_files' list+count contract: per-scenario rank and
      // pre-limit total over that scenario's FILTERED matches — the
      // count semantics forces one pass over the match set
      "tracked_search" -> "per-scenario rank/total over scenario-filtered matches")

    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val bad = plan.collect {
          case w: LWindow if w.partitionSpec.forall(_.foldable) =>
            val limited = w.child.collectFirst {
              case _: GlobalLimit => (); case _: LocalLimit => ()
              // a rank-filter Catalyst rewrote into a per-partition
              // top-k pushdown (InferWindowGroupLimit) is bounded too
              case _: WindowGroupLimit => ()
            }.nonEmpty
            val configOnly = w.child.collect {
              case l if l.children.isEmpty => l
            }.forall(l => l.isInstanceOf[LocalRelation] ||
              l.isInstanceOf[OneRowRelation])
            if (limited || configOnly) None
            else Some(s"$name(order=${w.orderSpec.map(_.child.sql).mkString(",")};" +
              s" leaves=${w.child.collect { case l if l.children.isEmpty =>
                l.getClass.getSimpleName }.distinct.mkString("/")})")
        }.flatten
        if (bad.nonEmpty && !allow.contains(name)) bad else Nil
    }
    assert(offenders.isEmpty,
      s"unbounded global windows in:\n${offenders.mkString("\n")}\n— bound " +
        "the frame with a limit or add an allowlist justification")
  }

  test("LSH candidate generation is a key-equality join, not a cross product") {
    val p = plan("ann_lsh")
    assert(!p.contains("CartesianProduct"), "LSH must not cross-join")
  }

  test("minhash pair generation is a key-equality join, not a cross product") {
    val p = plan("dedup_minhash")
    assert(!p.contains("CartesianProduct"), "minhash must not cross-join")
  }

  test("minhash join-backs carry no forced broadcast of the corpus") {
    // The signature/shingle join-backs must be AQE-decided equi-joins on
    // doc id: a broadcast() hint would ship the entire shingle table to
    // every executor at 100 TB. Assert no broadcast strategy hint
    // survives into the optimized plan (AQE is free to broadcast at
    // runtime while the side is genuinely small — that's the point).
    val q = SparkEntry.queries("dedup_minhash")(spark, sfDir)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("strategy=broadcast"),
      "dedup_minhash must not hint broadcast:\n" + optimized.take(3000))
  }

  test("simhash blocking is a key-equality join, not a cross product") {
    val p = plan("dedup_simhash")
    assert(!p.contains("CartesianProduct"), "simhash must not cross-join")
  }

  test("top-k plans use TakeOrderedAndProject, not a global sort") {
    assert(plan("q3_join").contains("TakeOrderedAndProject"))
    assert(plan("dense_topk").contains("TakeOrderedAndProject"))
  }

  test("dense search broadcasts the query side") {
    val p = plan("dense_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("aggregations partial-aggregate before the shuffle") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(1500))
  }

  test("cross-modal search broadcasts the encoded query side, never the assets") {
    val p = plan("multimodal_search")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), "asset side must stream past the queries")
  }

  test("keyword tag pipeline joins are key-equality, never cross products") {
    assert(!plan("keyword_tags").contains("CartesianProduct"))
    assert(!plan("keyword_baskets").contains("CartesianProduct"))
  }

  test("skew join salts the hot key: merge join on (skew_key, salt), no broadcast") {
    val q = SparkEntry.queries("skew_join")(spark, sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), "forced large-large path:\n" + p.take(2000))
    assert(!p.contains("BroadcastHashJoin"), "no side may broadcast in the demo")
    assert("SortMergeJoin \\[skew_key#\\d+, salt#\\d+\\]".r.findFirstIn(p).isDefined,
      "join key must be the salted composite:\n" + p.take(2000))
    // The replicated side carries the salt explode
    assert(p.contains("Generate explode"), "errors side must replicate per salt")
  }

  test("skew join: salted and straggler plans agree on results") {
    val salted = operators.SkewJoin.skewJoin(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val unsalted = operators.SkewJoin.skewJoinUnsalted(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(salted.nonEmpty && salted == unsalted)
  }

  // The order-statistics rewrite must produce the identical integers as
  // the pair enumeration — the distributed prefix-sum (range slices +
  // per-slice windows + offset join) is only admissible because this
  // equality holds, tie rows included (strict cv > ev at equal values).
  test("skew join: analytic rank twin equals the enumerated pair counts") {
    val enumerated = operators.SkewJoin.skewJoin(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val analytic = operators.SkewJoin.skewJoinRank(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(analytic.nonEmpty && analytic == enumerated)
  }

  test("semantic rerank broadcasts the 1-row mean, never the candidates") {
    val p = plan("semantic_rerank")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("doc_explains joins the symbol pattern and resolution broadcast, never a cross") {
    val p = plan("doc_explains")
    assert(!p.contains("CartesianProduct"), "pattern/resolution axes are keyed joins")
    assert(p.contains("BroadcastHashJoin"),
      "the per-tenant pattern and resolution sides must broadcast:\n" + p.take(2000))
  }

  test("code_comments proximity search is an equi-join on (doc, seq), never lines^2") {
    val p = plan("code_comments")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Generate explode"),
      "the 5-key sequence explode must bound the candidate join:\n" + p.take(2000))
  }

  test("doc_elaborates pairs by concept key equality, never a cross product") {
    val p = plan("doc_elaborates")
    assert(!p.contains("CartesianProduct"),
      "shallow x deep pairing must join on the concept id:\n" + p.take(2000))
  }

  test("doc_elaborates_virtual prunes the corpus scan by the concept predicate") {
    // The decade-3 contract: the concept IN-list is a function of
    // doc_id alone, so it must push through the section window and
    // land in the parquet scan's DataFilters — the virtual query
    // reads (and sectionizes) only the queried concepts' documents.
    val p = plan("doc_elaborates_virtual")
    assert(!p.contains("CartesianProduct"),
      "virtual pairing must join on (concept_id, level, salt):\n" + p.take(2000))
    val scanLine = p.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("concept-7"),
      "concept predicate must reach the scan's DataFilters:\n" + scanLine.take(2000))
    // the salt axis must be live: deep-side spread over explode(0..S)
    assert(p.contains("Generate explode"),
      "salt replication must survive optimization:\n" + p.take(2000))
  }

  test("doc_references is pure projection work — no join at all") {
    val p = plan("doc_references")
    assert(!p.contains("Join"), "link extraction + normalization is join-free:\n" + p.take(1500))
  }

  test("regex search pushes its literal contains-prefilter into the scan") {
    val p = plan("regex_search")
    assert(!p.contains("Join"), "two-phase regex search is a pure filter:\n" + p.take(1500))
    assert(p.contains("StringContains") || p.contains("Contains"),
      "the literal prefilter must survive into the scan as a pushable " +
        "predicate ahead of the regex verify:\n" + p.take(2000))
  }

  test("glob search pushes the literal path prefix work to one scan") {
    val p = plan("glob_search")
    assert(!p.contains("Join"), "glob scoping is a pure filter, no join:\n" + p.take(1500))
    assert(p.contains("StartsWith") || p.contains("startswith"),
      "prefix pre-filter must survive into the plan:\n" + p.take(2000))
  }

  test("tag affinity pair generation is a key-equality join, not a cross product") {
    val p = plan("tag_affinity")
    assert(!p.contains("CartesianProduct"), "profiles must join on tag")
  }

  test("debounce is one partitioned window over a single scan — no join, no cross") {
    val p = plan("debounce_events")
    assert(p.contains("Window"), p.take(1500))
    assert(!p.contains("Join"), "debounce must not join:\n" + p.take(1500))
  }

  test("file classification joins the rule table broadcast, never shuffled") {
    val p = plan("file_classify")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the ~170-row extension table must broadcast:\n" + p.take(2000))
  }

  test("dependency grouping self-joins on the dependency name, not a cross product") {
    val p = plan("dependency_groups")
    assert(!p.contains("CartesianProduct"), "profiles must join on dep name")
  }

  test("component assignment broadcasts the component table") {
    val p = plan("component_detect")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), "assignment must stay keyed per tenant")
  }

  test("project_groups unions three grouping strategies without a cross product") {
    val p = plan("project_groups")
    assert(p.contains("Union"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("file routing is map-only: no join, no shuffle beyond the output sort") {
    val q = SparkEntry.queries("file_routes")(spark, sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "route_file is a literal-set projection:\n" + p.take(1500))
  }

  test("tier-1 concept tagging joins the concept table broadcast") {
    val p = plan("tier1_tags")
    assert(p.contains("Broadcast"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("tier-2 taxonomy classification broadcasts the taxonomy, never the corpus") {
    val p = plan("tier2_tags")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 190-row taxonomy must be the broadcast side:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("cross-boundary hops are key-equality frontier joins, never a cross product") {
    // The hop joins themselves run inside the per-level localCheckpoint
    // jobs (explicit broadcast() hints on the frontier, node axis, and
    // reached set — see CrossBoundary.crossBoundaryOf), so the FINAL
    // plan only shows the cap stage: assert no cartesian anywhere and
    // that the concept-attribution join broadcasts.
    val p = plan("cross_boundary")
    assert(!p.contains("CartesianProduct"), "cross_boundary must not cross-join")
    assert(p.contains("BroadcastHashJoin"),
      "the cap stage's concept attribution must broadcast:\n" + p.take(2000))
  }

  test("find_path BFS joins the frontier broadcast on (tenant, node)") {
    val p = plan("find_path")
    assert(!p.contains("CartesianProduct"), "find_path must not cross-join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("orphan detection is one left-anti join, no cross product") {
    val p = plan("graph_orphans")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftAnti"), "orphans must anti-join the endpoint set:\n" + p.take(2000))
  }

  test("scoped search broadcasts the member set over one scored scan") {
    val p = plan("scoped_search")
    assert(!p.contains("CartesianProduct"), "scoped_search must not cross-join")
    assert(p.contains("BroadcastHashJoin"),
      "the tenant member set must broadcast:\n" + p.take(2000))
  }

  test("search pipeline: the query vector broadcasts; no cartesian beyond it") {
    // The dense leg is one corpus scan against a broadcast 1-row query
    // vector (BroadcastNestedLoopJoin with a 1-row side is the intended
    // scalar-broadcast shape, same as dense_topk); everything after the
    // legs is windows over the bounded tagged frame.
    val p = plan("search_pipeline")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("line diff is map-only per document: no corpus join before the flatMap") {
    // The diff itself runs as a typed flatMap over (doc, old, new) rows;
    // the only joins sit in the deterministic corpus derivation and the
    // op/old-line joint projections — none may be a cross product.
    val p = plan("line_diff")
    assert(!p.contains("CartesianProduct"), "line_diff must not cross-join")
  }

  test("parent context resolves through key-equality joins only") {
    val p = plan("parent_context")
    assert(!p.contains("CartesianProduct"), "parent_context must not cross-join")
  }

  test("list tree explodes ancestor prefixes — no cross product, pruned scan") {
    val p = plan("list_tree")
    assert(!p.contains("CartesianProduct"), "list_tree must not cross-join")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      "the tree needs only doc_id from the corpus:\n" + p.take(2000))
  }

  test("TUI views ride broadcast joins onto the registry — never a shuffle join") {
    for (name <- Seq("tui_projects", "tui_libraries", "tui_dashboard")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"), s"$name:\n" + p.take(2000))
      assert(!p.contains("SortMergeJoin"),
        s"$name: per-tenant maps are config-sized — must broadcast:\n" + p.take(2000))
      assert(!p.contains("CartesianProduct"), s"$name must not cross-join")
    }
  }

  test("dequeue selection is one scan + broadcast activity map + bounded top-k") {
    val p = plan("queue_dequeue")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
    assert(!p.contains("SortMergeJoin"), "the registry side must broadcast")
  }

  test("triage caps the slice at 100 BEFORE the probe joins") {
    // The rank window runs on the failed scan; every downstream lookup
    // (watch/tracked/exists) joins the ≤100-row slice via broadcast.
    val p = plan("queue_triage")
    assert(!p.contains("SortMergeJoin"),
      "probe lookups must broadcast against the capped slice:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("DLQ entry derivation and failure routing are join-free map passes") {
    for (name <- Seq("dlq_entries", "failure_routing")) {
      val p = plan(name)
      assert(!p.contains("Join"), s"$name must be a single-scan projection:\n" +
        p.take(2000))
    }
  }

  test("queue browser: every lookup map broadcasts; no cartesian beyond the 1-row anchor") {
    val p = plan("tui_queue")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3,
      s"names/kinds/roots maps must broadcast, got $broadcasts:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SortMergeJoin"),
      "the config-sized registry maps must never shuffle-join")
  }

  test("tracked search prunes the documents scan to its two source columns") {
    val p = plan("tracked_search")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("branch discovery joins scan and tracked on the (path, hash) key") {
    val p = plan("branch_discovery")
    assert(!p.contains("CartesianProduct"), "classification must equi-join")
  }

  test("debug-log scenarios reuse one checkpointed parse — no shuffle joins") {
    val p = plan("debug_logs")
    assert(!p.contains("SortMergeJoin"),
      "the since anchor is a broadcast 1-row frame:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("co-occurrence betweenness pairs equi-join on tenant, never cross") {
    val p = plan("cooccur_centrality")
    assert(!p.contains("CartesianProduct"),
      "the shared-endpoint pair join must keep its tenant equi-key")
  }

  test("canonical payload building is a join-free scalar pass") {
    val p = plan("canonical_payloads")
    assert(!p.contains("Join"),
      "stableStringify is a map-side UDF — no join belongs here:\n" +
        p.take(2000))
  }

  // Codegen lock for the graft native expressions (round-8 board #8).
  // Plan-string stars can NOT witness the property that matters here:
  // a CodegenFallback expression still sits inside a WholeStageCodegen
  // span (its generated code just calls interpreted eval), and several
  // hosts wrap inputs in Spark's own higher-order functions
  // (ArrayFilter/ArrayTransform ARE CodegenFallback), which de-star
  // the enclosing Project regardless of our expressions. Two checks
  // that do witness it:
  //  1. None of the ten expression classes mixes in CodegenFallback —
  //     the exact demotion a lazy future port would reach for.
  //  2. Every doGenCode COMPILES and produces correct values when
  //     codegen is the ONLY allowed path (factoryMode=CODEGEN_ONLY,
  //     fallback=false): the default confs swallow Janino failures by
  //     silently re-planning interpreted, so a doGenCode broken by a
  //     Spark upgrade would otherwise surface only as a bench
  //     regression. Value agreement with interpreted eval is pinned
  //     separately by NativeExpressionPropSpec's equality twins.
  test("graft native expressions are codegen-only: no fallback mixin, doGenCode compiles") {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    val F = graft.GraftFunctions
    val cands = expr("array(struct(0 AS idx, 'alpha' AS term, CAST(1.0 AS DOUBLE) AS rel), " +
      "struct(1 AS idx, 'beta' AS term, CAST(0.5 AS DOUBLE) AS rel))")
    val sims = expr("array(struct('alpha' AS ta, 'beta' AS tb, CAST(0.04 AS DOUBLE) AS s))")
    val exprs: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "graft_cosine" -> F.cosine(expr("array(1.0D, 2.0D, 2.0D)"), expr("array(1.0D, 2.0D, 2.0D)")),
      "graft_sorted_intersect_count" -> F.sortedIntersectCount(
        expr("array(1L, 5L, 9L)"), expr("array(5L, 9L, 11L)")),
      "graft_simhash64" -> F.simhash64(expr("array('alpha', 'beta', 'alpha')")),
      "graft_simhash_bits" -> F.simhashBits(expr("array(3L, -7L, 3L)")),
      "graft_minhash_signature" -> F.minhashSignature(
        expr("array(10L, 20L, 30L)"), Array(7L, 11L), Array(3L, 5L)),
      "graft_minhash_band_buckets" -> F.minhashBandBuckets(
        expr("array(10, 20, 30, 40)"), 2, 2),
      "graft_shingle_hashes" -> F.shingleHashes(lit("hello world")),
      "graft_gram_counts" -> F.gramCounts(lit("hello world")),
      "graft_int_array_match_count" -> F.intArrayMatchCount(
        expr("array(1, 2, 3)"), expr("array(1, 9, 3)")),
      "graft_mmr_select" -> F.mmrSelect(cands, sims, 2, 0.7, 0.64),
      "graft_basket_assign" -> F.basketAssign(cands, sims, expr("array('alpha')"), 0.16))
    for ((name, c) <- exprs) {
      val leaf = org.apache.spark.sql.graft.Bridge.expression(c).collectFirst {
        case e if e.getClass.getName.startsWith("org.apache.spark.sql.graft") => e
      }
      assert(leaf.isDefined, s"$name: no graft expression under the builder column")
      assert(!leaf.get.isInstanceOf[CodegenFallback],
        s"$name: ${leaf.get.getClass.getSimpleName} mixes in CodegenFallback — " +
          "the hot loop it was built to close is interpreted again")
    }
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    s2.conf.set("spark.sql.codegen.fallback", "false")
    val row = s2.range(1).select(exprs.map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12, "cosine of identical vectors")
    assert(String.valueOf(row.get(1)) == "2", "sorted intersect count")
    assert(row.getSeq[Any](4).length == 2, "minhash signature positions")
    assert(row.getSeq[Any](5).length == 2, "band buckets, one per band")
    assert(row.getSeq[Any](6).nonEmpty, "shingle hashes of 'hello world'")
    assert(String.valueOf(row.get(8)) == "2", "int array match count")
    assert(row.getSeq[String](9) == Seq("alpha", "beta"), "mmr selects both tags")
  }

  // Host-coverage half of the codegen lock: the seven expressions that
  // survive into their registered query's (post-localCheckpoint)
  // physical plan must still be THERE — a refactor silently replacing
  // one with a composed-column form would keep tests green and only
  // show up as a bench regression. graft_shingle_hashes /
  // graft_minhash_signature / graft_gram_counts are exercised inside
  // eagerly-materialized checkpoint stages and never appear in the
  // result's plan; their usage is pinned at the source level by the
  // operators' own specs.
  test("graft native expressions appear in their host queries' plans") {
    val hosts = Seq(
      "graft_cosine" -> "dense_topk",
      "graft_int_array_match_count" -> "dedup_minhash",
      "graft_sorted_intersect_count" -> "dedup_minhash",
      "graft_simhash64" -> "dedup_simhash",
      "graft_simhash_bits" -> "dedup_simhash_oracle",
      "graft_mmr_select" -> "keyword_tags",
      "graft_basket_assign" -> "keyword_baskets")
    val plans = hosts.map(_._2).distinct.map(q => q -> plan(q)).toMap
    for ((exprName, host) <- hosts)
      assert(plans(host).contains(exprName + "("),
        s"$exprName not found in $host's plan — host moved? update the lock")
  }

  test("quality_repetition is map-only: no shuffle anywhere in the plan") {
    // every repetition metric is in-row array arithmetic; an Exchange
    // would mean corpus state leaked in (the final orderBy sorts the
    // SMALL result and is exempt: check the pre-sort subtree by
    // asserting the only exchange is the rangepartitioning sort)
    val p = plan("quality_repetition")
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(p).map(_.group(1)).toList
    assert(exchanges.forall(_ == "rangepartitioning"),
      s"non-sort exchange in a map-only plan: $exchanges\n" + p.take(2000))
  }

  test("lm_quality cuts the vocabulary with TakeOrdered, not a global sort") {
    val p = plan("lm_quality")
    assert(p.contains("TakeOrderedAndProject"),
      "vocab top-K must plan as TakeOrderedAndProject:\n" + p.take(2000))
  }

  test("decontaminate broadcasts the benchmark grams, never the candidates") {
    val q = SparkEntry.queries("decontaminate")(spark, sfDir)
    val optimized = q.queryExecution.optimizedPlan.toString
    // exactly the eval-gram frame carries the hint (bounded by
    // construction); the candidate side must not
    val hints = "strategy=broadcast".r.findAllIn(optimized).length
    assert(hints == 1,
      s"expected exactly one broadcast hint (the eval grams), got $hints")
  }
}
