package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Search-quality evaluation — the known-item eval's metric math
  * (cli/commands/benchmark/quality/metrics.rs, #135) and path/glob
  * matching (path_match.rs), re-expressed over a ranked-results frame.
  * The reference feeds these pure functions from a live SearchResponse;
  * the batch twin feeds them from a deterministic ranked frame over the
  * corpus — the same separation its own unit layer uses.
  *
  * Per query (metrics.rs:125 evaluate_query), given the ranked top-k
  * raw paths (duplicates kept) and the deduplicated expectations:
  *  - topN hit on RAW ranks (a user reads duplicates too, :155-157);
  *    first_relevant_rank 1-based, None when no hit.
  *  - recall@10 = matched distinct expectations / expectations, over
  *    the DEDUPED paths (:160); precision@10 = relevant deduped paths /
  *    deduped paths (:167); duplicate_rate = 1 − deduped/raw (:170);
  *    MRR = 1/first_relevant_rank else 0 (:175). Safe 0 on empty
  *    denominators (:279 ratio).
  *  - Normalization (path_match.rs:27 normalize_path): backslashes →
  *    '/', trim, repeated leading-'./' and trailing-'/' strips, the
  *    workspace-root prefix removed by plain string ops, defensive
  *    leading '/'/'./' strip; top-k is taken BEFORE the empty-drop.
  *  - Expectations with a glob metachar (* ? [ {, path_match.rs:78)
  *    match via the TS-parity glob grammar: `**／` any number of whole
  *    leading segments, `**` across separators, `*` within a segment,
  *    `?` one non-separator, `[..]`/`[!..]` one non-separator class.
  *    The vectorized twin translates the glob to an anchored regex in
  *    the COLUMN domain (expectations are data); the unterminated-`[`
  *    literal fallback and '/'-in-class pathologies are out of the
  *    translated grammar (documented refinement — the reference's own
  *    gold sets use none).
  *
  * Mode summary (metrics.rs:195): plain means of each per-query metric
  * (+ mean latency); verdict (metrics.rs:226 classify): two independent
  * gates — top-3 useful rate ≥ 0.8 and recall@10 ≥ 0.7 — 0 fails =
  * good, 1 = mixed, 2 = poor, each failure contributing the
  * reference's exact reason string with `pct` one-decimal formatting.
  *
  * Shape: the eval is one groupBy over (query) after a broadcast join
  * against the per-query expectation axis; the summary a second tiny
  * groupBy over (mode). Shuffle ∝ queries × top-k.
  */
object QualityMetrics {

  val TopK = 10
  val Top3UsefulRate = 0.8 // QualityThresholds::default (metrics.rs:57)
  val RecallAt10 = 0.7

  /** path_match.rs:27 normalize_path as a column (root is config). */
  def normalizePath(p: Column, workspaceRoot: String): Column = {
    def stripEnds(c: Column): Column =
      regexp_replace(regexp_replace(c, "^(\\./)+", ""), "/+$", "")
    val cand = stripEnds(regexp_replace(trim(p), "\\\\", "/"))
    val root = {
      // strip_ends(to_posix(trim(root))) precomputed in Scala
      var r = workspaceRoot.trim.replace('\\', '/')
      while (r.startsWith("./")) r = r.substring(2)
      while (r.endsWith("/")) r = r.dropRight(1)
      r
    }
    val stripped =
      if (root.isEmpty) cand
      else when(cand === root, lit(""))
        .when(cand.startsWith(root + "/"),
          cand.substr(lit(root.length + 2), length(cand)))
        .otherwise(cand)
    regexp_replace(regexp_replace(stripped, "^/+", ""), "^(\\./)+", "")
  }

  /** Glob → anchored regex, in the column domain (the translated
    * grammar of path_match.rs:120 glob_match): escape regex specials,
    * placeholder the `**`/`**／` tokens, then expand. `[!` → `[^/`
    * keeps the class non-separator like the reference's pre-check. */
  def globToRegex(g: Column): Column = {
    val esc = regexp_replace(g, "([.(){}+^$|\\\\])", "\\\\$1")
    val negClass = regexp_replace(esc, "\\[!", "[^/")
    val starStarSlash = regexp_replace(negClass, "\\*\\*/", "")
    val starStar = regexp_replace(starStarSlash, "\\*\\*", "")
    val star = regexp_replace(starStar, "\\*", "[^/]*")
    val q = regexp_replace(star, "\\?", "[^/]")
    val a = regexp_replace(q, "", "(?:.*/)?")
    val b = regexp_replace(a, "", ".*")
    concat(lit("^"), b, lit("$"))
  }

  /** Is the expectation a glob (path_match.rs:78: any of `* ? [ {`)? */
  def isGlob(e: Column): Column = e.rlike("[*?\\[{]")

  /** §3 `*Of` form of evaluate_query over frames.
    * `ranked`: (qid, rank, raw_path) — rank 1-based in result order,
    * duplicates kept. `expected`: (qid, expected_raw). Returns one row
    * per qid with the reference's per-query metrics. Queries present
    * in `expected` but absent from `ranked` still evaluate (all-zero,
    * like an empty SearchResponse). */
  def evaluateQueriesOf(ranked: DataFrame, expected: DataFrame,
                        workspaceRoot: String, topK: Int = TopK): DataFrame = {
    // Expectations: normalize, drop empties, dedupe (order is
    // irrelevant to any metric — only membership counts).
    val exp = expected
      .withColumn("e_norm", normalizePath(col("expected_raw"), workspaceRoot))
      .filter(col("e_norm") =!= "")
      .select(col("qid"), col("e_norm")).distinct()
      .withColumn("e_is_glob", isGlob(col("e_norm")))
      .withColumn("e_rx", when(col("e_is_glob"), globToRegex(col("e_norm"))))
      // Materialized (gold sets are ≤ a few rows per query by contract):
      // e_rx stacks globToRegex's 8 regexp_replaces onto normalizePath's
      // CASE tower, and inlining THAT into the broadcast join's match
      // CASE was half of the janino 64KB blow-up (see corpusRanked's
      // barrier note) — past the barrier the join compares plain
      // columns.
      .localCheckpoint()
    val nExp = exp.groupBy(col("qid")).agg(count(lit(1)).as("n_expected"))

    // Raw paths: top-k FIRST, then normalize, then drop empties —
    // ranks re-densified over the survivors (metrics.rs:138).
    // Materialized after the normalize projection (bounded: ≤ topK rows
    // per query by the rank filter — the eval's working set at ANY
    // scale): without the barrier, filter pushdown substitutes the
    // whole normalizePath tower into the empty-drop predicate and the
    // downstream double consumption (per-query aggregates + matched-
    // expectation distinct) re-derives it again — the composed stage's
    // generated method measured 7716 B = 96 % of HotSpot's SILENT 8 KB
    // huge-method compile-skip cliff (JITAUDIT_r14's one watch item;
    // round-15 board #2). Past the barrier the tower is evaluated
    // exactly once per row and every stage's methods sit far under the
    // JitBytecodeLockSpec lock.
    val raw = ranked.filter(col("rank") <= topK)
      .withColumn("path", normalizePath(col("raw_path"), workspaceRoot))
      .select(col("qid"), col("rank"), col("path"))
      .localCheckpoint()
      .filter(col("path") =!= "")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rank"))))
      .select(col("qid"), col("r"), col("path"))
      // first-occurrence flag = the dedupe-preserving-order set
      .withColumn("dd", row_number().over(
        Window.partitionBy(col("qid"), col("path")).orderBy(col("r"))) === 1)

    // Relevance: per (row × expectation) on the broadcast expectation
    // axis; `matched` carries which expectation hit (for recall).
    val joined = raw.join(broadcast(exp), Seq("qid"), "left")
      .withColumn("m", col("e_norm").isNotNull &&
        when(col("e_is_glob"), regexp_like(col("path"), col("e_rx")))
          .otherwise(col("path") === col("e_norm")))

    // Row-level relevance (any expectation), then per-query aggregates.
    val rows = joined.groupBy(col("qid"), col("r"), col("path"), col("dd"))
      .agg(max(col("m")).as("rel"))
    val perQuery = rows.groupBy(col("qid")).agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("dd"), 1L).otherwise(0L)).as("n_deduped"),
      min(when(col("rel"), col("r"))).as("first_relevant_rank"),
      sum(when(col("dd") && col("rel"), 1L).otherwise(0L)).as("relevant_unique"))

    // Matched expectations (distinct, against deduped paths — identical
    // membership to "any path", since dedupe only removes repeats).
    val matchedExp = joined.filter(col("m"))
      .select(col("qid"), col("e_norm")).distinct()
      .groupBy(col("qid")).agg(count(lit(1)).as("matched_expected"))

    nExp
      .join(perQuery, Seq("qid"), "left")
      .join(matchedExp, Seq("qid"), "left")
      .na.fill(0L, Seq("n_raw", "n_deduped", "relevant_unique", "matched_expected"))
      .select(col("qid"), col("n_raw"), col("n_deduped"), col("n_expected"),
        col("matched_expected"), col("first_relevant_rank").cast("int").as("first_relevant_rank"),
        coalesce(col("first_relevant_rank") === 1, lit(false)).as("top1_hit"),
        coalesce(col("first_relevant_rank") <= 3, lit(false)).as("top3_hit"),
        col("first_relevant_rank").isNotNull.as("top10_hit"),
        round(when(col("n_deduped") === 0, 0.0)
          .otherwise(col("relevant_unique") / col("n_deduped")), 6).as("precision_at10"),
        round(when(col("n_expected") === 0, 0.0)
          .otherwise(col("matched_expected") / col("n_expected")), 6).as("recall_at10"),
        round(when(col("n_raw") === 0, 0.0)
          .otherwise(lit(1.0) - col("n_deduped") / col("n_raw")), 6).as("duplicate_rate"),
        round(coalesce(lit(1.0) / col("first_relevant_rank"), lit(0.0)), 6).as("mrr"))
  }

  /** summarize_mode + classify over evaluations tagged with a `mode`
    * and a per-query `latency_ms`. One row per mode with the averaged
    * metrics, the grade, and the reference's reason strings. */
  def verdictOf(evals: DataFrame): DataFrame = {
    def pct(c: Column): Column = concat(format_string("%.1f", c * 100), lit("%"))
    val s = evals.groupBy(col("mode")).agg(
      count(lit(1)).as("runs"),
      avg(col("top1_hit").cast("double")).as("top1_hit_rate"),
      avg(col("top3_hit").cast("double")).as("top3_hit_rate"),
      avg(col("top10_hit").cast("double")).as("top10_hit_rate"),
      avg(col("precision_at10")).as("precision_at10"),
      avg(col("recall_at10")).as("recall_at10"),
      avg(col("mrr")).as("mrr"),
      avg(col("duplicate_rate")).as("duplicate_rate"),
      avg(col("latency_ms")).as("avg_latency_ms"))
    val r1 = when(col("top3_hit_rate") < Top3UsefulRate,
      concat(lit("top-3 useful rate "), pct(col("top3_hit_rate")),
        lit(" is below "), pct(lit(Top3UsefulRate))))
    val r2 = when(col("recall_at10") < RecallAt10,
      concat(lit("recall@10 "), pct(col("recall_at10")),
        lit(" is below "), pct(lit(RecallAt10))))
    s.withColumn("reasons", concat_ws("; ", r1, r2))
      .withColumn("n_failed",
        r1.isNotNull.cast("int") + r2.isNotNull.cast("int"))
      .withColumn("grade",
        when(col("n_failed") === 0, "good")
          .when(col("n_failed") === 1, "mixed")
          .otherwise("poor"))
      .select(col("mode"), col("runs"),
        round(col("top1_hit_rate"), 6).as("top1_hit_rate"),
        round(col("top3_hit_rate"), 6).as("top3_hit_rate"),
        round(col("top10_hit_rate"), 6).as("top10_hit_rate"),
        round(col("precision_at10"), 6).as("precision_at10"),
        round(col("recall_at10"), 6).as("recall_at10"),
        round(col("mrr"), 6).as("mrr"),
        round(col("duplicate_rate"), 6).as("duplicate_rate"),
        round(col("avg_latency_ms"), 6).as("avg_latency_ms"),
        col("grade"), col("reasons"))
  }

  /** The corpus ranked frame: 40 query lanes over the documents axis,
    * ranked by (n_chars desc, doc_id) and capped at 12 raw rows so the
    * top-k bound is live. The path cycle (7 names) is coarser than the
    * 12-row cap, so every lane's raw list carries genuine duplicates
    * (the duplicate_rate / raw-vs-deduped arms). */
  def corpusRanked(spark: SparkSession, dir: String): DataFrame = {
    val names = Seq("main.py", "util.ts", "app.yaml", "data.json",
      "index.html", "lib.rs", "test_core.py")
    val dirs = Seq("src", "tests", "lib", "config", "e2e")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("qid", pmod(col("doc_id"), lit(40)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rank") <= 12)
      .withColumn("raw_path", concat(lit("/proj/"), col("source"), lit("/"),
        element_at(array(dirs.map(lit): _*),
          (pmod(col("doc_id"), lit(5)) + 1).cast("int")),
        lit("/"),
        element_at(array(names.map(lit): _*),
          (pmod(col("doc_id"), lit(7)) + 1).cast("int"))))
      .select(col("qid"), col("rank"), col("raw_path"))
      // Materialized (≤ 480 rows by the rank cap — bounded at ANY SF):
      // downstream consumers re-derive expectations from this frame and
      // normalize/glob-compile the path column, and without the barrier
      // Catalyst inlines this projection's concat/element_at tower into
      // every one of those expressions — the composed search_quality /
      // quality_verdict projections grew past janino's 64KB method
      // limit and silently dropped their stages to interpreted
      // evaluation (round-13 board #4; the whole-stage-codegen
      // fallback observed in every sbt/verify run).
      .localCheckpoint()
  }

  /** The gold expectations, tuned so all three verdict grades appear:
    * a literal at a mode-dependent rank (mode 0 → rank 1 → good; mode
    * 1 → cycling 1..6 → top-3 gate fails alone → mixed; mode 2 →
    * rank 9 → poor), the `**／`+`*` glob on the lanes whose directory
    * segment can satisfy it and the `?`-glob on mode-1 lanes (hit AND
    * miss arms both live), and never-matching literals on mode-2 lanes
    * (zero-recall arm; lanes ≡ 2 mod 12 additionally lose their
    * literal — the top10-miss / None-rank arm). */
  def corpusExpected(spark: SparkSession, dir: String): DataFrame = {
    val ranked = corpusRanked(spark, dir)
    val mode = pmod(col("qid"), lit(3))
    val targetRank = when(mode === 0, lit(1))
      .when(mode === 1, (pmod(col("qid"), lit(6)) + 1).cast("int"))
      .otherwise(lit(9))
    val literal = ranked
      .filter(col("rank") === targetRank && pmod(col("qid"), lit(12)) =!= 2)
      .select(col("qid"),
        normalizePath(col("raw_path"), "/proj").as("expected_raw"))
    val lanes = ranked.select(col("qid")).distinct()
    val glob = lanes
      .filter(pmod(col("qid"), lit(3)) === 0 && pmod(col("qid"), lit(5)) === 4)
      .select(col("qid"), lit("**/e2e/*.ts").as("expected_raw"))
      .unionByName(lanes.filter(pmod(col("qid"), lit(3)) === 1)
        .select(col("qid"), lit("src?/*/app.yaml").as("expected_raw")))
    val never = lanes
      .filter(pmod(col("qid"), lit(3)) === 2)
      .select(col("qid"), lit("missing/never.txt").as("expected_raw"))
    literal.unionByName(glob).unionByName(never)
  }

  /** search_quality query: evaluate every lane at top-k 10 with the
    * `/proj` workspace root stripped. */
  def searchQuality(spark: SparkSession, dir: String): DataFrame =
    evaluateQueriesOf(corpusRanked(spark, dir), corpusExpected(spark, dir),
        workspaceRoot = "/proj")
      .orderBy(col("qid"))

  /** quality_verdict query: three modes over the lanes (qid % 3), a
    * deterministic latency axis, summary + graded verdict per mode. */
  def qualityVerdict(spark: SparkSession, dir: String): DataFrame = {
    val evals = evaluateQueriesOf(corpusRanked(spark, dir),
        corpusExpected(spark, dir), workspaceRoot = "/proj")
      .withColumn("mode",
        when(pmod(col("qid"), lit(3)) === 0, "semantic")
          .when(pmod(col("qid"), lit(3)) === 1, "hybrid")
          .otherwise("sparse"))
      .withColumn("latency_ms",
        (lit(10.0) + pmod(col("qid") * 7, lit(40)).cast("double")))
    verdictOf(evals).orderBy(col("mode"))
  }
}
