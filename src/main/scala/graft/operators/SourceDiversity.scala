package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier-based source-diversity re-ranking — the OTHER half of the
  * reference's diversity layer (the compounding-penalty half is
  * `diversity_rerank`, SparseSearch.applyDiversityPenalty).
  *
  * Two faithful variants share one engine:
  *
  *  - the CLIENT pipeline variant (client/src/qdrant/fusion.rs:271
  *    `diversify_results`, mirroring `search-diversity.ts`): group the
  *    score-sorted list into tiers (a result joins the tier while
  *    `|tier_top - score| <= threshold`, the top being the FIRST
  *    element of the tier — fusion.rs:316 build_score_tiers), round-robin
  *    interleave each tier by source in first-appearance order
  *    (fusion.rs:341 interleave_tier), walk tiers in order applying the
  *    global `max_per_source` cap, and BACKFILL over-cap spillover at the
  *    tail until the original count is restored (fusion.rs:299-305) — a
  *    pure reordering, nothing dropped.
  *  - the DAEMON variant (daemon source_diversity/tier.rs:44
  *    `diversify_results`): same tiers + interleave + cap, but no
  *    spillover — over-cap rows are dropped and the output may shrink.
  *
  * Source keys differ per variant and are computed by the caller:
  * client `source_key` is `collection:library_name` with a JS-falsy
  * empty-string fall-through to `collection:tenant_id ?? unknown`
  * (fusion.rs:116); daemon `extract_source` is the bare
  * `library_name → tenant_id → "unknown"` chain (source_diversity/
  * mod.rs:30). Diversity metrics: client `compute_diversity_score`
  * returns 1.0 on empty (fusion.rs:252); the daemon's returns 0.0
  * (tier.rs:150) — both are `unique/total` otherwise, computed on the
  * OUTPUT slice.
  *
  * Relational shape: only the tier assignment is sequential (each
  * boundary depends on the running tier top), and it folds over ONE
  * collected per-query top-k array (bounded by the search limit,
  * ≤ hundreds of rows) via the codegen'd `aggregate` HOF — the same
  * bounded-fold pattern as graph_fusion's examined walk. Everything
  * else (interleave order, caps, spillover order, metrics) is windows
  * keyed by (query, tier, source): round-robin interleaving IS the sort
  * `(tier, index-within-source, source-first-appearance)`, and the
  * global cap IS `row_number over (query, source) <= max` in walk
  * order. Shuffle ∝ result-list rows, never corpus rows; the corpus
  * scan feeding the list is the upstream search operator's.
  */
object SourceDiversity {

  /** DEFAULT_DIVERSITY_CONFIG (fusion.rs:242 = search-diversity.ts):
    * max_per_source 3, score_tier_threshold 0.05 (the daemon default,
    * tier.rs:29, is identical). */
  val MaxPerSource = 3
  val TierThreshold = 0.05

  /** Tier-diversify a scored result list. Input columns: `query_id`
    * (list axis), `id` (long, the score-desc tiebreak), `score`
    * (double), `source` (the variant's source key), plus any carry-through
    * columns. Output adds `tier` (1-based), `kept` (under-cap), and the
    * final `out_rnk`; `spillover=false` (daemon) drops over-cap rows.
    */
  def diversifyOf(results: DataFrame, maxPerSource: Int = MaxPerSource,
                  threshold: Double = TierThreshold,
                  spillover: Boolean = true): DataFrame = {
    // One array per query, sorted score desc / id asc (the reference
    // sorts by score before diversifying; id totalizes equal scores).
    val sorted = results
      .groupBy(col("query_id"))
      .agg(array_sort(
        collect_list(struct(col("score"), col("id"), col("source"))),
        (l, r) =>
          when(l("score") > r("score"), -1).when(l("score") < r("score"), 1)
            .when(l("id") < r("id"), -1).when(l("id") > r("id"), 1)
            .otherwise(0)).as("arr"))

    // The sequential tier fold (build_score_tiers): a new tier opens
    // when |tier_top - score| > threshold; the top is the OPENING
    // element's score, not a running max.
    val tiered = sorted.withColumn("tiers", expr(
      s"""aggregate(arr,
         |  named_struct('tiers', cast(array() as array<int>),
         |               'cur', 0, 'top', cast(null as double)),
         |  (acc, x) -> if(acc.top is null or abs(acc.top - x.score) > ${threshold}D,
         |    named_struct('tiers', array_append(acc.tiers, acc.cur + 1),
         |                 'cur', acc.cur + 1, 'top', x.score),
         |    named_struct('tiers', array_append(acc.tiers, acc.cur),
         |                 'cur', acc.cur, 'top', acc.top)),
         |  acc -> acc.tiers)""".stripMargin))

    val exploded = tiered
      .select(col("query_id"), posexplode(arrays_zip(col("arr"), col("tiers"))))
      .select(col("query_id"), col("pos"),
        col("col.arr.score").as("score"), col("col.arr.id").as("id"),
        col("col.arr.source").as("source"), col("col.tiers").as("tier"))

    // interleave_tier: round-robin by source in first-appearance order
    // == sort (tier, index-within-source, source-first-position).
    val wSrcTier = Window.partitionBy(col("query_id"), col("tier"), col("source"))
    val k = row_number().over(wSrcTier.orderBy(col("pos"))) - 1
    val srcPos = min(col("pos")).over(wSrcTier)
    val walked = exploded
      .withColumn("k", k)
      .withColumn("src_pos", srcPos)
      .withColumn("walk_rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("tier"), col("k"), col("src_pos"))))

    // The global per-source cap in walk order; a skipped (over-cap) row
    // never consumes a slot, so "kept" is exactly the source's first
    // maxPerSource rows in walk order.
    val capped = walked.withColumn("kept",
      row_number().over(Window.partitionBy(col("query_id"), col("source"))
        .orderBy(col("walk_rn"))) <= maxPerSource)

    val out =
      if (spillover)
        // Backfill restores the full count: kept rows first (walk
        // order), then spillover in walk order (fusion.rs:299-305).
        capped.withColumn("out_rnk", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("kept").desc, col("walk_rn"))))
      else
        capped.filter(col("kept")).withColumn("out_rnk",
          row_number().over(Window.partitionBy(col("query_id")).orderBy(col("walk_rn"))))

    out.select(col("query_id"), col("out_rnk"), col("id"), col("score"),
      col("source"), col("tier"), col("kept"))
  }

  /** `unique sources / total` over the output slice, per query. */
  private def divScore(of: Column): Column =
    round(size(collect_set(of).over(Window.partitionBy(col("query_id"))))
      .cast("double") /
      count(lit(1)).over(Window.partitionBy(col("query_id"))), 6)

  /** The scored corpus result list both registered queries diversify:
    * the hybrid-RRF top-30 with deterministic plateau scores (six tiers
    * of five — exact doubles in both engines, the same monotone
    * stand-in device as diversity_rerank) and the reference's payload
    * columns with every fallback arm reachable: `library_name` present
    * (id%5=0), EMPTY STRING (id%5=1 — the JS-falsy fall-through),
    * else absent; `tenant_id` absent at id%7=3 (the `unknown` arm);
    * `collection` alternates projects/libraries. */
  def scoredList(spark: SparkSession, dir: String, k: Int = 30): DataFrame =
    SparseSearch.hybridRrf(spark, dir, k = k)
      .select(col("id"), col("rnk"),
        (lit(4.0) - lit(0.2) * floor((col("rnk") - 1) / 5)
          - lit(0.01) * pmod(col("rnk") - 1, lit(5))).as("score"),
        when(pmod(col("id"), lit(2)) === 0, lit("projects"))
          .otherwise(lit("libraries")).as("collection"),
        when(pmod(col("id"), lit(5)) === 0,
          concat(lit("lib"), pmod(col("id"), lit(2))))
          .when(pmod(col("id"), lit(5)) === 1, lit("")).as("library_name"),
        when(pmod(col("id"), lit(7)) =!= 3,
          concat(lit("t"), pmod(col("id"), lit(3)))).as("tenant_id"))
      .withColumn("query_id", lit(0L))

  /** diversify_tiers: the client pipeline variant (spillover backfill,
    * `collection:source` keys with the empty-library fall-through). */
  def diversifyTiers(spark: SparkSession, dir: String): DataFrame = {
    val list = scoredList(spark, dir).withColumn("source",
      concat(col("collection"), lit(":"),
        coalesce(when(col("library_name") =!= "", col("library_name")),
          col("tenant_id"), lit("unknown"))))
    diversifyOf(list, spillover = true)
      .withColumn("div_score", divScore(col("source")))
      .drop("query_id")
      .orderBy(col("out_rnk"))
  }

  /** diversify_strict: the daemon variant (tier.rs) — bare
    * `library_name → tenant_id → unknown` source keys (empty string is
    * PRESENT for the daemon — only the client has the JS-falsy check),
    * over-cap rows dropped, plus the daemon's diversity metrics over
    * the output slice (tier.rs:146 diversity_score / :160
    * file_diversity_score; file key = file_path → relative_path → id,
    * mod.rs:55 — derived here as `f<id%4>` at id%6!=2, `r<id%3>` at
    * id%9!=5, else the id string). */
  def diversifyStrict(spark: SparkSession, dir: String): DataFrame = {
    val list = scoredList(spark, dir).withColumn("source",
      coalesce(col("library_name"), col("tenant_id"), lit("unknown")))
    val file = coalesce(
      when(pmod(col("id"), lit(6)) =!= 2, concat(lit("f"), pmod(col("id"), lit(4)))),
      when(pmod(col("id"), lit(9)) =!= 5, concat(lit("r"), pmod(col("id"), lit(3)))),
      col("id").cast("string"))
    diversifyOf(list, spillover = false)
      .withColumn("file", file)
      .withColumn("div_score", divScore(col("source")))
      .withColumn("file_div_score", divScore(col("file")))
      .drop("query_id")
      .orderBy(col("out_rnk"))
  }
}
