package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The full client search pipeline — run_search_pipeline
  * (client/src/search/flow.rs:198, mirroring search-helpers.ts
  * finalizeResults:309-342) composed end-to-end from the already-landed
  * pieces: per-collection dense+sparse legs → scope relevance decay →
  * RRF fusion → sort → tier diversity → slice.
  *
  * Faithful phase semantics:
  *  - legs (flow_collect.rs:107 search_collection): each collection
  *    fetches `limit*2` per leg; the score threshold applies at QUERY
  *    level only — dense ≥ θ, sparse ≥ θ*0.5 (search-qdrant.ts:105/:135)
  *    — never post-fusion (the scratchpad rule in flow.rs:16).
  *  - decay (scope.rs:69 apply_relevance_decay, the CLIENT decay-map
  *    variant — the daemon's fixed-triple variant is scoped_search):
  *    per-tenant multipliers, tenants ABSENT from the map get 0.4,
  *    results with NO tenant_id stay unchanged; applied to the combined
  *    tagged list BEFORE fusion and re-sorted, so the decay-induced
  *    ordering feeds the rank-based RRF.
  *  - fusion (fusion.rs:159 apply_rrf_fusion): 0-based rank WITHIN each
  *    leg of the decay-sorted flat list, `1/(60+rank+1)` summed per
  *    `collection:id` key; pass-through when either leg is empty
  *    (the TS line-170 rule — decided here on the bounded leg frame).
  *    Rust's stable sort leaves equal-score order unspecified-but-
  *    deterministic; both engines totalize ties by (collection, id) —
  *    the same refinement policy as queryRelatedOf.
  *  - diversity + slice (flow_collect.rs:63 diversify_slice_convert):
  *    tier diversity runs only when >1 collection was searched, with
  *    spillover backfill (SourceDiversity.diversifyOf), then the slice
  *    to `limit`.
  *
  * Relational shape: two corpus scans (embedding + text legs), each
  * ending in per-collection TakeOrdered-style ranks; everything after
  * the legs operates on the bounded ≤ 4·limit·2-row tagged frame —
  * windows and one bounded fold, shuffle ∝ result rows. The cosine is
  * the native codegen'd CosineSimilarity expression; rounded to 6
  * before the θ compare on both engines (the Grouping.affinityGroupsOf
  * precedent).
  */
object SearchPipeline {

  /** The TS `?? 0.4` default for tenants absent from the decay map
    * (scope.rs:19). */
  val DefaultDecayMultiplier = 0.4

  /** search_pipeline: hybrid search over the two-collection corpus
    * (projects = even ids, libraries = odd), tenants `t<id%3>` with a
    * no-tenant slice (id%7=3), decay map t0→1.0 / t1→0.8 (t2 absent →
    * 0.4). */
  def searchPipeline(spark: SparkSession, dir: String,
                     query: String = "dup vector window fast",
                     limit: Int = 12, threshold: Double = 0.02): DataFrame = {
    val fetch = limit * 2
    val collection = when(pmod(col("id"), lit(2)) === 0, lit("projects"))
      .otherwise(lit("libraries"))
    val tenant = when(pmod(col("id"), lit(7)) =!= 3,
      concat(lit("t"), pmod(col("id"), lit(3))))
    val perColl = Window.partitionBy(col("collection"))
      .orderBy(col("score").desc, col("id"))

    val emb = Tables.embeddings(spark, dir)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val dense = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("id"),
        round(graft.GraftFunctions.cosine(col("embedding"), col("q_emb")), 6)
          .as("score"))
      .filter(col("score") >= threshold)
      .withColumn("collection", collection)
      .withColumn("leg_rn", row_number().over(perColl))
      .filter(col("leg_rn") <= fetch)
      .withColumn("search_type", lit("semantic"))

    val sparse = SparseSearch.bm25ScoresForQuery(
        spark, Tables.documents(spark, dir), query)
      .select(col("doc_id").as("id"), col("score"))
      .filter(col("score") >= threshold * 0.5)
      .withColumn("collection", collection)
      .withColumn("leg_rn", row_number().over(perColl))
      .filter(col("leg_rn") <= fetch)
      .withColumn("search_type", lit("keyword"))

    val tagged = dense.unionAll(sparse)
      .withColumn("tenant_id", tenant)
      // Phase 2b: client decay map {t0: 1.0, t1: 0.8}, absent → 0.4,
      // no tenant → unchanged.
      .withColumn("score", col("score") *
        when(col("tenant_id").isNull, lit(1.0))
          .when(col("tenant_id") === "t0", lit(1.0))
          .when(col("tenant_id") === "t1", lit(0.8))
          .otherwise(lit(DefaultDecayMultiplier)))
      .drop("leg_rn")
      .localCheckpoint() // bounded (≤ 4·fetch rows); pins the leg frame

    // Phase 3: RRF — pass-through when either leg is empty.
    val legCounts = tagged.groupBy(col("search_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bothLegs = legCounts.getOrElse("semantic", 0L) > 0 &&
      legCounts.getOrElse("keyword", 0L) > 0
    val fused =
      if (!bothLegs) tagged
      else {
        val ranked = tagged.withColumn("leg_rank", row_number().over(
          Window.partitionBy(col("search_type"))
            .orderBy(col("score").desc, col("collection"), col("id"))))
        ranked
          .groupBy(col("collection"), col("id"))
          .agg(sum(lit(1.0) / (lit(60.0) + col("leg_rank"))).as("score"),
            first(col("tenant_id")).as("tenant_id"))
          .withColumn("search_type", lit("hybrid"))
      }

    // Phases 4-6: tier diversity (>1 collection searched) + slice.
    val list = fused
      .withColumn("query_id", lit(0L))
      .withColumn("source",
        concat(col("collection"), lit(":"), coalesce(col("tenant_id"), lit("unknown"))))
    // Re-attach payload columns by (id, score): unique per fused row; in
    // the pass-through arm the same id can ride both legs, distinguished
    // by its per-leg decayed score (identical doubles from the pinned
    // tagged frame).
    val attrs = list.select(col("id").as("a_id"), col("score").as("a_score"),
      col("collection"), col("tenant_id"), col("search_type"))
    SourceDiversity.diversifyOf(list)
      .filter(col("out_rnk") <= limit)
      .join(broadcast(attrs), col("id") === col("a_id") && col("score") === col("a_score"))
      .select(col("out_rnk"), col("id"), col("collection"), col("tenant_id"),
        col("search_type"), col("tier"), col("kept"), round(col("score"), 6).as("score"))
      .orderBy(col("out_rnk"))
  }
}
