package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The tags-CLI query layer (cli/src/commands/tags/{summary,search,
  * stats}.rs) — the read-side analytics the `wqm tags` subcommands run
  * over the daemon-maintained keywords / tags / canonical_tags store:
  *
  *  - `tags summary` (summary.rs:21 show_summary): per-tenant tag
  *    frequency — GROUP BY tag over tag_type='concept' rows, COUNT
  *    (DISTINCT doc_id) + AVG(score), ORDER BY doc_count DESC LIMIT top.
  *  - `tags search` (search.rs:23 search_tags): collection-wide
  *    `tag LIKE '%q%'` concept search grouped by (tag, tenant), top 50
  *    by doc_count, with tenant ids mapped through the watch-folder
  *    display-name map (data/tenants name_map — the same basename +
  *    collision-suffix map as the perf report, [[PerfStats.tenantNamesOf]]).
  *  - `tags stats` (stats.rs:26 show_stats): per-tenant extraction
  *    statistics — distinct-doc count over keywords, avg keywords/doc,
  *    avg concept tags/doc, canonical-tag count. The reference issues
  *    four point queries per tenant (N+1 into SQLite); the batch twin
  *    is three grouped frames joined on tenant.
  *
  * The store itself is daemon state; here it is synthesized
  * deterministically over the documents axis: keywords = the nlp.rs
  * term-frequency table ([[SparseSearch.termFreq]] — the tokenizer the
  * keyword pipeline feeds), concept tags = each document's top-5 terms
  * by (tf DESC, term), one 'path' tag per document exercising the
  * tag_type filter, and canonical tags = the distinct (tenant, tag)
  * concept set at tf ≥ 2 (the stable, repeated-evidence tags — a count
  * proxy for the canonical store the hierarchy builder maintains).
  * All scores are integer-arithmetic–derived doubles so the DuckDB
  * oracle reproduces them bit-for-bit.
  *
  * The reference's LIMIT has no tie-break (SQLite order under equal
  * doc_count is unspecified); both engines here break ties by tag
  * (then tenant) so the cutoff is well-defined.
  *
  * Scale: every query is one or two hash aggregations over the token
  * table — shuffle ∝ distinct (doc, term); the name map and tenant
  * axis are config-sized broadcasts.
  */
object TagStoreOps {

  /** Documents with the store's tenant/collection axes. */
  private def docMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("source").as("tenant_id"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit("libraries"))
        .otherwise(lit("projects")).as("collection"))

  /** The keywords table: (tenant, collection, doc, keyword, score) —
    * nlp-tokenizer term frequencies with a tf-saturation score
    * (tf / (tf + 1.2), the BM25 k1 the keyword pipeline uses). */
  def keywordsStore(spark: SparkSession, dir: String): DataFrame =
    SparseSearch.termFreq(Tables.documents(spark, dir))
      .join(docMeta(spark, dir), "doc_id")
      .select(col("tenant_id"), col("collection"), col("doc_id"),
        col("term").as("keyword"),
        (col("tf").cast("double") / (col("tf") + lit(1.2))).as("score"))

  /** The tags table: per-doc top-5 concept tags + one 'path' tag. */
  def tagsStore(spark: SparkSession, dir: String): DataFrame = {
    val kw = keywordsStore(spark, dir)
    val top = kw.withColumn("rnk",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("keyword"))))
      .filter(col("rnk") <= 5)
      .select(col("tenant_id"), col("collection"), col("doc_id"),
        col("keyword").as("tag"), lit("concept").as("tag_type"),
        col("score"))
    val path = docMeta(spark, dir)
      .select(col("tenant_id"), col("collection"), col("doc_id"),
        concat(lit("path:"), col("tenant_id")).as("tag"),
        lit("path").as("tag_type"), lit(0.5).as("score"))
    top.unionByName(path)
  }

  /** The canonical_tags count axis: distinct (tenant, collection, tag)
    * concept rows with repeated in-document evidence (tf ≥ 2). */
  def canonicalStore(spark: SparkSession, dir: String): DataFrame =
    SparseSearch.termFreq(Tables.documents(spark, dir))
      .filter(col("tf") >= 2)
      .join(docMeta(spark, dir), "doc_id")
      .select(col("tenant_id"), col("collection"), col("term").as("tag"))
      .distinct()

  /** §3 `*Of` form of `tags summary` over a tags store frame
    * (summary.rs:34's SQL shape). */
  def tagSummaryOf(tags: DataFrame, tenant: String, collection: String,
                   top: Int): DataFrame =
    tags
      .filter(col("tenant_id") === tenant && col("collection") === collection &&
        col("tag_type") === "concept")
      .groupBy(col("tag"))
      .agg(countDistinct(col("doc_id")).as("doc_count"),
        round(avg(col("score")), 6).as("avg_score"))
      .orderBy(col("doc_count").desc, col("tag"))
      .limit(top)

  /** `tags summary` for one tenant (summary.rs:34, tenant src3 /
    * collection projects / top 20). */
  def tagSummary(spark: SparkSession, dir: String): DataFrame =
    tagSummaryOf(tagsStore(spark, dir), "src3", "projects", 20)

  /** §3 `*Of` form of `tags search` (search.rs:36's SQL shape) with a
    * (map_tenant, display_name) name map joined broadcast. */
  def tagSearchOf(tags: DataFrame, names: DataFrame, query: String,
                  collection: String, limit: Int): DataFrame =
    tags
      .filter(col("collection") === collection &&
        col("tag").contains(query) && col("tag_type") === "concept")
      .groupBy(col("tag"), col("tenant_id"))
      .agg(countDistinct(col("doc_id")).as("doc_count"),
        round(avg(col("score")), 6).as("avg_score"))
      .join(broadcast(names), col("tenant_id") === col("map_tenant"), "left")
      .select(col("tag"),
        coalesce(col("display_name"), col("tenant_id")).as("project"),
        col("tenant_id"), col("doc_count"), col("avg_score"))
      .orderBy(col("doc_count").desc, col("tag"), col("tenant_id"))
      .limit(limit)

  /** `tags search` — LIKE '%data%' over projects, top 50. */
  def tagSearch(spark: SparkSession, dir: String): DataFrame =
    tagSearchOf(tagsStore(spark, dir),
      PerfStats.tenantNamesOf(PerfStats.perfFolders(spark, dir)),
      "data", "projects", 50)

  /** §3 `*Of` form of `tags stats` (stats.rs:70
    * compute_stats_for_tenant, all tenants): the reference's four
    * point queries per tenant as three grouped frames joined on the
    * tenant axis (DISTINCT tenant FROM tags, stats.rs:44). Averages
    * are rounded to 1 decimal like the reference's "%.1f" rendering. */
  def tagStatsOf(keywords: DataFrame, tags: DataFrame, canonical: DataFrame,
                 names: DataFrame, collection: String): DataFrame = {
    val kwStats = keywords.filter(col("collection") === collection)
      .groupBy(col("tenant_id"))
      .agg(countDistinct(col("doc_id")).as("doc_count"),
        count(lit(1)).as("total_kw"))
    val tagCounts = tags
      .filter(col("collection") === collection && col("tag_type") === "concept")
      .groupBy(col("tenant_id")).agg(count(lit(1)).as("total_tags"))
    val canonCounts = canonical
      .filter(col("collection") === collection)
      .groupBy(col("tenant_id")).agg(count(lit(1)).as("canonical_count"))
    tags.filter(col("collection") === collection)
      .select(col("tenant_id")).distinct()
      .join(kwStats, Seq("tenant_id"), "left")
      .join(tagCounts, Seq("tenant_id"), "left")
      .join(canonCounts, Seq("tenant_id"), "left")
      .join(broadcast(names), col("tenant_id") === col("map_tenant"), "left")
      .select(
        coalesce(col("display_name"), col("tenant_id")).as("project"),
        col("tenant_id"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"),
        round(when(coalesce(col("doc_count"), lit(0L)) === 0, 0.0)
          .otherwise(col("total_kw").cast("double") / col("doc_count")), 1)
          .as("avg_keywords"),
        round(when(coalesce(col("doc_count"), lit(0L)) === 0, 0.0)
          .otherwise(coalesce(col("total_tags"), lit(0L)).cast("double") /
            col("doc_count")), 1).as("avg_tags"),
        coalesce(col("canonical_count"), lit(0L)).as("canonical_count"))
      .orderBy(col("tenant_id"))
  }

  /** `tags stats` over the synthetic store, projects collection. */
  def tagStats(spark: SparkSession, dir: String): DataFrame =
    tagStatsOf(keywordsStore(spark, dir), tagsStore(spark, dir),
      canonicalStore(spark, dir),
      PerfStats.tenantNamesOf(PerfStats.perfFolders(spark, dir)), "projects")
}
