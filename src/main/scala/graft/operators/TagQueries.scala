package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The MCP server's tag-query read surface (mcp-server/src/sqlite/
  * tag_queries.rs — SQL verbatim from tag-queries.ts):
  *
  *  - `get_matching_tags` + `get_keyword_baskets_for_tags`: the query
  *    tokenizer (:48 — lowercase, whitespace split, strip non
  *    `[a-z0-9_-]` ASCII, keep length ≥ 3), `LOWER(tag) LIKE %tok%`
  *    OR-conditions over concept tags in one collection, `ORDER BY
  *    score DESC LIMIT 10` (ties totalized by tag, tag_id — SQLite
  *    leaves them unspecified), then the matched ids' keyword baskets
  *    joined back (the keywords_json parse surfaced as exploded
  *    per-keyword rows, the shape the Vec<String> consumer sees).
  *  - `get_tag_hierarchy` (tag-queries.ts:176): canonical tags LEFT
  *    JOINed to their parent's name (dangling parent ids → NULL, the
  *    same arm as a true root) with a correlated child count, ordered
  *    level ASC, name ASC.
  *
  * Stores ride the TagStoreOps syntheses: tags = the per-doc top-5
  * concept terms with tag_id = doc_id·10 + rank (unique per row, as
  * the SQLite rowid is); baskets = the tag's doc-local top-3 keyword
  * set; canonical_tags = the distinct stable concept set with dense
  * ids and residue-driven levels/parent links.
  *
  * Scale: the LIKE probe is one scan with a config-sized token axis
  * inlined; baskets join on the ≤10 matched ids (broadcast); the
  * hierarchy read is two config-sized joins.
  */
object TagQueries {

  /** tokenize_query (tag_queries.rs:48). Driver-side — the reference
    * tokenizes the user's query string driver-side too. */
  def tokenizeQuery(query: String): Seq[String] =
    query.toLowerCase.split("\\s+").toSeq
      .map(_.filter(c => (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '_' || c == '-'))
      .filter(_.length >= 3)

  /** The tags store with per-row ids: TagStoreOps' per-doc top-5
    * concept rows, tag_id = doc_id*10 + rank. */
  def tagsWithIds(spark: SparkSession, dir: String): DataFrame = {
    val kw = TagStoreOps.keywordsStore(spark, dir)
    kw.withColumn("rnk",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("keyword"))))
      .filter(col("rnk") <= 5)
      .select((col("doc_id") * 10 + col("rnk")).as("tag_id"),
        col("tenant_id"), col("collection"), col("doc_id"),
        col("keyword").as("tag"), col("score"))
  }

  /** Keyword baskets: per tag row, the owning doc's top-3 keywords —
    * exploded to (tag_id, keyword) rows, the parsed Vec<String>. */
  def basketsFor(spark: SparkSession, dir: String): DataFrame = {
    val kw = TagStoreOps.keywordsStore(spark, dir)
    kw.withColumn("rnk",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("keyword"))))
      .filter(col("rnk") <= 3)
      .groupBy(col("doc_id").as("b_doc"))
      .agg(sort_array(collect_list(col("keyword"))).as("basket"))
  }

  /** The default probe — tokens resolve to (vector, dup, wind): a full
    * match, an exact tag, a partial (`wind` LIKE-matches `window`),
    * with the <3-char and punctuation-stripped tokens dropped. */
  val DefaultQuery = "Vector dup Wind QA z."

  /** §3 `*Of` form of get_matching_tags + the basket fetch. */
  def tagMatchOf(tags: DataFrame, baskets: DataFrame, query: String,
                 collection: String, tenant: Option[String]): DataFrame = {
    val tokens = tokenizeQuery(query)
    if (tokens.isEmpty) return tags.sparkSession.emptyDataFrame
    val likeArm = tokens.map(t => lower(col("tag")).contains(t))
      .reduce(_ || _)
    var f = tags.filter(col("collection") === collection && likeArm)
    tenant.foreach(t => f = f.filter(col("tenant_id") === t))
    val top = f.select(col("tag_id"), col("tag"), col("score"), col("doc_id"))
      .distinct()
      .withColumn("rk", row_number().over(
        Window.orderBy(col("score").desc, col("tag"), col("tag_id"))))
      .filter(col("rk") <= 10)
    top.join(baskets, top("doc_id") === baskets("b_doc"), "left")
      .select(col("rk"), col("tag_id"), col("tag"),
        round(col("score"), 6).as("score"),
        explode_outer(col("basket")).as("basket_keyword"))
      .orderBy(col("rk"), col("basket_keyword"))
  }

  def tagMatch(spark: SparkSession, dir: String): DataFrame =
    tagMatchOf(tagsWithIds(spark, dir), basketsFor(spark, dir),
      DefaultQuery, "projects", None)

  // ------------------------------------------------------------------
  // tag_tree — get_tag_hierarchy
  // ------------------------------------------------------------------

  /** The canonical_tags synthesis: the distinct stable concept set
    * (TagStoreOps' canonical convention) with dense ids in (collection,
    * tag) order, level = id % 3, and parent links at the preceding
    * multiple of 3 (id 1 and 2 point at the nonexistent id 0 — the
    * dangling-parent arm the LEFT JOIN turns into NULL). */
  def canonicalTags(spark: SparkSession, dir: String): DataFrame = {
    val base = TagStoreOps.keywordsStore(spark, dir)
      .groupBy(col("collection"), col("keyword").as("canonical_name"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
    base.withColumn("canonical_id",
        row_number().over(Window.orderBy(col("collection"),
          col("canonical_name"))).cast("long"))
      .select(col("canonical_id"), col("canonical_name"), col("collection"),
        pmod(col("canonical_id"), lit(3)).as("level"),
        when(pmod(col("canonical_id"), lit(3)) === 0,
          lit(null).cast("long"))
          .otherwise((floor(col("canonical_id") / 3) * 3).cast("long"))
          .as("parent_id"))
  }

  /** §3 `*Of` form of get_tag_hierarchy for one collection: parent
    * name via self LEFT JOIN, child_count via the correlated count
    * (one groupBy join), ORDER BY level ASC, canonical_name ASC. */
  def tagTreeOf(canonical: DataFrame, collection: String): DataFrame = {
    val ct = canonical.filter(col("collection") === collection)
    val parents = ct.select(col("canonical_id").as("p_id"),
      col("canonical_name").as("parent_name"))
    val childCounts = ct.filter(col("parent_id").isNotNull)
      .groupBy(col("parent_id").as("cc_id"))
      .agg(count(lit(1)).as("cc"))
    ct.join(parents, ct("parent_id") === parents("p_id"), "left")
      .join(childCounts, ct("canonical_id") === childCounts("cc_id"), "left")
      .select(col("canonical_name").as("name"), col("level"),
        col("parent_name"),
        coalesce(col("cc"), lit(0L)).as("child_count"))
      .orderBy(col("level"), col("name"))
  }

  def tagTree(spark: SparkSession, dir: String): DataFrame =
    tagTreeOf(canonicalTags(spark, dir), "projects")
}
