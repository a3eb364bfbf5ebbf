package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The daemon-down fallback search with the F-001 fail-closed refusal
  * contract (client/src/search/flow_fallback.rs, mirroring
  * search-qdrant.ts:367-416 fallbackSearch).
  *
  * Per collection the fallback scrolls `limit * 3` points, keeps those
  * whose lowercased content OR title contains the lowercased query,
  * assigns the flat 0.5 score, and takes `limit` overall in
  * collection-then-scroll order. Refusals (no scroll at all):
  *  - scope=project with an UNRESOLVED project id — None, empty, or
  *    whitespace-only (the M2 falsy rule, flow_fallback.rs:129) —
  *    refuses EVERY collection (the M1 rule: not just projects);
  *  - scope=group ALWAYS refuses (the daemon-down fallback cannot
  *    resolve membership; TS throws, Rust refuses — fail-closed).
  * The response is degraded (`f001_refusal_reason`, byte-faithful to
  * search-qdrant.ts:404) only when NOTHING was attempted and something
  * was refused; any attempted scroll downgrades to the plain
  * FALLBACK_STATUS_REASON (flow_fallback.rs:96-101).
  *
  * Relational shape: one corpus scan per registered query; the
  * scenario axis (resolved / unresolved / group / all) is an explode
  * over config-sized literals, the per-collection scroll cap and the
  * global limit are windows, and the substring match is a codegen'd
  * `contains` — the same cheap-prefilter shape as regex_search's
  * literal pass.
  */
object FallbackSearch {

  val FallbackStatusReason = "Daemon unavailable - using fallback text search"

  /** f001_refusal_reason (flow_fallback.rs:25) — byte-faithful. */
  def f001RefusalReason(refused: Seq[String]): String =
    "Daemon unavailable and project scope unresolved - cannot run cross-tenant fallback. " +
      s"Refused collections: ${refused.mkString(", ")}"

  /** project_id_is_unresolved (flow_fallback.rs:127): None or
    * empty/whitespace-only. */
  def projectIdIsUnresolved(projectId: Option[String]): Boolean =
    projectId.forall(_.trim.isEmpty)

  /** One fallback scenario over a (collection, ord, doc_id, tenant_id,
    * content, title) candidate frame: refusal rows (doc_id null) or
    * matched result rows, plus the status reason. */
  def fallbackOf(cands: DataFrame, collections: Seq[String], query: String,
                 scope: String, projectId: Option[String],
                 limit: Int = 10): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val unresolved = projectIdIsUnresolved(projectId)
    val refused = collections.filter(_ =>
      (scope == "project" && unresolved) || scope == "group")
    val attempted = collections.filterNot(refused.contains)
    val reason =
      if (attempted.isEmpty && refused.nonEmpty) f001RefusalReason(refused)
      else FallbackStatusReason

    val refusedDf = refused.toDF("collection")
      .select(col("collection"), lit("refused").as("kind"),
        lit(null).cast("long").as("doc_id"), lit(null).cast("int").as("rnk"),
        lit(reason).as("status_reason"))
    if (attempted.isEmpty) return refusedDf

    val ql = query.toLowerCase
    val scrolled = cands
      .filter(col("collection").isin(attempted: _*))
      .filter(if (scope == "project") col("tenant_id") === projectId.get.trim
              else lit(true))
      .withColumn("scroll_rn", row_number().over(
        Window.partitionBy(col("collection")).orderBy(col("ord"))))
      .filter(col("scroll_rn") <= limit * 3)
    val matched = scrolled
      .filter(lower(col("content")).contains(ql) || lower(col("title")).contains(ql))
      .withColumn("seq", row_number().over(
        Window.orderBy(col("collection"), col("ord"))))
      .filter(col("seq") <= limit)
      .select(col("collection"), lit("row").as("kind"), col("doc_id"),
        col("seq").cast("int").as("rnk"), lit(reason).as("status_reason"))
    refusedDf.unionAll(matched)
  }

  /** fallback_search: all four scenarios over one derived candidate
    * corpus — collections by doc_id%3 (projects/libraries/scratchpad),
    * scroll order = doc_id, titles matching the query on doc_id%13==0
    * (the title-OR arm), query `vector`. Scenarios: `resolved`
    * (scope=project, id src1), `unresolved` (scope=project, id "  " —
    * the M2 whitespace rule), `group` (always refused), `all` (no
    * tenant filter). */
  def fallbackSearch(spark: SparkSession, dir: String,
                     query: String = "vector", limit: Int = 10): DataFrame = {
    val collections = Seq("projects", "libraries", "scratchpad")
    val cands = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("tenant_id"), col("text").as("content"),
        when(pmod(col("doc_id"), lit(13)) === 0, lit("Vector notes"))
          .otherwise(lit("notes")).as("title"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("projects"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("libraries"))
          .otherwise(lit("scratchpad")).as("collection"),
        col("doc_id").as("ord"))
    val scenarios = Seq(
      ("resolved", "project", Some("src1")),
      ("unresolved", "project", Some("  ")),
      ("group", "group", Some("src1")),
      ("all", "all", None: Option[String]))
    scenarios.map { case (name, scope, pid) =>
      fallbackOf(cands, collections, query, scope, pid, limit)
        .select(lit(name).as("scenario"), col("*"))
    }.reduce(_ unionAll _)
      .orderBy(col("scenario"), col("kind"), col("collection"), col("rnk"))
  }
}
