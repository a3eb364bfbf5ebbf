package graft.operators

import java.util.Locale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Cross-project search scoping — the daemon's scope-resolution +
  * tenant-filter layer (cross_project_search.rs). The relevance-decay
  * half already ships as `tenant_decay` (PayloadOps.tenantSearchDecay,
  * cross_project_search.rs:134); this operator adds what sits BEFORE
  * it: `SearchScope::from_str_loose` (:39), `resolve_scope` (:92 —
  * group membership from the project_groups table with the
  * `members.len() > 1` fallback to Single), and the `TenantFilter`
  * Single/Multiple/None candidate restriction, composed with the decay
  * into the full scoped search.
  *
  * Relational shape: group membership is a tenant-axis (config-sized)
  * self-join on group_id — broadcast; the corpus-sized work is ONE
  * scored scan filtered per scope and one top-k
  * (TakeOrderedAndProject). The three scopes ride the same scan via a
  * scope×row lateral explode, so the registered query exercises
  * Single, Multiple, and None filters in one plan; shuffle ∝ surviving
  * candidates.
  */
object ScopedSearch {

  /** SearchScope::from_str_loose (cross_project_search.rs:39):
    * case-insensitive, unknown → Project. */
  def fromStrLoose(s: String): String = s.toLowerCase(Locale.ROOT) match {
    case "group" => "group"
    case "all"   => "all"
    case _       => "project"
  }

  /** resolve_scope's Group arm (cross_project_search.rs:92
    * get_group_members): tenants sharing ANY group with the current
    * tenant, from a `(group_id, tenant_id)` membership frame. The
    * caller applies the `> 1 members` fallback to Single. */
  def groupMembersOf(groups: DataFrame, currentTenant: String): DataFrame = {
    val mine = groups.filter(col("tenant_id") === currentTenant)
      .select(col("group_id")).distinct()
    groups.join(broadcast(mine), "group_id")
      .select(col("tenant_id")).distinct()
  }

  /** The scoped search over a `(doc_id, score)` candidate frame and a
    * `(doc_id, tenant_id)` ownership frame: per scope, the
    * TenantFilter restriction (Single / Multiple-with-fallback / None)
    * then relevance decay (current 1.0, group 0.7, other 0.4 —
    * RelevanceDecay defaults) and the re-sort, top-k per scope.
    * `members` carries the RESOLVED group member set (post-fallback).
    */
  def scopedSearchOf(scored: DataFrame, owners: DataFrame, members: DataFrame,
                     currentTenant: String, k: Int = 25,
                     currentMul: Double = 1.0, groupMul: Double = 0.7,
                     otherMul: Double = 0.4): DataFrame = {
    val flagged = scored.join(owners, "doc_id")
      .join(broadcast(members.select(col("tenant_id")).distinct()
        .withColumn("is_member", lit(true))), Seq("tenant_id"), "left")
      .withColumn("is_member", coalesce(col("is_member"), lit(false)))
    val scopes = flagged.select(col("*"),
      explode(array(lit("project"), lit("group"), lit("all"))).as("scope"))
    val filtered = scopes.filter(
      (col("scope") === "all") ||
      (col("scope") === "project" && col("tenant_id") === currentTenant) ||
      (col("scope") === "group" && col("is_member")))
    val adj = filtered.withColumn("adj_score", col("score") *
      when(col("tenant_id") === currentTenant, lit(currentMul))
        .when(col("is_member"), lit(groupMul))
        .otherwise(lit(otherMul)))
    adj
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("scope"))
          .orderBy(col("adj_score").desc, col("doc_id"))))
      .filter(col("rnk") <= k)
      .select(col("scope"), col("rnk"), col("doc_id"), col("tenant_id"))
      .orderBy(col("scope"), col("rnk"))
  }

  /** scoped_search: all three scopes over one BM25-scored scan, with
    * group membership from the workspace-grouping strategy
    * (workspaceGroupsOf — the project_groups table's workspace rows)
    * for tenant `src1`, and the reference's `members.len() > 1`
    * fallback: the resolved member set collapses to just the current
    * tenant when its group has no other members. */
  def scopedSearch(spark: SparkSession, dir: String,
                   currentTenant: String = "src1", k: Int = 25): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = SparseSearch.bm25ScoresForQuery(spark, docs, "dup vector window fast")
    val owners = docs.select(col("doc_id"), col("source").as("tenant_id"))
    val n = expr("CAST(substring(tenant_id, 4) AS INT)")
    val folders = docs.select(col("source").as("tenant_id")).distinct()
      .withColumn("workspace_root",
        concat(lit("/mono/w"), pmod(n, lit(5)).cast("string")))
    val groups = Grouping.workspaceGroupsOf(folders)
      .select(col("group_id"), col("tenant_id"))
    val raw = groupMembersOf(groups, currentTenant)
    // Multiple only past one member, else Single(current) — the
    // fallback decided on the tenant-axis count (config-sized).
    val members =
      if (raw.limit(2).count() > 1) raw
      else {
        import spark.implicits._
        Seq(currentTenant).toDF("tenant_id")
      }
    scopedSearchOf(scored, owners, members, currentTenant, k)
  }
}
