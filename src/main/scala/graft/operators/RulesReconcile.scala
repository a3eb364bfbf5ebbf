package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The rules rebuild — bidirectional store↔mirror reconciliation
  * (grpc/services/rules_rebuild.rs, driven by system_service/rebuild/
  * storage_targets.rs:33-79). The scroll/SQL reads and the
  * delete/insert/enqueue writes are I/O; every decision between them is
  * relational:
  *
  *  1. Label dedup (deduplicate_rules, rules_rebuild.rs:119): per
  *     non-empty label keep the newest `updated_at`; older points →
  *     delete. Unlabeled points are skipped with a warning (:85).
  *  2. Content dedup across labels (dedup_by_content, :144): among the
  *     per-label winners, content held by more than one label keeps one
  *     label; the rest lose BOTH their store point and their mirror row.
  *     The reference iterates map order here (nondeterministic on ties);
  *     the twin totalizes it deterministically — newest-then-point-id
  *     within a label, lexicographically-least label within a content
  *     group — which also makes the `entries.first()` already-deleted
  *     skip arm structurally empty (first = winner by construction).
  *  3. Deduped state (build_deduped_state, :186): the surviving winner
  *     per label — a label whose winner was content-deleted drops out
  *     entirely (its other entries were label-dup-deleted).
  *  4. Bidirectional sync (reconcile_rules, :204, against the mirror as
  *     read BEFORE the dedup deletes — storage_targets.rs reads it at
  *     step 2): store label absent from mirror → insert_mirror; present
  *     with different content → update_mirror (content comparison only);
  *     mirror label absent from the deduped store → enqueue for
  *     re-ingestion with idempotency key
  *     `sha256("text|add|<tenant|global>|rules|<payload>")[..32]`
  *     (:263, compute_content_hash = lowercase sha256 hex,
  *     common/hashing.rs:148) over the alphabetical
  *     `{content,label,scope}` JSON (serde_json's BTreeMap order).
  *
  * Shape: one rank window per label, one groupBy per content class,
  * then broadcast-friendly label-equi joins — shuffle ∝ rules, never
  * rules². The corpus frames cycle labels/contents/timestamps so every
  * action arm (both dup kinds, both mirror writes, enqueue, unlabeled
  * skip) is live.
  */
object RulesReconcile {

  val TenantGlobal = "global" // wqm_common::constants::TENANT_GLOBAL

  /** §3 `*Of` form. `points`: (point_id, label — nullable/empty ⇒
    * unlabeled, content, scope, tenant, updated_at); `mirror`:
    * (rule_id, rule_text, scope, tenant_id). Returns the action stream:
    * (action, dup_kind, label, point_id, tenant_id, payload). */
  def rulesReconcileOf(points: DataFrame, mirror: DataFrame): DataFrame = {
    val spark = points.sparkSession

    val labeled = points.filter(col("label").isNotNull && col("label") =!= "")
    val unlabeled = points.filter(col("label").isNull || col("label") === "")
      .select(lit("skip_unlabeled").as("action"),
        lit(null).cast("string").as("dup_kind"),
        lit(null).cast("string").as("label"),
        col("point_id"),
        lit(null).cast("string").as("tenant_id"),
        lit(null).cast("string").as("payload"))

    // 1. Newest-first rank per label; rn > 1 → stale label duplicates.
    val ranked = labeled.withColumn("rn", row_number().over(
      Window.partitionBy(col("label"))
        .orderBy(col("updated_at").desc, col("point_id"))))
    val labelDupDeletes = ranked.filter(col("rn") > 1)
      .select(lit("delete_point").as("action"), lit("label_dup").as("dup_kind"),
        col("label"), col("point_id"),
        lit(null).cast("string").as("tenant_id"),
        lit(null).cast("string").as("payload"))

    // 2. Content dedup among winners: lexicographically-least label kept.
    val winners = ranked.filter(col("rn") === 1)
    val contentRanked = winners.withColumn("crn", row_number().over(
      Window.partitionBy(col("content")).orderBy(col("label"))))
      .withColumn("cdup", count(lit(1)).over(Window.partitionBy(col("content"))))
    val contentLosers = contentRanked.filter(col("cdup") > 1 && col("crn") > 1)
    val contentDupDeletes = contentLosers
      .select(lit("delete_point").as("action"), lit("content_dup").as("dup_kind"),
        col("label"), col("point_id"),
        lit(null).cast("string").as("tenant_id"),
        lit(null).cast("string").as("payload"))
    val mirrorDeletes = contentLosers
      .select(lit("delete_mirror").as("action"),
        lit("content_dup").as("dup_kind"), col("label"),
        lit(null).cast("string").as("point_id"),
        lit(null).cast("string").as("tenant_id"),
        lit(null).cast("string").as("payload"))

    // 3. Surviving deduped state: winners that were not content-deleted.
    val deduped = contentRanked.filter(!(col("cdup") > 1 && col("crn") > 1))
      .select(col("label"), col("content"), col("scope"), col("tenant"))

    // 4. Bidirectional sync against the PRE-delete mirror read.
    val m = mirror.select(col("rule_id").as("m_label"),
      col("rule_text"), col("tenant_id").as("m_tenant"))
    val joined = deduped.join(m, col("label") === col("m_label"), "left")
    val inserts = joined.filter(col("m_label").isNull)
      .select(lit("insert_mirror").as("action"),
        lit(null).cast("string").as("dup_kind"), col("label"),
        lit(null).cast("string").as("point_id"),
        col("tenant").as("tenant_id"), col("content").as("payload"))
    val updates = joined.filter(col("m_label").isNotNull &&
        col("rule_text") =!= col("content"))
      .select(lit("update_mirror").as("action"),
        lit(null).cast("string").as("dup_kind"), col("label"),
        lit(null).cast("string").as("point_id"),
        col("tenant").as("tenant_id"), col("content").as("payload"))

    val enq = mirror.join(deduped.select(col("label")),
        col("rule_id") === col("label"), "left_anti")
      .withColumn("tid", coalesce(col("tenant_id"), lit(TenantGlobal)))
      .withColumn("payload_json", concat(
        lit("{\"content\":\""), col("rule_text"),
        lit("\",\"label\":\""), col("rule_id"), lit("\",\"scope\":"),
        when(col("scope").isNull, lit("null"))
          .otherwise(concat(lit("\""), col("scope"), lit("\""))),
        lit("}")))
      .select(lit("enqueue").as("action"),
        lit(null).cast("string").as("dup_kind"),
        col("rule_id").as("label"),
        lit(null).cast("string").as("point_id"),
        col("tid").as("tenant_id"),
        substring(sha2(concat(lit("text|add|"), col("tid"), lit("|rules|"),
          col("payload_json")), 256), 1, 32).as("payload"))

    labelDupDeletes
      .unionByName(contentDupDeletes).unionByName(mirrorDeletes)
      .unionByName(inserts).unionByName(updates)
      .unionByName(enq).unionByName(unlabeled)
  }

  /** The store-side rule points frame: labels/contents/timestamps cycle
    * so label collisions (~2.8 points per label), cross-label content
    * collisions, and the unlabeled skip arm are all live. */
  def rulePoints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      concat(lit("pt-"), col("doc_id")).as("point_id"),
      when(pmod(col("doc_id"), lit(50)) === 7, lit(null).cast("string"))
        .otherwise(concat(lit("rule-"), pmod(col("doc_id"), lit(180)))).as("label"),
      concat(lit("text-"), pmod(col("doc_id"), lit(120))).as("content"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("global"))
        .when(pmod(col("doc_id"), lit(3)) === 1, lit("project"))
        .otherwise(lit(null).cast("string")).as("scope"),
      when(pmod(col("doc_id"), lit(2)) === 0, col("source"))
        .otherwise(lit(null).cast("string")).as("tenant"),
      concat(lit("2024-01-"),
        lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
        lit("T00:00:00Z")).as("updated_at"))

  /** The SQLite mirror frame: labels 0..209 minus an % 11 gap, so both
    * the store-only (insert) and mirror-only (enqueue) arms are live;
    * texts drift on a different cycle so updates fire. */
  def rulesMirror(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(pmod(col("doc_id"), lit(210)).as("m")).distinct()
      .filter(pmod(col("m"), lit(11)) =!= 3)
      .select(
        concat(lit("rule-"), col("m")).as("rule_id"),
        concat(lit("text-"), pmod(col("m") * 7, lit(118))).as("rule_text"),
        when(pmod(col("m"), lit(4)) === 0, lit("local"))
          .otherwise(lit(null).cast("string")).as("scope"),
        when(pmod(col("m"), lit(5)) === 0,
          concat(lit("src"), pmod(col("m"), lit(20))))
          .otherwise(lit(null).cast("string")).as("tenant_id"))

  /** rules_reconcile query over the synthetic store/mirror pair. */
  def rulesReconcile(spark: SparkSession, dir: String): DataFrame =
    rulesReconcileOf(rulePoints(spark, dir), rulesMirror(spark, dir))
      .orderBy(col("action"), col("label"), col("point_id"))
}
