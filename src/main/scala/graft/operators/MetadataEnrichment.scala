package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Metadata enrichment — the payload-enrichment pass every point gets
  * at ingest (metadata_enrichment/enrichment.rs:92 `enrich_metadata` +
  * collection_type.rs `CollectionType::from_name`), ahead of
  * store_points.
  *
  * Collection-name routing (collection_type.rs:58): exact
  * `rules`/legacy `memory` → RULES; `_` + 12 hex chars → PROJECT;
  * other `_`-prefixed → LIBRARY; `basename-type` at the LAST dash →
  * USER; dashless fallback → USER with empty type.
  *
  * Per-type field rules (enrichment.rs:3): PROJECT gets project_id,
  * branch, file_type, extension, is_test; USER gets project_id only
  * (the pre-computed tenant id — enrichment.rs:171's single source of
  * truth; NO branch); LIBRARY gets library_name only; RULES gets
  * scope=global only. The git-side branch/root discovery
  * (Repository::discover, get_current_branch) is environment I/O — the
  * branch is an input column here, like branch_cleanup's live set.
  *
  * Relational shape: pure projections over the file frame plus the
  * [[FileClassification]] broadcast-table join for the PROJECT fields —
  * map-side only at any scale.
  */
object MetadataEnrichment {

  /** CollectionType::from_name as one column expression. */
  def collectionTypeOf(name: Column): Column =
    when(name.isin("rules", "memory"), "rules")
      .when(name.rlike("^_[0-9a-fA-F]{12}$"), "project")
      .when(name.startsWith("_"), "library")
      .otherwise("user")

  /** Enrich a (doc_id, collection_name, file_path, branch, tenant_id)
    * frame: adds collection_type and the per-type metadata columns,
    * null where the type's rules exclude them.
    */
  def enrichMetadataOf(files: DataFrame): DataFrame = {
    val classified = FileClassification.classifyOf(
      files.select(col("doc_id"), col("file_path")))
      .select(col("doc_id"), col("extension").as("cls_extension"),
        col("file_type").as("cls_file_type"), col("is_test").as("cls_is_test"))
    val ct = collectionTypeOf(col("collection_name"))
    files.join(classified, "doc_id")
      .withColumn("collection_type", ct)
      .select(
        col("doc_id"), col("collection_name"), col("collection_type"),
        when(col("collection_type") === "project",
            regexp_extract(col("collection_name"), "^_(.*)$", 1))
          .when(col("collection_type") === "user", col("tenant_id"))
          .as("project_id"),
        when(col("collection_type") === "project", col("branch")).as("branch"),
        when(col("collection_type") === "project", col("cls_file_type")).as("file_type"),
        when(col("collection_type") === "project", col("cls_extension")).as("extension"),
        when(col("collection_type") === "project", col("cls_is_test")).as("is_test"),
        when(col("collection_type") === "library",
          expr("substring(collection_name, 2)")).as("library_name"),
        when(col("collection_type") === "rules", lit("global")).as("scope"))
      .orderBy(col("doc_id"))
  }

  /** metadata_enrich query: the corpus has no collection axis, so each
    * doc gets a deterministic collection name spanning all four routes —
    * `_<12-hex md5(source)>` (project), `_lib<n>` (library),
    * `<source>-notes` (user), `rules`, legacy `memory`, and a dashless
    * user fallback — over the same synthetic path corpus file_classify
    * uses, with a deterministic branch column standing in for the git
    * probe.
    */
  def metadataEnrich(spark: SparkSession, dir: String): DataFrame = {
    val sel = pmod(col("doc_id"), lit(6))
    val collection = when(sel === 0, concat(lit("_"), substring(md5(col("source")), 1, 12)))
      .when(sel === 1, concat(lit("_lib"), pmod(col("doc_id"), lit(3)).cast("string")))
      .when(sel === 2, concat(col("source"), lit("-notes")))
      .when(sel === 3, lit("rules"))
      .when(sel === 4, lit("memory"))
      .otherwise(lit("scratchpad"))
    val branch = when(pmod(col("doc_id"), lit(4)) === 0, lit("develop")).otherwise(lit("main"))
    val files = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        FileClassification.syntheticPathCol.as("file_path"))
      .withColumn("collection_name", collection)
      .withColumn("branch", branch)
      .withColumn("tenant_id", col("source"))
      .select(col("doc_id"), col("collection_name"), col("file_path"),
        col("branch"), col("tenant_id"))
    enrichMetadataOf(files)
  }
}
