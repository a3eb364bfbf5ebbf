package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** `wqm library list` (cli/commands/library/list.rs) — the three-arm
  * library inventory over the watch-folder registry and tracked files:
  *
  *  1. Library watch folders (:120): every `collection='libraries'`
  *     registry row — mode defaults to "incremental" when NULL (:154),
  *     status Watching/Paused from `enabled`, document counts from the
  *     per-tenant tracked_files rollup (:94 get_library_doc_counts —
  *     tracked rows with `collection='libraries'` grouped by the
  *     OWNING folder's tenant, whatever that folder's collection).
  *  2. Format-routed (:175 collect_format_routed): library-collection
  *     files tracked under PROJECT folders — the format-routing
  *     decision layer's output parked in a project watch — listed as
  *     mode "auto-routed" / status "Active".
  *  3. Orphans (:217 collect_orphans): doc-count tenants claimed by
  *     NEITHER arm (their owning folder is some other collection, or
  *     gone) — path/mode "—", status "Orphan", sorted by tenant.
  *
  * The reference's sort — Watching first, then case-insensitive name
  * (:131) — is kept as the output order. Counts stay numeric (the
  * reference formats them per locale at render time).
  *
  * Registry + tracked axes are synthesized over the corpus: folder
  * collections cycle libraries / rules / projects by tenant residue
  * (the rules arm feeds the orphan route), file collections follow the
  * store convention (doc_id % 4 → libraries). Scale: one tracked-file
  * groupBy (shuffle ∝ tenants) + config-sized registry broadcasts.
  */
object LibraryList {

  /** The registry rows for this listing (tenant, path, collection,
    * library_mode, enabled). */
  def folders(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("source")).distinct()
      .select(col("source").as("tenant_id"),
        expr("CAST(substring(source, 4) AS INT)").as("wn"))
      .select(col("tenant_id"),
        when(pmod(col("wn"), lit(9)) === 8, lit("libraries"))
          .when(pmod(col("wn"), lit(9)) === 5, lit("rules"))
          .otherwise(lit("projects")).as("collection"),
        when(pmod(col("wn"), lit(9)) === 8,
          concat(lit("/lib/pkg-"), col("wn")))
          .otherwise(concat(lit("/work/proj-"), col("wn"))).as("path"),
        when(pmod(col("wn"), lit(2)) === 0, lit("full"))
          .otherwise(lit(null).cast("string")).as("library_mode"),
        (pmod(col("wn"), lit(4)) =!= 1).as("enabled"))

  /** §3 `*Of` form over (folders, tracked(watch_tenant, collection)). */
  def libraryListOf(folders: DataFrame, tracked: DataFrame): DataFrame = {
    // get_library_doc_counts: library-collection files per owning tenant.
    val docCounts = tracked.filter(col("collection") === "libraries")
      .groupBy(col("watch_tenant")).agg(count(lit(1)).as("doc_count"))
    val libFolders = folders.filter(col("collection") === "libraries")
      .join(docCounts, col("tenant_id") === col("watch_tenant"), "left")
      .select(col("tenant_id").as("name"), col("path"),
        coalesce(col("library_mode"), lit("incremental")).as("mode"),
        when(col("enabled"), lit("Watching")).otherwise(lit("Paused"))
          .as("status"),
        coalesce(col("doc_count"), lit(0L)).as("documents"))
    val routed = folders.filter(col("collection") === "projects")
      .join(docCounts, col("tenant_id") === col("watch_tenant"))
      .select(col("tenant_id").as("name"), col("path"),
        lit("auto-routed").as("mode"), lit("Active").as("status"),
        col("doc_count").as("documents"))
    val known = libFolders.select(col("name"))
      .unionByName(routed.select(col("name")))
    val orphans = docCounts
      .join(known, col("watch_tenant") === col("name"), "left_anti")
      .select(col("watch_tenant").as("name"), lit("—").as("path"),
        lit("—").as("mode"), lit("Orphan").as("status"),
        col("doc_count").as("documents"))
    libFolders.unionByName(routed).unionByName(orphans)
      .orderBy((col("status") === "Watching").desc, lower(col("name")),
        col("name"))
  }

  /** library list over the synthetic registry + tracked files. The
    * file-collection axis derives from the per-tenant file index
    * (doc_id div 20) — doc_id % 4 is constant within a tenant (source
    * = doc_id % 20), which would starve most tenants of library files
    * and kill the orphan arm. */
  def libraryList(spark: SparkSession, dir: String): DataFrame = {
    val tracked = Tables.documents(spark, dir).select(
      col("source").as("watch_tenant"),
      when(pmod(floor(col("doc_id") / 20).cast("long"), lit(4)) === 0,
        lit("libraries")).otherwise(lit("projects")).as("collection"))
    libraryListOf(folders(spark, dir), tracked)
  }
}
