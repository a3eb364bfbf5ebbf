package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Type-aware processing settings — the per-collection-type performance
  * table the reference's queue processor consults before every batch
  * (daemon/core/src/type_aware_processor.rs:98 `get_settings_for_type`
  * over the five `CollectionTypeSettings` constructors at
  * type_aware_processor.rs:37-88):
  *
  *   system  (`__` prefix)        → batch  50, conc  3, prio 4, ttl  600
  *   library (`_` prefix)         → batch 100, conc  5, prio 3, ttl  900
  *   project (`{project}-{suffix}`)→ batch 150, conc 10, prio 2, ttl  300
  *   global  (TENANT_GLOBAL,
  *            constants.rs:26 = "global") → batch 200, conc 8, prio 5, ttl 1800
  *   unknown (anything else)      → batch 100, conc  5, prio 1, ttl  300
  *
  * The async rate-limiter ring around it (ConcurrentOperationTracker,
  * type_aware_processor.rs:110) is runtime state, not analytics — what
  * a batch engine owns is the settings resolution itself: classify each
  * collection, attach its parameters, and size the ingest work
  * (`n_batches = ceil(n_docs / batch_size)`) that feeds the chunking /
  * store operators.
  *
  * Relational shape: the settings table is five literal rows — a
  * BROADCAST lookup joined onto the per-collection aggregate (one
  * groupBy, shuffle ∝ distinct collections). The classification is a
  * codegen'd CASE over the name; at 100 TB the only full-data pass is
  * the per-collection doc count.
  */
object TypeAwareSettings {

  /** Name → processor type, per the type_aware_processor.rs:1-12 header
    * conventions: `__` before `_` (a system name also `_`-prefixed),
    * the TENANT_GLOBAL sentinel exactly, dashed names project-scoped,
    * everything else unknown.
    */
  def processorTypeOf(name: Column): Column =
    when(name.startsWith("__"), "system")
      .when(name.startsWith("_"), "library")
      .when(name === "global", "global")
      .when(name.contains("-"), "project")
      .otherwise("unknown")

  /** The five settings rows (type_aware_processor.rs:37-88), as a
    * broadcast-able DataFrame.
    */
  def settingsTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("system", 50, 3, 4, 600),
      ("library", 100, 5, 3, 900),
      ("project", 150, 10, 2, 300),
      ("global", 200, 8, 5, 1800),
      ("unknown", 100, 5, 1, 300)
    ).toDF("collection_type", "batch_size", "max_concurrent_operations",
      "priority_weight", "cache_ttl_seconds")
  }

  /** Resolve settings for a `(collection_name, n_docs)` frame: classify,
    * broadcast-join the table, size the batches.
    */
  def settingsFor(collections: DataFrame): DataFrame = {
    val typed = collections.withColumn("collection_type",
      processorTypeOf(col("collection_name")))
    typed
      .join(broadcast(settingsTable(collections.sparkSession)), Seq("collection_type"))
      .select(col("collection_name"), col("collection_type"),
        col("batch_size"), col("max_concurrent_operations"),
        col("priority_weight"), col("cache_ttl_seconds"),
        col("n_docs"),
        ceil(col("n_docs").cast("double") / col("batch_size")).as("n_batches"))
      .orderBy(col("collection_name"))
  }

  /** type_settings query: the corpus has no collection axis, so each
    * doc gets a deterministic collection name spanning all five routes —
    * `__sys<k>` (system), `_lib<k>` (library), `<source>-docs`
    * (project), the `global` sentinel, and a dashless `scratch<k>`
    * (unknown) — then per-collection counts feed the settings lookup.
    */
  def typeSettings(spark: SparkSession, dir: String): DataFrame = {
    val sel = pmod(col("doc_id"), lit(5))
    val collection = when(sel === 0, concat(lit("__sys"), pmod(col("doc_id"), lit(2)).cast("string")))
      .when(sel === 1, concat(lit("_lib"), pmod(col("doc_id"), lit(3)).cast("string")))
      .when(sel === 2, concat(col("source"), lit("-docs")))
      .when(sel === 3, lit("global"))
      .otherwise(concat(lit("scratch"), pmod(col("doc_id"), lit(2)).cast("string")))
    val collections = Tables.documents(spark, dir)
      .select(collection.as("collection_name"))
      .groupBy(col("collection_name"))
      .agg(count(lit(1)).as("n_docs"))
    settingsFor(collections)
  }
}
