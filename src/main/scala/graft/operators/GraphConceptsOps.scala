package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The `wqm graph concepts` / `wqm graph topics` read queries
  * (cli/src/commands/graph/concepts.rs + topics.rs) over the corpus
  * concept layer (the CrossBoundary.conceptGraph conventions: concepts
  * at doc_id%60, symbol hashes at (7·len+ascii)%60, all concept nodes
  * `__global__`).
  *
  *  - concepts.rs:74 query_concepts: per concept node visible to the
  *    tenant, COUNT(DISTINCT source) split by edge type — IMPLEMENTS_
  *    CONCEPT vs COVERS_TOPIC (the depth filter, when given, applies
  *    ONLY to the covers arm via the metadata_json LIKE probe) — with
  *    the LEFT JOIN keeping zero-edge concepts, ordered by total DESC
  *    LIMIT top. SQLite's tie order is unspecified; totalized by
  *    concept name.
  *  - topics.rs:83: the nodes linked to ONE concept grouped by the
  *    depth level parsed out of each edge's metadata_json
  *    (:55 extract_depth — absent/malformed → "unknown"), groups in
  *    the canonical DISPLAY order (:71 depth_sort_key — reference
  *    first, the REVERSE of the graph/mod.rs ELABORATES ordinal),
  *    nodes presented as the narrative RPC types them.
  *
  * The COVERS_TOPIC depth axis extends the corpus: each doc's covers
  * edge carries `{"depth":"<level>"}` by doc_id%5; IMPLEMENTS edges
  * carry no metadata (the "unknown" group stays live).
  *
  * Scale: both are per-(tenant, concept) hash aggregations (shuffle ∝
  * tenants × 60 concepts); the all-concepts base is a config-sized
  * cross of distinct tenants × the concept universe, and top-k is a
  * partitioned rank window, never a global sort.
  */
object GraphConceptsOps {

  private val DepthNames = Seq("qualitative", "introductory",
    "intermediate", "rigorous", "reference")

  /** COVERS_TOPIC edge rows with the depth metadata axis. */
  def coversEdges(spark: SparkSession, dir: String): DataFrame = {
    val depth = element_at(array(DepthNames.map(lit): _*),
      (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
    Tables.documents(spark, dir).select(
      col("source").as("tenant_id"), col("doc_id"),
      pmod(col("doc_id"), lit(60)).as("k"),
      Explains.corpusFilePath.as("file_path"),
      when(col("doc_id") % 7 === 3, lit("text")).otherwise(lit("module"))
        .as("chunk_type"),
      depth.as("depth"),
      concat(lit("{\"depth\":\""), depth, lit("\"}")).as("metadata_json"))
  }

  /** IMPLEMENTS_CONCEPT edge rows (distinct symbol nodes, no metadata). */
  def implementsEdges(spark: SparkSession, dir: String): DataFrame =
    Explains.corpusSymbols(spark, dir)
      .select(col("tenant_id"), col("node_id"), col("symbol_name")).distinct()
      .withColumn("k", pmod(length(col("symbol_name")) * 7 +
        ascii(substring(col("symbol_name"), 1, 1)), lit(60)))

  /** extract_depth (topics.rs:55): the `"depth":"…"` value, or
    * `unknown` when the metadata is absent or unparseable. */
  def extractDepth(meta: Column): Column =
    when(meta.isNull, lit("unknown"))
      .otherwise(coalesce(
        nullif(regexp_extract(meta, "\"depth\"\\s*:\\s*\"([^\"]*)\"", 1),
          lit("")),
        lit("unknown")))

  /** depth_sort_key (topics.rs:71): canonical display order. */
  def depthSortKey(depth: Column): Column =
    when(depth === "reference", 0).when(depth === "rigorous", 1)
      .when(depth === "intermediate", 2).when(depth === "introductory", 3)
      .when(depth === "qualitative", 4).otherwise(5)

  /** §3 `*Of` form of query_concepts over the two edge frames; the
    * depth filter (concepts.rs:94) guards only the covers count. */
  def graphConceptsOf(covers: DataFrame, impls: DataFrame, top: Int = 10,
                      depthFilter: Option[String] = None): DataFrame = {
    val cc = covers
      .filter(depthFilter.map(d => col("depth") === d).getOrElse(lit(true)))
      .groupBy(col("tenant_id"), col("k"))
      .agg(countDistinct(col("doc_id")).as("cc"))
    val ic = impls.groupBy(col("tenant_id"), col("k"))
      .agg(countDistinct(col("node_id")).as("ic"))
    // The concept universe: every k with any edge (the corpus conceptNodes
    // convention); all-__global__, so visible to every tenant.
    val universe = covers.select(col("k"))
      .unionByName(impls.select(col("k"))).distinct()
    val tenants = covers.select(col("tenant_id")).distinct()
    val rank = Window.partitionBy(col("tenant_id"))
      .orderBy((col("implements_count") + col("covers_count")).desc,
        col("concept"))
    tenants.crossJoin(broadcast(universe))
      .join(ic, Seq("tenant_id", "k"), "left")
      .join(cc, Seq("tenant_id", "k"), "left")
      .select(col("tenant_id"),
        concat(lit("concept-"), col("k")).as("concept"),
        coalesce(col("ic"), lit(0L)).as("implements_count"),
        coalesce(col("cc"), lit(0L)).as("covers_count"))
      .withColumn("rk", row_number().over(rank)).filter(col("rk") <= top)
      .drop("rk")
      .orderBy(col("tenant_id"),
        (col("implements_count") + col("covers_count")).desc, col("concept"))
  }

  def graphConcepts(spark: SparkSession, dir: String): DataFrame =
    graphConceptsOf(coversEdges(spark, dir), implementsEdges(spark, dir))

  /** §3 `*Of` form of topics over the two edge frames, one concept:
    * every linked node with its parsed depth group, groups in display
    * order, nodes by name within a group. */
  def graphTopicsOf(covers: DataFrame, impls: DataFrame, k: Int): DataFrame = {
    val docsArm = covers.filter(col("k") === k).select(
      col("tenant_id"), col("metadata_json"),
      lit("document_section").as("symbol_type"), col("file_path"),
      concat(lit("doc"), col("doc_id")).as("symbol_name"),
      lit("COVERS_TOPIC").as("edge_type"))
    val symsArm = impls.filter(col("k") === k).select(
      col("tenant_id"), lit(null).cast("string").as("metadata_json"),
      lit("function").as("symbol_type"),
      regexp_extract(col("node_id"), "^node:(.+\\.rs):", 1).as("file_path"),
      col("symbol_name"), lit("IMPLEMENTS_CONCEPT").as("edge_type"))
    docsArm.unionByName(symsArm)
      .withColumn("depth", extractDepth(col("metadata_json")))
      .withColumn("dord", depthSortKey(col("depth")))
      .withColumn("group_count",
        count(lit(1)).over(Window.partitionBy(col("tenant_id"), col("depth"))))
      .select(col("tenant_id"), col("depth"), col("dord"), col("group_count"),
        col("symbol_type"), col("file_path"), col("symbol_name"),
        col("edge_type"))
      .orderBy(col("tenant_id"), col("dord"), col("symbol_name"))
  }

  /** graph_topics for `concept-8`: every tenant's doc_id%60==8 docs
    * cover it across all five depth levels, and the `data`/`key`
    * symbols hash to 8 — so the metadata-less IMPLEMENTS arm keeps the
    * "unknown" depth group live alongside the five parsed ones. */
  def graphTopics(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    graphTopicsOf(coversEdges(spark, dir), implementsEdges(spark, dir), k)
}
