package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The symbol co-occurrence store's analytics reads
  * (cooccurrence_schema/operations.rs) — the graph maintained by
  * keyword extraction and consumed by the graph CLI:
  *
  *  - get_degree_centrality (:57): per symbol, the sum of edge
  *    weights over BOTH endpoint positions, normalized by the max
  *    sum — in [0, 1].
  *  - get_neighbors (:216): one symbol's co-occurring partners at
  *    weight ≥ min_count, weight-desc.
  *  - get_betweenness_centrality (:251): the 2-hop approximation —
  *    per symbol, the count of edge PAIRS sharing it as an endpoint
  *    (`e1.rowid < e2.rowid` dedups the unordered pair; any total
  *    order yields the same count, totalized here by the canonical
  *    (a, b) key), normalized by the max.
  *  - find_clusters (:100): seeds = endpoints of edges ≥ min_count in
  *    unspecified DISTINCT order (totalized symbol-asc); each
  *    unassigned seed expands through the ≥min_count subgraph up to
  *    max_hops and claims ≥2 unassigned symbols as a cluster. Under
  *    max_hops ≥ the threshold subgraph's component diameter (the
  *    corpus runs hops=8, diameters ≤ 4 by construction, spec-
  *    checked), the greedy is EXACTLY connected components of the
  *    threshold subgraph — computed distributively via min-label
  *    propagation ([[Grouping.connectedComponents]]) instead of the
  *    reference's per-seed recursive CTE (N+1 round trips).
  *
  * The store synthesizes per tenant from the tag store's per-doc
  * top-5 concept rows: canonical (a < b) pairs counted across docs —
  * the same upsert-increment semantics as :11.
  *
  * Scale: the store build is one explode + groupBy (pairs bounded by
  * per-doc tag count², not corpus size); centrality reads are single
  * aggregations; betweenness shuffles ∝ shared-endpoint edge pairs;
  * components iterate label joins on the THRESHOLD subgraph only.
  */
object CooccurrenceAnalytics {

  /** symbol_cooccurrence over the tag store: per tenant, canonical
    * in-doc tag pairs with document counts. */
  def store(spark: SparkSession, dir: String): DataFrame = {
    val tags = TagStoreOps.tagsStore(spark, dir)
      .filter(col("tag_type") === "concept")
      .select(col("tenant_id"), col("doc_id"), col("tag"))
    val a = tags.select(col("tenant_id"), col("doc_id"), col("tag").as("symbol_a"))
    val b = tags.select(col("tenant_id").as("t2"), col("doc_id").as("d2"),
      col("tag").as("symbol_b"))
    a.join(b, col("tenant_id") === col("t2") && col("doc_id") === col("d2") &&
        col("symbol_a") < col("symbol_b"))
      .groupBy(col("tenant_id"), col("symbol_a"), col("symbol_b"))
      .agg(count(lit(1)).as("cooccurrence_count"))
  }

  /** Both-endpoint weight sums per (tenant, symbol). */
  private def endpointWeights(store: DataFrame): DataFrame =
    store.select(col("tenant_id"), col("symbol_a").as("symbol"),
        col("cooccurrence_count").as("w"))
      .unionByName(store.select(col("tenant_id"),
        col("symbol_b").as("symbol"), col("cooccurrence_count").as("w")))
      .groupBy(col("tenant_id"), col("symbol"))
      .agg(sum(col("w")).as("total_weight"))

  /** §3 `*Of` form: degree + neighbors + betweenness as one long
    * frame (section, tenant_id, symbol, other, score, weight). The
    * neighbors probe is data-derived: each tenant's max-degree symbol
    * (ties by name) — deterministic and always live. */
  def centralityOf(store: DataFrame, minCount: Long): DataFrame = {
    val deg = endpointWeights(store)
      .withColumn("mx", max(col("total_weight")).over(
        Window.partitionBy(col("tenant_id"))))
      .select(lit("degree").as("section"), col("tenant_id"), col("symbol"),
        lit(null).cast("string").as("other"),
        round(col("total_weight").cast("double") / col("mx"), 6).as("score"),
        col("total_weight").as("weight"))

    val probe = endpointWeights(store)
      .withColumn("rk", row_number().over(Window.partitionBy(col("tenant_id"))
        .orderBy(col("total_weight").desc, col("symbol"))))
      .filter(col("rk") === 1)
      .select(col("tenant_id").as("p_tenant"), col("symbol").as("probe"))
    val nbrs = store.join(broadcast(probe), col("tenant_id") === col("p_tenant"))
      .filter((col("symbol_a") === col("probe") ||
        col("symbol_b") === col("probe")) &&
        col("cooccurrence_count") >= minCount)
      .select(lit("neighbors").as("section"), col("tenant_id"),
        col("probe").as("symbol"),
        when(col("symbol_a") === col("probe"), col("symbol_b"))
          .otherwise(col("symbol_a")).as("other"),
        lit(null).cast("double").as("score"),
        col("cooccurrence_count").as("weight"))

    // Edge pairs sharing an endpoint; the unordered pair dedup rides
    // the canonical (a, b) total order standing in for rowid.
    val e = store.filter(col("cooccurrence_count") >= minCount)
      .select(col("tenant_id"), col("symbol_a").as("a1"),
        col("symbol_b").as("b1"))
    val e2 = e.select(col("tenant_id").as("t2"), col("a1").as("a2"),
      col("b1").as("b2"))
    val sharedPairs = e.join(e2,
      col("tenant_id") === col("t2") &&
        (col("a1") === col("a2") || col("a1") === col("b2") ||
          col("b1") === col("a2") || col("b1") === col("b2")) &&
        (col("a1") < col("a2") ||
          (col("a1") === col("a2") && col("b1") < col("b2"))))
    val bridge = when(col("a1") === col("a2"), col("a1"))
      .when(col("a1") === col("b2"), col("a1"))
      .when(col("b1") === col("a2"), col("b1"))
      .otherwise(col("b1"))
    val btw = sharedPairs
      .select(col("tenant_id"), bridge.as("symbol"))
      .groupBy(col("tenant_id"), col("symbol"))
      .agg(count(lit(1)).as("path_count"))
      .withColumn("mx", max(col("path_count")).over(
        Window.partitionBy(col("tenant_id"))))
      .select(lit("betweenness").as("section"), col("tenant_id"),
        col("symbol"), lit(null).cast("string").as("other"),
        round(col("path_count").cast("double") / col("mx"), 6).as("score"),
        col("path_count").as("weight"))

    deg.unionByName(nbrs).unionByName(btw)
      .orderBy(col("section"), col("tenant_id"), col("symbol"), col("other"))
  }

  def cooccurCentrality(spark: SparkSession, dir: String): DataFrame =
    centralityOf(store(spark, dir).localCheckpoint(), minCount = 3L)

  /** §3 `*Of` form of find_clusters under the documented max_hops ≥
    * diameter condition: components of the ≥min_count subgraph, sized
    * ≥ 2, cluster ids = each component's min symbol. */
  def clustersOf(store: DataFrame, minCount: Long): DataFrame = {
    val edges = store.filter(col("cooccurrence_count") >= minCount)
      .select(concat(col("tenant_id"), lit("|"), col("symbol_a")).as("a"),
        concat(col("tenant_id"), lit("|"), col("symbol_b")).as("b"))
    val comps = Grouping.connectedComponents(edges)
    comps
      .select(split(col("node"), "\\|").getItem(0).as("tenant_id"),
        split(col("node"), "\\|").getItem(1).as("symbol"),
        split(col("label"), "\\|").getItem(1).as("cluster_id"))
      .withColumn("sz", count(lit(1)).over(
        Window.partitionBy(col("tenant_id"), col("cluster_id"))))
      .filter(col("sz") >= 2)
      .select(col("tenant_id"), col("cluster_id"), col("symbol"),
        lit(minCount).as("min_weight"))
      .orderBy(col("tenant_id"), col("cluster_id"), col("symbol"))
  }

  def cooccurClusters(spark: SparkSession, dir: String): DataFrame =
    clustersOf(store(spark, dir), minCount = 3L)
}
