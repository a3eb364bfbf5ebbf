package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Certifies the graph_impact traversal refactor: the level-wise
  * reach set equals the walk-enumerating engine's distinct projection
  * (the equivalence holds because the traversal has no cycle gate, so
  * walk-reachability is path-independent).
  */
class ReachSetSpec extends SparkSpec {

  test("reachSetOf equals the walk engine's distinct path-free projection") {
    val (edges, nodes) = GraphFusion.explainsGraph(spark, sfDir)
    val seeds = nodes
      .orderBy(col("node_id")).limit(5)
      .select(col("node_id").as("seed_id"), col("tenant_id"), col("node_id"))
    val cols = Seq("seed_id", "node_id", "edge_type", "depth",
      "symbol_name", "file_path").map(col)

    val walks = GraphFusion
      .queryRelatedOf(seeds, edges, nodes, maxHops = 3, edgeTypes = Seq.empty)
      .select(cols: _*).distinct()
    val reach = GraphFusion
      .reachSetOf(seeds, edges, nodes, maxHops = 3, edgeTypes = Seq.empty)
      .select(cols: _*).distinct()

    assert(walks.exceptAll(reach).count() == 0)
    assert(reach.exceptAll(walks).count() == 0)
    assert(reach.count() > 0)
  }
}
