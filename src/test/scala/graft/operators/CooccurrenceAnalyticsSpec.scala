package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with cooccurrence_schema/operations.rs — degree, neighbors,
  * 2-hop betweenness, and the find_clusters greedy (reproduced as a
  * Scala reference model and checked against the distributed
  * component form under the hops ≥ diameter condition). */
class CooccurrenceAnalyticsSpec extends SparkSpec {

  import spark.implicits._
  import CooccurrenceAnalytics._

  private def storeOf(rows: Seq[(String, String, String, Long)]) =
    rows.toDF("tenant_id", "symbol_a", "symbol_b", "cooccurrence_count")

  // a-b:5, b-c:3, c-d:1 — weights sum a=5, b=8, c=4, d=1.
  private val chain = storeOf(Seq(
    ("t", "a", "b", 5L), ("t", "b", "c", 3L), ("t", "c", "d", 1L)))

  test("degree centrality: both-endpoint weight sums normalized by the max (operations.rs get_degree_centrality)") {
    val deg = centralityOf(chain, minCount = 3).collect()
      .filter(_.getAs[String]("section") == "degree")
      .map(r => r.getAs[String]("symbol") -> r.getAs[Double]("score")).toMap
    assert(deg == Map("a" -> 0.625, "b" -> 1.0, "c" -> 0.5, "d" -> 0.125))
  }

  test("neighbors: the probe's partners at weight >= min_count, both endpoint positions (operations.rs get_neighbors)") {
    // Max-degree probe is b; c-d (weight 1) is under the threshold.
    val nbrs = centralityOf(chain, minCount = 3).collect()
      .filter(_.getAs[String]("section") == "neighbors")
      .map(r => (r.getAs[String]("symbol"), r.getAs[String]("other"),
        r.getAs[Long]("weight"))).toSet
    assert(nbrs == Set(("b", "a", 5L), ("b", "c", 3L)))
  }

  test("2-hop betweenness: shared-endpoint edge pairs counted once, normalized (operations.rs get_betweenness_centrality)") {
    // Threshold 3 keeps a-b and b-c: one shared pair, bridge b.
    val btw = centralityOf(chain, minCount = 3).collect()
      .filter(_.getAs[String]("section") == "betweenness")
      .map(r => (r.getAs[String]("symbol"), r.getAs[Double]("score"),
        r.getAs[Long]("weight"))).toSet
    assert(btw == Set(("b", 1.0, 1L)))
    // A hub: x-y, x-z, x-w (all >= thr) → 3 pairs through x; y-z adds
    // bridges y (with x-y) and z (with x-z).
    val hub = storeOf(Seq(("t", "x", "y", 3L), ("t", "x", "z", 3L),
      ("t", "w", "x", 3L), ("t", "y", "z", 3L)))
    val btw2 = centralityOf(hub, minCount = 3).collect()
      .filter(_.getAs[String]("section") == "betweenness")
      .map(r => r.getAs[String]("symbol") -> r.getAs[Long]("weight")).toMap
    assert(btw2 == Map("x" -> 3L, "y" -> 1L, "z" -> 1L))
  }

  /** The reference's sequential greedy (find_clusters + expand), run
    * on collected edges with symbol-asc seed order. */
  private def greedyClusters(edges: Seq[(String, String)], maxHops: Int)
  : Seq[Set[String]] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var assigned = Set.empty[String]
    var out = Seq.empty[Set[String]]
    for (seed <- seeds if !assigned.contains(seed)) {
      var frontier = Set(seed); var reach = Set(seed)
      for (_ <- 0 until maxHops) {
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- reach
        reach ++= frontier
      }
      val cluster = reach -- assigned
      if (cluster.size >= 2) { assigned ++= cluster; out :+= cluster }
      else assigned += seed
    }
    out
  }

  test("find_clusters equals threshold-subgraph components when hops cover the diameter (operations.rs find_clusters)") {
    // Two components: {a,b,c} (chain) and {p,q}; d falls below thr.
    val st = storeOf(Seq(("t", "a", "b", 5L), ("t", "b", "c", 3L),
      ("t", "c", "d", 1L), ("t", "p", "q", 4L)))
    val got = clustersOf(st, minCount = 3).collect()
      .groupBy(_.getAs[String]("cluster_id"))
      .map { case (k, v) => k -> v.map(_.getAs[String]("symbol")).toSet }
    assert(got == Map("a" -> Set("a", "b", "c"), "p" -> Set("p", "q")))
    // The sequential greedy agrees at hops >= diameter (2 here).
    assert(greedyClusters(Seq(("a", "b"), ("b", "c"), ("p", "q")), 8)
      .map(_.toSet).toSet == Set(Set("a", "b", "c"), Set("p", "q")))
    // And DIVERGES when hops undershoot — the documented equivalence
    // condition, not an unconditional identity: a 3-chain at 1 hop
    // splits, leaving the tail single and unclustered.
    assert(greedyClusters(Seq(("a", "b"), ("b", "c")), 1)
      .map(_.toSet).toSet == Set(Set("a", "b")))
  }

  test("corpus threshold components stay within the hops=8 equivalence window") {
    val st = store(spark, sfDir)
    val edges = st.filter(col("cooccurrence_count") >= 3)
      .select(concat(col("tenant_id"), lit("|"), col("symbol_a")),
        concat(col("tenant_id"), lit("|"), col("symbol_b")))
      .as[(String, String)].collect().toSeq
    if (edges.nonEmpty) {
      val adj = (edges ++ edges.map(e => (e._2, e._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      // BFS eccentricity from every node; diameters must be <= 8.
      def ecc(start: String): Int = {
        var frontier = Set(start); var seen = Set(start); var d = 0
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
          if (frontier.nonEmpty) { seen ++= frontier; d += 1 }
        }
        d
      }
      assert(adj.keys.map(ecc).max <= 8)
    }
  }
}
