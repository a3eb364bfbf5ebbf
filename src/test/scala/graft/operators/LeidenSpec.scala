package graft.operators

import scala.collection.mutable

import graft.SparkSpec

/** Parity with the reference's Leiden test graphs
  * (graph/algorithms/leiden/tests.rs) through BOTH execution paths:
  * the compact sequential path and the bucketed-sync frontier path.
  */
class LeidenSpec extends SparkSpec {
  import spark.implicits._

  private def communitySets(rows: Array[org.apache.spark.sql.Row]): Set[Set[String]] =
    rows.groupBy(_.getString(1)).values.map(_.map(_.getString(0)).toSet).toSet

  private def cliqueEdges(r: Range, w: Double): Seq[(String, String, Double)] =
    (for (i <- r; j <- r if i < j) yield (s"n$i", s"n$j", w)).toSeq

  // reference: tests.rs int_a3_leiden_two_clusters — two unit-weight
  // 4-cliques with a weak 0.01 bridge split into exactly the cliques.
  test("leiden: two cliques with weak bridge — both paths recover the cliques") {
    val edges = cliqueEdges(0 until 4, 1.0) ++ cliqueEdges(4 until 8, 1.0) :+
      (("n1", "n5", 0.01))
    val e = edges.toDF("src", "dst", "w")
    val expected = Set((0 until 4).map(i => s"n$i").toSet, (4 until 8).map(i => s"n$i").toSet)
    val compact = Leiden.leidenEdges(spark, e, Leiden.Config())
    assert(communitySets(compact.collect()) == expected, "compact path")
    val frontier = Leiden.leidenEdges(spark, e, Leiden.Config(),
      broadcastByteBudget = 0L, buckets = 64)
    assert(communitySets(frontier.collect()) == expected, "frontier path")
  }

  // reference: tests.rs int_a3_leiden_recursion — dense 4-blobs (w=3.0)
  // with a full 1.2-weight bipartite bridge merge at γ=1 and are
  // recovered by the γ'=1.5 size-gated split.
  test("leiden: size-gated recursive split recovers the dense blobs") {
    val edges = cliqueEdges(0 until 4, 3.0) ++ cliqueEdges(4 until 8, 3.0) ++
      (for (i <- 0 until 4; j <- 4 until 8) yield (s"n$i", s"n$j", 1.2))
    val e = edges.toDF("src", "dst", "w")
    val expected = Set((0 until 4).map(i => s"n$i").toSet, (4 until 8).map(i => s"n$i").toSet)
    val config = Leiden.Config(resolution = 1.0, resolutionStep = 1.5,
      maxCommunityMembers = 6, minCommunityMembers = 3)
    val compact = Leiden.leidenEdges(spark, e, config)
    assert(communitySets(compact.collect()) == expected, "compact path")
  }

  private def adjOf(n: Int, edges: Seq[(Int, Int, Double)]): Array[Array[(Int, Double)]] = {
    val m = Array.fill(n)(mutable.TreeMap.empty[Int, Double])
    for ((a, b, w) <- edges if a != b) {
      m(a).updateWith(b)(o => Some(o.getOrElse(0.0) + w))
      m(b).updateWith(a)(o => Some(o.getOrElse(0.0) + w))
    }
    m.map(_.toArray)
  }

  // Pin the two stages of the recursion fixture separately: flat Leiden
  // at γ=1 must MERGE the blobs (the 1.2 bridge beats γ), and detect()
  // with the size gate must split them back at γ'=1.5.
  test("leiden internals: flat merge at γ=1, recursive split at γ'=1.5") {
    val edges = (for (i <- 0 until 4; j <- 0 until 4 if i < j) yield (i, j, 3.0)) ++
      (for (i <- 4 until 8; j <- 4 until 8 if i < j) yield (i, j, 3.0)) ++
      (for (i <- 0 until 4; j <- 4 until 8) yield (i, j, 1.2))
    val adj = adjOf(8, edges)
    val flat = Leiden.flatLeiden(adj, 1.0)
    assert(flat.distinct.length == 1, s"blobs must merge at γ=1, got ${flat.toSeq}")
    val split = Leiden.detect(adj, Leiden.Config(1.0, 1.5, 6, 3))
    val parts = (0 until 8).groupBy(split).values.map(_.toSet).toSet
    assert(parts == Set((0 until 4).toSet, (4 until 8).toSet),
      s"split must recover blobs, got $parts")
  }

  // A clique over the size cap is irreducible (CPM shatters it to
  // singletons at any higher γ) and must be kept whole (mod.rs:357).
  test("leiden: an oversize clique is kept whole, not shattered") {
    val adj = adjOf(6, for (i <- 0 until 6; j <- 0 until 6 if i < j) yield (i, j, 1.0))
    val split = Leiden.detect(adj, Leiden.Config(1.0, 1.5, 4, 2))
    assert(split.distinct.length == 1, s"clique fragmented: ${split.toSeq}")
  }

  test("graph_leiden covers every node exactly once with min-id community labels") {
    val rows = Leiden.graphLeiden(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length, "one row per node")
    rows.groupBy(_.getString(1)).foreach { case (comm, members) =>
      assert(members.map(_.getString(0)).min == comm,
        s"community label $comm must be its smallest member")
    }
  }

  // modularityOf against the textbook hand value: two unit triangles
  // joined by one bridge edge, split at the bridge -> Q = 5/14
  // (w_in/2m = 12/14, both community strengths 7/14 squared sum 1/2).
  test("modularityOf: hand-computed Q on two bridged triangles") {
    val edges = Seq(("a","b",1.0),("b","c",1.0),("a","c",1.0),
      ("d","e",1.0),("e","f",1.0),("d","f",1.0),("c","d",1.0))
    val und = edges.flatMap { case (u,v,w) => Seq((u,v,w),(v,u,w)) }
      .toDF("u","v","w")
    val mem = Seq(("a","A"),("b","A"),("c","A"),("d","B"),("e","B"),("f","B"))
      .toDF("node_id","community")
    val q = Leiden.modularityOf(und, mem).collect()(0).getDouble(0)
    assert(math.abs(q - 5.0/14.0) < 1e-12, s"expected 5/14, got $q")

    // filter-tolerant singleton default: an EMPTY membership means
    // every node is its own community -> w_in = 0, Q = -sum (k/2m)^2
    // = -(4*(2/14)^2 + 2*(3/14)^2) = -34/196
    val qEmpty = Leiden.modularityOf(und,
      Seq.empty[(String, String)].toDF("node_id","community"))
      .collect()(0).getDouble(0)
    assert(math.abs(qEmpty - (-34.0/196.0)) < 1e-12, s"expected -34/196, got $qEmpty")

    // one-community degenerate: Q = 1 - 1 = 0
    val qOne = Leiden.modularityOf(und,
      Seq("a","b","c","d","e","f").map((_, "X")).toDF("node_id","community"))
      .collect()(0).getDouble(0)
    assert(math.abs(qOne) < 1e-12, s"expected 0, got $qOne")
  }
}
