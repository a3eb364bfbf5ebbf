package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Graph analytics over a relationship graph derived from the TPC-H-ish
  * tables, mirroring the reference's code-graph algorithm suite
  * (reference: src/rust/daemon/core/src/graph/algorithms/ —
  * pagerank.rs: damping 0.85 + dangling-mass redistribution;
  * community.rs: label propagation with deterministic tie-breaks;
  * betweenness.rs: Brandes with source sampling).
  *
  * The graph: supplier → customer edges through shared orders
  * (lineitem ⋈ orders, distinct pairs). Nodes are namespaced ids
  * (`s<k>`, `c<k>`).
  *
  * Scale posture: PageRank and label propagation are DataFrame-iterative
  * — edges cached once, each iteration one shuffle on dst, lineage
  * truncated with localCheckpoint. Betweenness broadcasts the
  * *aggregated* adjacency (orders of magnitude smaller than the raw
  * data) and parallelizes Brandes sources across the cluster — the same
  * export-then-compute shape as the reference, but with distributed
  * sources instead of a single thread.
  */
object GraphAlgorithms {

  /** Distinct supplier→customer edges via shared orders. */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("c"), col("o_custkey")).as("dst"))
      .distinct()
  }

  /** Degree centrality — exact integer degrees per node. */
  def degree(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val out = e.groupBy(col("src").as("node_id")).agg(count(lit(1)).as("out_degree"))
    val in = e.groupBy(col("dst").as("node_id")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("node_id"), "full_outer")
      .select(col("node_id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .orderBy(col("node_id"))
  }

  /** PageRank (pagerank.rs semantics): damping 0.85, dangling mass
    * redistributed uniformly each iteration, fixed iteration count for
    * deterministic plans. Output: node_id, round(score, 6).
    */
  def pageRank(spark: SparkSession, dir: String,
               iterations: Int = 15, damping: Double = 0.85): DataFrame =
    pageRankEdges(edges(spark, dir), iterations, damping)

  /** PageRank over any (src, dst) edge DataFrame — the generic core,
    * also fed the reference's own test graphs by the parity specs.
    */
  def pageRankEdges(edgeDf: DataFrame,
                    iterations: Int, damping: Double): DataFrame = {
    val e = edgeDf.cache()
    val nodes = e.select(col("src").as("node_id"))
      .union(e.select(col("dst"))).distinct().cache()
    val n = nodes.count().toDouble

    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))

    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      // Mass from dangling nodes (no outgoing edges) spreads uniformly;
      // computed as a broadcast 1-row aggregate, NOT a driver collect,
      // so each iteration is a single job with no action barrier.
      val dangling = ranks.join(outDeg, ranks("node_id") === outDeg("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling_mass"))
      val contribs = e
        .join(ranks, e("src") === ranks("node_id"))
        .join(outDeg, "src")
        .select(col("dst").as("node_id"), (col("rank") / col("out_deg")).as("contrib"))
        .groupBy(col("node_id")).agg(sum(col("contrib")).as("in_contrib"))
      // Eager checkpoint every 2 iterations: bounds lineage depth (the
      // unchecked plan recomputes quadratically) while halving the
      // materialization jobs vs per-iteration checkpointing.
      ranks = nodes.join(contribs, Seq("node_id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node_id"),
          (lit((1 - damping) / n) + lit(damping) *
            (coalesce(col("in_contrib"), lit(0.0)) + col("dangling_mass") / n)).as("rank"))
      if (i % 2 == 0 || i == iterations) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node_id"), round(col("rank"), 6).as("score"))
      .orderBy(col("node_id"))
  }

  /** Label-propagation communities (community.rs semantics: undirected
    * neighbours, most-frequent label, smallest label on ties,
    * min_community_size filter). Synchronous iterations with self-loops
    * for stability; labels are integers, so the fixpoint is exact and
    * deterministic.
    */
  def communities(spark: SparkSession, dir: String,
                  iterations: Int = 10, minSize: Int = 2): DataFrame =
    communitiesEdges(edges(spark, dir), iterations, minSize)

  /** Label propagation over any (src, dst) edge DataFrame. */
  def communitiesEdges(edgeDf: DataFrame,
                       iterations: Int, minSize: Int): DataFrame = {
    val e = edgeDf
    val undirected = e.select(col("src").as("a"), col("dst").as("b"))
      .union(e.select(col("dst"), col("src")))
      .distinct().cache()
    val nodes = undirected.select(col("a").as("node_id")).distinct()

    // Initial label = stable per-node integer (dense hash of the id).
    var labels = nodes.withColumn("label", xxhash64(col("node_id")))
    for (i <- 1 to iterations) {
      // Each node votes its label to neighbours; self-vote stabilizes.
      val votes = undirected
        .join(labels, undirected("b") === labels("node_id"))
        .select(col("a").as("node_id"), col("label"))
        .union(labels.select(col("node_id"), col("label")))
      val counted = votes.groupBy(col("node_id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("node_id")).orderBy(col("cnt").desc, col("label"))
      labels = counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("node_id"), col("label"))
      // eager every 2: bound lineage without a job per iteration
      if (i % 2 == 0 || i == iterations) labels = labels.localCheckpoint()
    }
    // Normalize community ids to the minimum member node id; drop tiny ones.
    val sized = labels
      .withColumn("community", min(col("node_id")).over(Window.partitionBy(col("label"))))
      .withColumn("csize", count(lit(1)).over(Window.partitionBy(col("label"))))
      .filter(col("csize") >= minSize)
    sized.select(col("node_id"), col("community"))
      .orderBy(col("node_id"))
  }

  /** Brandes betweenness centrality with source sampling
    * (betweenness.rs): the aggregated adjacency is broadcast, sample
    * sources run in parallel across the cluster, per-node dependency
    * sums are reduced, scores scaled by n/samples and normalised to
    * [0, 1] like the reference.
    */
  def betweenness(spark: SparkSession, dir: String,
                  maxSamples: Int = 64): DataFrame = {
    import spark.implicits._
    val e = edges(spark, dir)
    val edgeList = e.collect().map(r => (r.getString(0), r.getString(1)))
    val nodeIds = edgeList.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val idx = nodeIds.zipWithIndex.toMap
    val nNodes = nodeIds.length
    // Undirected expansion: the derived supplier→customer graph is
    // bipartite, so directed shortest paths have length 1 and every
    // betweenness would be 0; the reference's code graphs are mixed.
    val adj = Array.fill(nNodes)(scala.collection.mutable.ArrayBuffer[Int]())
    edgeList.foreach { case (s, d) => adj(idx(s)) += idx(d); adj(idx(d)) += idx(s) }
    val adjArr = adj.map(_.distinct.sorted.toArray)
    val bAdj = spark.sparkContext.broadcast(adjArr)

    val samples = math.min(maxSamples, nNodes)
    val sources = (0 until samples) // first k in index order, like the reference
    val partial = spark.sparkContext.parallelize(sources, math.min(samples, 32))
      .mapPartitions { srcIter =>
        val a = bAdj.value
        val nn = a.length
        val acc = new Array[Double](nn)
        srcIter.foreach { s =>
          // Brandes single-source: BFS + dependency accumulation.
          val dist = Array.fill(nn)(-1)
          val sigma = new Array[Double](nn)
          val delta = new Array[Double](nn)
          val preds = Array.fill(nn)(scala.collection.mutable.ArrayBuffer[Int]())
          val stack = scala.collection.mutable.ArrayBuffer[Int]()
          val queue = scala.collection.mutable.Queue[Int]()
          dist(s) = 0; sigma(s) = 1.0; queue.enqueue(s)
          while (queue.nonEmpty) {
            val v = queue.dequeue()
            stack += v
            a(v).foreach { wn =>
              if (dist(wn) < 0) { dist(wn) = dist(v) + 1; queue.enqueue(wn) }
              if (dist(wn) == dist(v) + 1) { sigma(wn) += sigma(v); preds(wn) += v }
            }
          }
          stack.reverseIterator.foreach { wn =>
            preds(wn).foreach { v =>
              delta(v) += (sigma(v) / sigma(wn)) * (1.0 + delta(wn))
            }
            if (wn != s) acc(wn) += delta(wn)
          }
        }
        Iterator.single(acc)
      }
      .reduce { (x, y) => var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x }

    val scale = if (samples < nNodes) nNodes.toDouble / samples else 1.0
    val maxScore = partial.map(_ * scale).foldLeft(0.0)(math.max)
    val rows = nodeIds.indices.map { i =>
      val raw = partial(i) * scale
      (nodeIds(i), if (maxScore > 0) BigDecimal(raw / maxScore).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble else 0.0)
    }
    rows.toDF("node_id", "score").orderBy(col("node_id"))
  }
}
