package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphAlgorithms, Grouping}

/** The budget-gated driver compact paths must agree EXACTLY with their
  * distributed twins — forced here by running each operator twice on
  * the corpus-derived order graph, once under the default budget
  * (compact) and once with the budget at zero (DataFrame-iterative),
  * and comparing full result sets.
  *
  * PageRank compares post-rounding scores (the operator contract is
  * round(rank, 6); the two paths associate float sums differently,
  * which is ~6 orders below that rounding). Labels and components are
  * exact integers/strings, so those compare raw.
  */
class CompactPathSpec extends SparkSpec {
  import spark.implicits._

  private def corpusEdges = GraphAlgorithms.edges(spark, sfDir)

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, Any] =
    df.collect().map(r => r.getString(0) -> r.get(1)).toMap

  test("pagerank: compact and distributed paths agree post-rounding") {
    val e = corpusEdges
    val compact = asMap(GraphAlgorithms.pageRankEdges(e, iterations = 15, damping = 0.85))
    val dist = asMap(GraphAlgorithms.pageRankEdges(e, iterations = 15, damping = 0.85,
      broadcastByteBudget = 0L))
    assert(compact == dist,
      s"diff: ${(compact.toSet diff dist.toSet).take(5)}")
  }

  test("communities: compact and distributed paths agree exactly") {
    val e = corpusEdges
    val compact = asMap(GraphAlgorithms.communitiesEdges(e, iterations = 10, minSize = 2))
    val dist = asMap(GraphAlgorithms.communitiesEdges(e, iterations = 10, minSize = 2,
      broadcastByteBudget = 0L))
    assert(compact == dist,
      s"diff: ${(compact.toSet diff dist.toSet).take(5)}")
  }

  test("connected components: union-find equals the propagation loop") {
    // chain (exercises pointer jumping over a long diameter) + clique +
    // isolated pair, all in one edge list
    val chain = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d"))
    val clique = for { a <- 40 to 44; b <- 40 to 44 if a < b } yield (s"n$a", s"n$b")
    val pair = Seq(("n90", "n91"))
    val edges = (chain ++ clique ++ pair).toDF("a", "b")
    val compact = asMap(Grouping.connectedComponents(edges))
    val dist = asMap(Grouping.connectedComponents(edges, compactEdgeLimit = 0L))
    assert(compact == dist)
    assert(compact("n15") == "n00" && compact("n44") == "n40" && compact("n91") == "n90")
  }

  test("connected components: corpus affinity graph agrees across paths") {
    val tags = operators.KeywordTags.keywordTags(spark, sfDir)
    val tenants = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source").as("tenant_id"))
    val edges = Grouping.tagAffinityEdges(tags, tenants)
    val compact = asMap(Grouping.connectedComponents(edges))
    val dist = asMap(Grouping.connectedComponents(edges, compactEdgeLimit = 0L))
    assert(compact == dist)
  }
}
