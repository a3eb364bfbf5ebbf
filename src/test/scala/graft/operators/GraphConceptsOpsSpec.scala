package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with the graph concepts/topics unit vectors
  * (concepts.rs / topics.rs tests) and the query arms. */
class GraphConceptsOpsSpec extends SparkSpec {

  import spark.implicits._

  test("extract_depth: valid json, absent metadata, malformed json (topics.rs extract_depth_*)") {
    val rows = Seq(
      ("a", """{"depth":"rigorous"}"""),
      ("b", null),
      ("c", """{"depth" :  "reference" }"""),
      ("d", """not json at all"""),
      ("e", """{"other":"x"}"""))
      .toDF("id", "meta")
      .select(col("id"), GraphConceptsOps.extractDepth(col("meta")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == Map("a" -> "rigorous", "b" -> "unknown",
      "c" -> "reference", "d" -> "unknown", "e" -> "unknown"))
  }

  test("depth sort order: reference first, unknown last (topics.rs depth_sort_order)") {
    val order = Seq("reference", "rigorous", "intermediate", "introductory",
      "qualitative", "whatever")
      .toDF("d").select(GraphConceptsOps.depthSortKey(col("d")).as("k"))
      .collect().map(_.getInt(0)).toSeq
    assert(order == Seq(0, 1, 2, 3, 4, 5))
  }

  test("query_concepts: depth filter guards only the covers arm; zero-edge concepts survive the LEFT JOIN (concepts.rs:94)") {
    val covers = Seq(
      ("t1", 1L, 5, "rigorous"), ("t1", 2L, 5, "qualitative"),
      ("t1", 3L, 9, "rigorous"))
      .toDF("tenant_id", "doc_id", "k", "depth")
      .withColumn("file_path", lit("p")).withColumn("chunk_type", lit("module"))
      .withColumn("metadata_json", lit("{}"))
    val impls = Seq(("t1", "n1", "sym", 5), ("t1", "n2", "sym2", 5))
      .toDF("tenant_id", "node_id", "symbol_name", "k")
    val all = GraphConceptsOps.graphConceptsOf(covers, impls).collect()
      .map(r => r.getAs[String]("concept") ->
        ((r.getAs[Long]("implements_count"), r.getAs[Long]("covers_count"))))
      .toMap
    assert(all("concept-5") == ((2L, 2L)))
    assert(all("concept-9") == ((0L, 1L))) // covers only
    val filtered = GraphConceptsOps
      .graphConceptsOf(covers, impls, depthFilter = Some("rigorous"))
      .collect().map(r => r.getAs[String]("concept") ->
        ((r.getAs[Long]("implements_count"), r.getAs[Long]("covers_count"))))
      .toMap
    // implements untouched; covers drops the qualitative edge.
    assert(filtered("concept-5") == ((2L, 1L)))
  }

  test("graph_concepts over the corpus: top-10 per tenant, totals ordered, the hash double-node counted distinctly") {
    val rows = GraphConceptsOps.graphConcepts(spark, sfDir).collect()
    val perTenant = rows.groupBy(_.getAs[String]("tenant_id"))
    assert(perTenant.values.forall(_.length == 10))
    perTenant.values.foreach { rs =>
      val totals = rs.map(r => r.getAs[Long]("implements_count") +
        r.getAs[Long]("covers_count"))
      assert(totals.sliding(2).forall(p => p.head >= p.last))
    }
    // `hash` contributes two distinct nodes to concept-12 everywhere.
    val c12 = rows.filter(_.getAs[String]("concept") == "concept-12")
    assert(c12.nonEmpty && c12.forall(_.getAs[Long]("implements_count") == 2L))
  }

  test("graph_topics: five parsed depth groups plus the metadata-less unknown group, display-ordered") {
    val rows = GraphConceptsOps.graphTopics(spark, sfDir).collect()
    val t = rows.filter(_.getAs[String]("tenant_id") == "src8")
    val depths = t.map(_.getAs[String]("depth")).distinct
    assert(depths.contains("unknown")) // data/key IMPLEMENTS arm
    val ords = t.map(_.getAs[Int]("dord"))
    assert(ords.sliding(2).forall(p => p.head <= p.last))
    assert(t.filter(_.getAs[String]("depth") == "unknown")
      .forall(_.getAs[String]("edge_type") == "IMPLEMENTS_CONCEPT"))
  }
}
