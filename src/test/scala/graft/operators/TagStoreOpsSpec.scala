package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the tags CLI read layer (cli/commands/tags/): the
  * summary GROUP BY + LIMIT shape, the search LIKE + display-name map,
  * and the per-tenant stats arithmetic (stats.rs:70).
  */
class TagStoreOpsSpec extends SparkSpec {

  import spark.implicits._

  private val tagRows = Seq(
    // (tenant, collection, doc, tag, type, score)
    ("t1", "projects", 1L, "data model", "concept", 0.8),
    ("t1", "projects", 2L, "data model", "concept", 0.6),
    ("t1", "projects", 1L, "parser", "concept", 0.9),
    ("t1", "projects", 1L, "path:t1", "path", 0.5),   // non-concept: excluded
    ("t2", "projects", 3L, "data model", "concept", 0.4),
    ("t1", "libraries", 4L, "data model", "concept", 0.7) // other collection
  ).toDF("tenant_id", "collection", "doc_id", "tag", "tag_type", "score")

  test("tags summary: concept-only frequency with avg score, doc_count order (summary.rs:34)") {
    val rows = TagStoreOps.tagSummaryOf(tagRows, "t1", "projects", 10).collect()
    assert(rows.map(_.getAs[String]("tag")).toSeq == Seq("data model", "parser"))
    val dm = rows.head
    assert(dm.getAs[Long]("doc_count") == 2L)
    assert(math.abs(dm.getAs[Double]("avg_score") - 0.7) < 1e-9)
    // LIMIT cuts after the tie-broken order
    assert(TagStoreOps.tagSummaryOf(tagRows, "t1", "projects", 1)
      .collect().map(_.getAs[String]("tag")).toSeq == Seq("data model"))
  }

  test("tags search: LIKE filter, per-tenant grouping, display-name fallback (search.rs:36)") {
    val names = Seq(("t1", "alpha")).toDF("map_tenant", "display_name")
    val rows = TagStoreOps.tagSearchOf(tagRows, names, "data", "projects", 50)
      .collect()
    assert(rows.length == 2) // (data model, t1), (data model, t2); parser filtered
    val byTenant = rows.map(r => r.getAs[String]("tenant_id") -> r).toMap
    assert(byTenant("t1").getAs[String]("project") == "alpha")
    assert(byTenant("t2").getAs[String]("project") == "t2") // no map entry
    assert(byTenant("t1").getAs[Long]("doc_count") == 2L)
  }

  test("tags stats: per-tenant doc/keyword/tag/canonical arithmetic (stats.rs:70)") {
    val kw = Seq(
      ("t1", "projects", 1L, "alpha", 0.5),
      ("t1", "projects", 1L, "beta", 0.5),
      ("t1", "projects", 2L, "alpha", 0.5),
      ("t2", "projects", 3L, "gamma", 0.5))
      .toDF("tenant_id", "collection", "doc_id", "keyword", "score")
    val canon = Seq(("t1", "projects", "alpha"))
      .toDF("tenant_id", "collection", "tag")
    val names = Seq.empty[(String, String)].toDF("map_tenant", "display_name")
    val rows = TagStoreOps.tagStatsOf(kw, tagRows, canon, names, "projects")
      .collect().map(r => r.getAs[String]("tenant_id") -> r).toMap
    val t1 = rows("t1")
    assert(t1.getAs[Long]("doc_count") == 2L)       // docs 1, 2 in keywords
    assert(t1.getAs[Double]("avg_keywords") == 1.5) // 3 kw rows / 2 docs
    assert(t1.getAs[Double]("avg_tags") == 1.5)     // 3 concept tags / 2 docs
    assert(t1.getAs[Long]("canonical_count") == 1L)
    val t2 = rows("t2")
    assert(t2.getAs[Long]("doc_count") == 1L && t2.getAs[Long]("canonical_count") == 0L)
  }

  test("store derivation: top-5 concept tags per doc plus one path tag") {
    val docs = Seq((1L, "alpha beta alpha gamma delta epsilon zeta eta", "en", "src1", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // build the store pieces directly over a tiny docs frame
    val tf = SparseSearch.termFreq(docs)
    assert(tf.filter(col("term") === "alpha").collect().head.getAs[Long]("tf") == 2L)
  }
}
