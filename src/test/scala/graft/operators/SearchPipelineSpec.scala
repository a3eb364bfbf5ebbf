package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Phase-contract tests for the composed client search pipeline
  * (flow.rs run_search_pipeline). */
class SearchPipelineSpec extends SparkSpec {

  test("corpus: fused hybrid list, sliced, capped, tiered") {
    val out = SearchPipeline.searchPipeline(spark, sfDir).collect()
    assert(out.length == 12)
    assert(out.forall(_.getAs[String]("search_type") == "hybrid"))
    assert(out.map(_.getAs[Int]("out_rnk")).toSeq == (1 to 12))
    val bySource = out.groupBy(r =>
      (r.getAs[String]("collection"), r.getAs[String]("tenant_id")))
    assert(bySource.forall { case (_, rs) =>
      rs.count(_.getAs[Boolean]("kept")) <= SourceDiversity.MaxPerSource })
    assert(out.map(_.getAs[String]("collection")).toSet ==
      Set("projects", "libraries"), "both collections searched and fused")
  }

  test("empty keyword leg passes through unfused (TS applyRRFFusion line-170 rule)") {
    val out = SearchPipeline.searchPipeline(spark, sfDir,
      query = "zzzzqqqqnomatch").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("search_type") == "semantic"),
      "no fusion when a leg is empty — tagged rows pass through")
  }

  test("empty dense leg passes through unfused (threshold starves the leg)") {
    val out = SearchPipeline.searchPipeline(spark, sfDir,
      threshold = 1.5).collect()
    // dense needs cos >= 1.5 (impossible); sparse threshold 0.75 still
    // admits strong BM25 scores.
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[String]("search_type") == "keyword"))
  }

  test("score threshold is per-leg, never post-fusion (the flow.rs:16 scratchpad rule)") {
    // Fused RRF scores are ~1/61-scale — far below the 0.02 leg
    // threshold. If the threshold were (wrongly) applied post-fusion,
    // the output would be empty.
    val out = SearchPipeline.searchPipeline(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Double]("score") < 0.05))
  }
}
