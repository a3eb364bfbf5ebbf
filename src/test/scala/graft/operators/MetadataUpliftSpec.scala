package graft.operators

import graft.SparkSpec

/** Parity with the reference's uplift candidate selection
  * (metadata_uplift.rs:61 find_points_needing_uplift): the three-status
  * should filter, the generation gate with absent = 0, and the
  * batch cap in scroll order.
  */
class MetadataUpliftSpec extends SparkSpec {

  private def points(rows: Seq[(String, Long, String, java.lang.Long)]) = {
    import spark.implicits._
    rows.toDF("collection", "point_id", "lsp_enrichment_status", "uplift_generation")
  }

  test("only failed/partial/pending statuses are candidates (metadata_uplift.rs:68)") {
    val out = MetadataUplift.upliftSelectOf(points(Seq(
      ("c", 1L, "failed", 0L), ("c", 2L, "partial", 0L),
      ("c", 3L, "pending", 0L), ("c", 4L, "ok", 0L), ("c", 5L, "done", 0L))),
      currentGeneration = 1L, batchSize = 10).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("generation gate skips points already at the current generation (:99)") {
    val out = MetadataUplift.upliftSelectOf(points(Seq(
      ("c", 1L, "failed", 0L), ("c", 2L, "failed", 1L), ("c", 3L, "failed", 2L))),
      currentGeneration = 2L, batchSize = 10).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
  }

  test("absent uplift_generation counts as 0 (:95 unwrap_or)") {
    val out = MetadataUplift.upliftSelectOf(points(Seq(
      ("c", 1L, "failed", null))), currentGeneration = 1L, batchSize = 10).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("batch cap applies per collection in point-id scroll order") {
    val rows = (1L to 15L).map(i => ("a", i, "failed", 0L: java.lang.Long)) ++
      (1L to 3L).map(i => ("b", i, "pending", 0L: java.lang.Long))
    val out = MetadataUplift.upliftSelectOf(points(rows),
      currentGeneration = 1L, batchSize = 10).collect()
    val byColl = out.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    assert(byColl("a") == (1L to 10L))
    assert(byColl("b") == (1L to 3L))
  }

  test("uplift_select on the corpus: all three statuses and both kept generations") {
    val rows = MetadataUplift.upliftSelect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(2)).toSet.subsetOf(Set("failed", "partial", "pending")))
    assert(rows.forall(_.getLong(3) < 2L))
    rows.groupBy(_.getString(0)).foreach { case (_, g) => assert(g.length <= 10) }
  }
}
