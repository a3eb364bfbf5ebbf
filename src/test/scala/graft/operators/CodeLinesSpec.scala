package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CodeLinesOps._

/** Reference vectors from search_db/tests_rebalance.rs and
  * code_lines_schema.rs. */
class CodeLinesSpec extends SparkSpec {

  test("initial and midpoint seq (code_lines_schema.rs:44,52 + test_code_lines_gap_insertion)") {
    assert(initialSeq(0) == 1000.0)
    assert(initialSeq(1) == 2000.0)
    assert(initialSeq(2) == 3000.0)
    assert(midpointSeq(1000.0, 2000.0) == 1500.0)
    assert(midpointSeq(1.0, 1.0002) == 1.0001)
  }

  test("needs_rebalance thresholds (test_needs_rebalance)") {
    assert(needsRebalance(0.0005))
    assert(needsRebalance(0.0001))
    assert(!needsRebalance(0.001))
    assert(!needsRebalance(1.0))
    assert(!needsRebalance(1000.0))
  }

  test("insert between basic: midpoint keeps order, no rebalance (test_insert_line_between_basic)") {
    import spark.implicits._
    val state = Seq((1L, 1000.0, "line 1"), (1L, 2000.0, "line 2"),
      (1L, midpointSeq(1000.0, 2000.0), "inserted"))
      .toDF("doc_id", "seq", "content")
    val out = rebalanceOf(state).orderBy("line_number").collect()
    assert(out.map(_.getAs[String]("content")).toSeq ==
      Seq("line 1", "inserted", "line 2"))
    assert(out.forall(!_.getAs[Boolean]("rebalanced")))
    assert(out.map(_.getAs[Double]("seq")).toSeq == Seq(1000.0, 1500.0, 2000.0))
  }

  test("cramped gaps trigger file-local re-gap to 1000-multiples (test_insert_between_triggers_rebalance)") {
    import spark.implicits._
    // gap 0.0001 after the midpoint insert — below MIN_SEQ_GAP
    val state = Seq(
      (1L, 1.0, "line a"), (1L, midpointSeq(1.0, 1.0002), "line mid"), (1L, 1.0002, "line b"),
      (2L, 1000.0, "x"), (2L, 2000.0, "y")) // untouched file
      .toDF("doc_id", "seq", "content")
    val out = rebalanceOf(state)
    val f1 = out.filter(col("doc_id") === 1).orderBy("line_number").collect()
    assert(f1.map(_.getAs[Double]("seq")).toSeq == Seq(1000.0, 2000.0, 3000.0))
    assert(f1.map(_.getAs[String]("content")).toSeq == Seq("line a", "line mid", "line b"))
    assert(f1.forall(_.getAs[Boolean]("rebalanced")))
    // rebalance is file-local (test_rebalance_file_local)
    val f2 = out.filter(col("doc_id") === 2).orderBy("line_number").collect()
    assert(f2.map(_.getAs[Double]("seq")).toSeq == Seq(1000.0, 2000.0))
    assert(f2.forall(!_.getAs[Boolean]("rebalanced")))
  }

  test("min gap is NULL under two lines (test_min_seq_gap)") {
    import spark.implicits._
    val state = Seq((1L, 1000.0, "a"),
      (2L, 1000.0, "a"), (2L, 1500.0, "b"), (2L, 1501.0, "c"))
      .toDF("doc_id", "seq", "content")
    val out = rebalanceOf(state)
    val one = out.filter(col("doc_id") === 1).collect()
    assert(one.length == 1 && one.head.isNullAt(one.head.fieldIndex("min_gap")))
    assert(!one.head.getAs[Boolean]("rebalanced"))
    val two = out.filter(col("doc_id") === 2).collect()
    assert(two.forall(_.getAs[Double]("min_gap") == 1.0))
  }

  test("corpus: depth >= 20 files rebalance, shallower keep midpoints") {
    val out = codeLinesRebalance(spark, sfDir).cache()
    try {
      val byDoc = out.groupBy("doc_id")
        .agg(first("rebalanced").as("rebalanced"), min("min_gap").as("g"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getDouble(2))).toSeq
      assert(byDoc.nonEmpty)
      byDoc.foreach { case (docId, reb, g) =>
        val k = (docId % 20 + 5).toInt
        val expectedGap = 1000.0 / math.pow(2, k)
        assert(g == expectedGap, s"doc $docId depth $k")
        assert(reb == (k >= 20), s"doc $docId depth $k rebalanced=$reb")
      }
      // rebalanced files sit exactly on 1000-multiples
      val rebalancedSeqs = out.filter(col("rebalanced"))
        .select((col("seq") === col("line_number") * 1000.0).as("ok")).collect()
      assert(rebalancedSeqs.forall(_.getBoolean(0)))
    } finally out.unpersist()
  }
}
