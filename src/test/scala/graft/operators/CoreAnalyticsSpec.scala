package graft.operators

import graft.SparkSpec

class CoreAnalyticsSpec extends SparkSpec {

  test("q1_agg groups lineitem into a small summary with positive sums") {
    val rows = CoreAnalytics.q1Agg(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val sumQty = rows.map(_.getAs[Double]("sum_qty")).sum
    assert(sumQty > 0)
    // deterministic output order
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("q3_join returns exactly top-10 by revenue, descending") {
    val rows = CoreAnalytics.q3Join(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue")).toSeq
    assert(revs == revs.sortBy(-_))
  }

  test("q3_join plan broadcasts the customer dim") {
    val plan = CoreAnalytics.q3Join(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("q1_agg plan pushes the shipdate filter into the parquet scan") {
    val plan = CoreAnalytics.q1Agg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), s"no pushed filter in:\n$plan")
  }

  test("topk_orders ranks 1..k with deterministic tiebreak") {
    val rows = CoreAnalytics.topkOrders(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("price_rank")).toSeq == (1 to rows.length))
    val prices = rows.map(_.getAs[Double]("o_totalprice")).toSeq
    assert(prices == prices.sortBy(-_))
  }

  test("sessionize assigns increasing session ids per user") {
    val rows = CoreAnalytics.sessionize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val seqs = rs.map(_.getAs[Long]("session_seq")).toSeq
      assert(seqs == (1L to seqs.length))
    }
  }

  test("window_events buckets are hour-aligned") {
    val rows = CoreAnalytics.windowEvents(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = r.getAs[java.sql.Timestamp]("window_start")
      assert(ts.getTime % 3600000L == 0L)
    }
  }
}
