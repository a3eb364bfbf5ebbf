package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Core relational analytics over the TPC-H-ish tables.
  *
  * These anchor correctness (DuckDB oracle hash-match) and the benchmark
  * headline. Written declaratively so Catalyst does pushdown/pruning and
  * AQE picks join strategies; dimension tables are explicitly broadcast.
  *
  * Scale posture: q1/q5 are scan+partial-agg (map-side combine, one
  * shuffle on the group keys); q3 shuffles on the fact-fact join key only
  * — customer is broadcast. Top-k uses `orderBy.limit` which Spark plans
  * as TakeOrderedAndProject (per-partition heaps, no global sort).
  */
object CoreAnalytics {

  /** Pricing-summary aggregate (TPC-H Q1 shape): one scan of lineitem,
    * partial aggregation before the single shuffle on (returnflag,
    * linestatus). Floats rounded for oracle stability.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Shipping-priority top-10 (TPC-H Q3 shape). `customer` is a broadcast
    * dim; orders⋈lineitem shuffles on the orderkey. Deterministic top-k
    * via revenue desc + orderkey tiebreak → TakeOrderedAndProject.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")

    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  }

  /** Local-supplier-volume star join (TPC-H Q5 shape): lineitem ⋈ orders ⋈
    * customer ⋈ supplier ⋈ nation ⋈ region with all dims broadcast; the
    * only shuffles are the two fact joins and the final group on n_name.
    */
  def q5JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Deterministic top-k orders by totalprice with rank window — exercises
    * a window over a single shuffle-free sort of the (small) top slice.
    */
  def topkOrders(spark: SparkSession, dir: String): DataFrame = {
    val top = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
    top.withColumn("price_rank",
      row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
  }

  /** Tumbling 1-hour window aggregation over the events stream table —
    * the batch twin of the Structured Streaming windowed agg.
    */
  def windowEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_start"), col("event_type"))

  /** 30-minute-gap sessionization: per-user lag → new-session flag →
    * running sum = session id. Two window functions over one shuffle on
    * user_id; scales as events are partitioned by user.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = 30 * 60
    Tables.events(spark, dir)
      .select("event_id", "user_id", "ts", "value")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("session_value"))
      .orderBy(col("user_id"), col("session_seq"))
  }
}
