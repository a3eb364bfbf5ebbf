package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every operator has a `queries` entry; SQL-expressible ones also have a
  * DuckDB oracle in `oracleSql` with identical column names and
  * deterministic ordering (id tiebreaks, floats rounded on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreAnalytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Core analytics
    "q1_agg"        -> ((s, d) => CoreAnalytics.q1Agg(s, d)),
    "q3_join"       -> ((s, d) => CoreAnalytics.q3Join(s, d)),
    "q5_join_agg"   -> ((s, d) => CoreAnalytics.q5JoinAgg(s, d)),
    "topk_orders"   -> ((s, d) => CoreAnalytics.topkOrders(s, d)),
    "window_events" -> ((s, d) => CoreAnalytics.windowEvents(s, d)),
    "sessionize"    -> ((s, d) => CoreAnalytics.sessionize(s, d)),
  )

  /** DuckDB oracle SQL per query (same parquet tables, same aliases). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_join" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_join_agg" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS price_rank
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "window_events" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sessionize" ->
      """WITH lagged AS (
        |  SELECT event_id, user_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM lagged
        |), sessions AS (
        |  SELECT user_id, value,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, session_seq,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS session_value
        |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
