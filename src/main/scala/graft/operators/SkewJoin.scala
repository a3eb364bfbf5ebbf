package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-salting demonstration: a fact-fact equi-join on a DELIBERATELY
  * skewed key (80% of the corpus lands on one key), executed with the
  * salt-and-explode pattern so the hot key's work spreads across the
  * cluster instead of wedging one reducer.
  *
  * This is the shape the reference's hot spots take at 100 TB — a jumbo
  * MinHash band bucket, one pathological term — where BOTH sides are
  * too large to broadcast. At bench scale the optimizer would broadcast
  * the smaller side (hiding the skew), so both sides carry a merge hint
  * to force the large-large shuffle-join path this demonstrates; the
  * salting itself is what PlanSpec locks.
  *
  * Pattern: the skewed probe side gets a deterministic per-row salt
  * (hash of its unique id mod S); the build side is replicated to every
  * salt via explode; the join key becomes (key, salt) — same results,
  * S-way parallel hot key. Measured at sf0.1/local[32] (salt = 16,
  * hot key ≈ 252M pairs, `runMain graft.Probe skew_join[_unsalted]`):
  * unsalted 14.2 s cold / 5.9 s warm, salted 12.8 s cold / 4.6 s warm.
  * Net of the ~2.5 s of scan+JSON costs both plans share, the join
  * stage itself speeds up ~1.6× — modest here because a codegen'd
  * double-compare makes the hot task cheap; the gap grows linearly
  * with the hot key's share of work (at 100 TB the hot bucket is the
  * job's critical path, the fixed costs are noise) and with occupancy
  * (21 live partitions unsalted vs 336 salted on a 1000-core cluster).
  */
object SkewJoin {

  /** Events with the deliberately skewed key: k < 80 collapses to hot
    * key 0, the rest spread to 1..20. */
  private def keyed(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .withColumn("skew_key",
        when(col("k") < 80, lit(0)).otherwise(col("k") - 79))

  private def sides(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = keyed(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("skew_key"), col("value").as("cv"), col("event_id"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("skew_key"), col("value").as("ev"))
    (clicks, errors)
  }

  /** Salted pair-count: clicks × errors on skew_key, counting pairs
    * where the click outvalues the error — integer output, exact under
    * the DuckDB oracle. */
  def skewJoin(spark: SparkSession, dir: String, salt: Int = 16): DataFrame = {
    val (clicks, errors) = sides(spark, dir)
    val saltedClicks = clicks
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(salt)).cast("int"))
      .drop("event_id")
    val spreadErrors = errors
      .withColumn("salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedClicks.hint("merge").join(spreadErrors.hint("merge"), Seq("skew_key", "salt"))
      .filter(col("cv") > col("ev"))
      .groupBy(col("skew_key"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("skew_key"))
  }

  /** The straggler baseline (dev/probe only — NOT registered as a
    * query): identical semantics, join keyed on skew_key alone, so the
    * hot key's entire cross product lands on one task. */
  def skewJoinUnsalted(spark: SparkSession, dir: String): DataFrame = {
    val (clicks, errors) = sides(spark, dir)
    clicks.drop("event_id").hint("merge").join(errors.hint("merge"), Seq("skew_key"))
      .filter(col("cv") > col("ev"))
      .groupBy(col("skew_key"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("skew_key"))
  }
}
