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
    // NaN guard: in the pair-enumeration form a NaN value joins to
    // nothing (NaN comparisons are false), but in the rank form NaN
    // SORTS above every double, so a NaN click would count every error
    // in its key. Excluding NaN rows up front gives both twins the
    // enumeration's semantics exactly (the corpus has no NaN; this
    // pins the contract rather than relying on that).
    val ev = keyed(spark, dir).filter(!isnan(col("value")))
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

  /** The same pair-count computed ANALYTICALLY in O(n log n) — the
    * other 100 TB answer to a skewed pair-enumeration: when the join's
    * aggregate is an order statistic, don't enumerate pairs at all.
    * `count{(c,e) : cv > ev}` per key = for each click, the number of
    * errors strictly below its value — a running error-count over the
    * value-sorted stream. The ×10 scale bench measured skew_join's
    * enumeration at exponent 1.49 (the hot key's pair set is ~n²·0.64
    * by design: 252M pairs at sf0.1, 25.2B at ×10); this twin computes
    * the identical integers from a sort.
    *
    * The running sum is DISTRIBUTED (the hot key never lands on one
    * task): range-partition by the full sort key so each task holds a
    * value-contiguous slice, window inside each (key, slice) — the
    * window's hash shuffle keeps slices intact and parallel — then add
    * per-slice error-count offsets, a frame with one row per (key,
    * slice) that a window over slice ids prefix-sums and a broadcast
    * join maps back. Ties: clicks sort before errors at equal value
    * (in BOTH the range key and the window key), so an equal-valued
    * error can neither precede a click across slices nor inside one —
    * strict `cv > ev` exactly.
    */
  def skewJoinRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (clicks, errors) = sides(spark, dir)
    val all = clicks.drop("event_id")
      .select(col("skew_key"), col("cv").as("value"), lit(0).as("is_err"))
      .unionByName(errors
        .select(col("skew_key"), col("ev").as("value"), lit(1).as("is_err")))
    val shufP = spark.sessionState.conf.numShufflePartitions
    // Pin ONE physical evaluation of the slice assignment (same fix as
    // Packing.packSequencesOf): repartitionByRange samples boundaries
    // with an RDD-id-derived seed, and the two consumers (window +
    // offsets) agree only while exchange reuse dedupes the shuffle.
    val sliced = all
      .repartitionByRange(shufP, col("skew_key"), col("value"), col("is_err"))
      .withColumn("slice", spark_partition_id())
      .localCheckpoint()
    val local = Window.partitionBy(col("skew_key"), col("slice"))
      .orderBy(col("value"), col("is_err"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = sliced
      .withColumn("errs_local", sum(col("is_err")).over(local))
    // One row per (key, slice): total errors in the slice; offset for a
    // slice = errors in all PRIOR slices of the same key.
    val offsets = sliced.groupBy(col("skew_key"), col("slice"))
      .agg(sum(col("is_err")).as("slice_errs"))
      .withColumn("offset",
        coalesce(sum(col("slice_errs")).over(
          Window.partitionBy(col("skew_key")).orderBy(col("slice"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("skew_key"), col("slice"), col("offset"))
    withLocal
      .join(broadcast(offsets), Seq("skew_key", "slice"))
      .filter(col("is_err") === 0)
      .groupBy(col("skew_key"))
      .agg(sum(col("errs_local") + col("offset")).as("n_pairs"))
      // the join form emits a key only when ≥1 qualifying pair exists
      .filter(col("n_pairs") > 0)
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
