package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftFunctions, SparkSpec}

/** graft_sorted_intersect_count ≡ size(array_intersect) on sorted+distinct
  * long arrays — the verify-stage contract dedup_minhash relies on.
  */
class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  test("sorted intersect count equals size(array_intersect) on random sets") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val a = Seq.fill(rng.nextInt(50))(rng.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rng.nextInt(50))(rng.nextInt(60).toLong).distinct.sorted
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("merge", GraftFunctions.sortedIntersectCount(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("merge") =!= col("builtin")).collect()
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  test("sorted intersect count edge cases: empty, disjoint, identical, null") {
    val df = Seq(
      (1, Seq.empty[Long], Seq(1L, 2L)),
      (2, Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (3, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (4, Seq(-5L, 0L, 9L), Seq(-5L, 9L, 10L)))
      .toDF("id", "a", "b")
      .withColumn("c", GraftFunctions.sortedIntersectCount(col("a"), col("b")))
    val got = df.select("id", "c").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 0L, 2 -> 0L, 3 -> 3L, 4 -> 2L))
    // null input → null out (BinaryExpression null semantics)
    val n = Seq((1, Seq(1L, 2L))).toDF("id", "a")
      .withColumn("c", GraftFunctions.sortedIntersectCount(col("a"), lit(null).cast("array<bigint>")))
      .select("c").collect().head
    assert(n.isNullAt(0))
  }

  test("sorted intersect count is registered for SQL via extensions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L,2L,3L), array(2L,3L,4L)) AS c")
      .collect().head.getLong(0)
    assert(r == 2L)
  }
}
