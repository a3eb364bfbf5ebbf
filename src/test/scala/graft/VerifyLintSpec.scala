package graft

import org.apache.spark.sql.functions._

/** The registered-dump lint (Verify.lintSchema) must reject every
  * column type the driver's pandas canon cannot hash — arrays, maps,
  * structs, binary — naming the operator and offending column, and
  * must pass scalar frames untouched (including the sub-long integrals
  * the driver canon is known to upcast).
  */
class VerifyLintSpec extends SparkSpec {
  import spark.implicits._

  test("lint rejects array, map, struct and binary columns by name") {
    val base = Seq((1L, "x")).toDF("id", "s")
    val cases = Seq(
      "arr" -> base.withColumn("arr", array(lit("a"), lit("b"))),
      "mp" -> base.withColumn("mp", map(lit("k"), lit(1))),
      "st" -> base.withColumn("st", struct(lit(1).as("a"))),
      "bin" -> base.withColumn("bin", lit(Array[Byte](1, 2))))
    for ((cname, df) <- cases) {
      val e = intercept[IllegalStateException](Verify.lintSchema("op_x", df))
      assert(e.getMessage.contains("op_x") && e.getMessage.contains(cname),
        s"message must name operator and column: ${e.getMessage}")
    }
  }

  test("lint passes scalar frames, sub-long integrals included") {
    val ok = Seq((1, 2L, 3.0, "s", true)).toDF("i", "l", "d", "s", "b")
      .withColumn("sh", lit(1.toShort))
      .withColumn("ts", current_timestamp())
      .withColumn("dt", current_date())
    Verify.lintSchema("op_ok", ok) // must not throw
  }

  // (All 185 registered frames pass the lint in every Verify run —
  // the gate itself enforces the invariant corpus-wide, so this spec
  // only pins the lint's own behavior.)
}
