package graft

import org.apache.spark.sql.GraftCodegen
import org.apache.spark.sql.functions._

/** Round-15 board #2: the JIT-cliff audit as a REGRESSION LOCK.
  *
  * HotSpot silently refuses to JIT-compile any method above
  * `-XX:HugeMethodLimit=8000` bytecode bytes (DontCompileHugeMethods) —
  * no error, the generated method just runs interpreted (round-13
  * forensic: 46× stage CPU). JITAUDIT_r14 measured every
  * knob-dependent generated projection fresh-JVM and found
  * search_quality / quality_verdict's largest method at 7716 B = 96 %
  * of the cliff, protected only by a "re-run the audit if the file
  * changes" comment. This spec replaces the convention: it EXECUTES
  * each audited target at sf0.001 (so AQE resolves the plan that
  * actually runs — static AQE-off plans codegen into differently-split
  * units), compiles every whole-stage unit of that final plan through
  * Spark's own janino pipeline (the SAME ByteCodeStats HotSpot sees),
  * and FAILS when any generated method exceeds the lock threshold — a
  * widened expression tower now breaks the build instead of silently
  * de-optimizing at scale.
  */
class JitBytecodeLockSpec extends SparkSpec {

  /** HotSpot's huge-method compile-skip limit (bytecode bytes). */
  private val CliffBytes = 8000

  /** The lock: 90 % of the cliff, per round-15 board #2. */
  private val LockBytes = 7200

  /** JITAUDIT_r14's target list (scripts/jit_audit_r14.sh TARGETS),
    * resolved through the same Probe mapping the audit script drives —
    * coverage can't drift between the script and the lock.
    */
  private val AuditedTargets = Seq(
    "dedup_minhash_capped", "dedup_minhash_capped_multi",
    "dedup_minhash_capped_p3", "dedup_minhash_capped_b24",
    "dedup_simhash_lsh", "dedup_simhash_lsh_wide",
    "store_points", "search_quality", "quality_verdict",
    "doc_elaborates_virtual", "ann_lsh_multiprobe_cert")

  test("audited generated methods stay under the 90% JIT-cliff lock") {
    val measured = AuditedTargets.map { t =>
      val units = GraftCodegen.executedUnitMaxMethodBytes(
        Probe.targetFn(t)(spark, sfDir))
      val worst = if (units.isEmpty) ("<no codegen unit>", 0) else units.maxBy(_._2)
      (t, worst)
    }
    info(measured.map { case (t, (u, b)) => f"$t%-28s $b%5d B  ($u)" }.mkString("\n"))
    val offenders = measured.filter(_._2._2 > LockBytes)
    assert(offenders.isEmpty,
      s"generated methods above the $LockBytes B lock (cliff $CliffBytes B):\n" +
        offenders.map { case (t, (u, b)) => s"  $t: $b B in $u" }.mkString("\n"))
  }

  test("the measurement sees a deliberately-widened tower crossing the cliff") {
    // A quality-metrics-shaped widening: one whole-stage projection
    // stacking many normalize-style regex CASE columns over a
    // non-foldable input (spark.range — a literal local relation would
    // constant-fold to a LocalTableScan with no codegen at all). The
    // probe must report it ABOVE the cliff: validates the lock CAN
    // fail, without shipping a broken operator.
    val base = spark.range(2)
      .select(concat(lit("./src//a.py "), col("id")).as("p"))
    val widened = base.select(
      (1 to 24).map(i =>
        graft.operators.QualityMetrics
          .normalizePath(concat(col("p"), lit(i.toString)), "/proj")
          .as(s"c$i")): _*)
    val units = GraftCodegen.executedUnitMaxMethodBytes(widened)
    assert(units.nonEmpty, "the widened projection must codegen")
    assert(units.exists(_._2 > CliffBytes),
      s"widened tower should cross the $CliffBytes B cliff, saw: $units")
  }
}
