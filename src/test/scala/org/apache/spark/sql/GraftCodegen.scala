package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Test-only bridge into Spark's codegen internals (hence the
  * org.apache.spark.sql package): compiles each whole-stage codegen
  * unit of a plan through Spark's own janino pipeline and reports the
  * max generated-method bytecode size janino measured — the exact
  * number HotSpot compares against its silent
  * `-XX:HugeMethodLimit=8000` compile-skip cliff (round-14 JIT audit;
  * round-15 board #2 turns the audit into a regression lock).
  */
object GraftCodegen {

  /** One (unit label, max generated-method bytecode bytes) row per
    * WholeStageCodegenExec unit reachable from `plan`, descending
    * through adaptive wrappers (AdaptiveSparkPlanExec's current plan,
    * materialized query stages) so the units measured are the ones a
    * production run actually executes.
    */
  def unitMaxMethodBytes(plan: SparkPlan): Seq[(String, Int)] = {
    val units = plan.collect { case w: WholeStageCodegenExec => w }
    val nested = plan.collect {
      case a: AdaptiveSparkPlanExec => unitMaxMethodBytes(a.executedPlan)
      case q: QueryStageExec        => unitMaxMethodBytes(q.plan)
    }.flatten
    units.map { w =>
      val (_, code) = w.doCodeGen()
      val (_, stats) = CodeGenerator.compile(code)
      (w.child.nodeName + ": " +
        w.child.simpleString(60).linesIterator.next().take(80),
        stats.maxMethodCodeSize)
    } ++ nested
  }

  /** Execute `df` (toRdd forcing, like Bench/Probe) so AQE resolves
    * its final plan, then measure every whole-stage unit of the plan
    * that actually ran. Returns the per-unit max generated-method
    * bytecode sizes.
    */
  def executedUnitMaxMethodBytes(df: DataFrame): Seq[(String, Int)] = {
    val qe = df.queryExecution
    qe.toRdd.count()
    unitMaxMethodBytes(qe.executedPlan)
  }
}
