package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import org.apache.spark.sql.graft.{CosineSimilarity, SortedIntersectCount}

/** Session extension entry point: register graft's native expressions.
  *
  * Users opt in with
  * `spark.sql.extensions=graft.GraftExtensions` (the supported Spark
  * mechanism for third-party Catalyst extensions), or imperatively via
  * [[GraftFunctions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      CosineSimilarity.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_count"),
      SortedIntersectCount.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(children(0), children(1))))
  }
}

object GraftFunctions {
  /** Idempotently register graft functions for SQL use on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_count",
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SortedIntersectCount(children(0), children(1)),
      "built-in")
  }

  /** Cosine similarity via the fused native expression: one codegen'd
    * loop per row, no intermediate arrays. Agrees exactly with
    * VectorFunctions.cosine on equal-length double arrays (same
    * accumulation order); float inputs are cast to double BEFORE the
    * multiply here (vs float-multiply-first in the zip_with form) — see
    * CosineSimilarity's scaladoc for the corner cases.
    */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CosineSimilarity(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** |A ∩ B| of two sorted+distinct long arrays via the allocation-free
    * merge expression — equals `size(array_intersect(a, b))` on such
    * inputs (see SortedIntersectCount's scaladoc for the precondition).
    */
  def sortedIntersectCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      SortedIntersectCount(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))
}
