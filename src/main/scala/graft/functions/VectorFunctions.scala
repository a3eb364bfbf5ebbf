package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as codegen'd Column expressions over `array<float|double>`
  * columns — no UDFs, so everything stays inside WholeStageCodegen and
  * Catalyst can prune/push around it.
  *
  * Re-expresses the dense-vector scoring of the reference's Qdrant
  * queries (reference: src/rust/daemon/core/src/storage/search.rs:243,
  * dense cosine search) as Spark higher-order functions.
  */
object VectorFunctions {

  /** Cast an array column to array<double> so accumulation is double. */
  def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Dot product of two equal-length array columns (double accumulate). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def norm2(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity with zero-norm guard (0.0 for degenerate input). */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(norm2(a)) * sqrt(norm2(b))
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
}
