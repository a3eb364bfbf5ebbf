package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays in
  * ONE fused loop (dot product + both norms), with full whole-stage
  * codegen — no intermediate arrays, unlike the equivalent
  * `aggregate(zip_with(...))` composition which materializes the product
  * array per row. Float inputs are implicitly cast.
  *
  * For equal-length `array<double>` inputs the semantics match
  * graft.functions.VectorFunctions.cosine (same left-to-right
  * accumulation order). They are NOT interchangeable in two corners:
  * float arrays are implicitly cast to double BEFORE multiplying here,
  * while the zip_with composition multiplies in float first; and a
  * length mismatch truncates to the shorter array here, while zip_with
  * null-pads to the longer one. The operators only ever feed either
  * form equal-length double arrays, where the two agree exactly.
  *
  * (Reference capability: dense cosine scoring,
  * src/rust/daemon/core/src/storage/search.rs:243 — here as a custom
  * Expression because it is the innermost hot loop of every vector
  * query.)
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0) dot / denom else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($arr1.numElements(), $arr2.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $arr1.getDouble($i);
         |  double $yv = $arr2.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = $denom > 0 ? $dot / $denom : 0.0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarity].getName, "graft_cosine")
}
