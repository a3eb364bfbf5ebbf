package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType}

/** Native Catalyst expression: number of positions where two int arrays
  * agree, over the shorter length — an allocation-free loop.
  *
  * Equals `size(filter(zip_with(a, b, (x, y) => x === y), m => m))` for
  * equal-length null-free arrays (dedup_minhash's signature vectors are
  * always exactly `bands × rowsPerBand` ints): the composed form
  * materializes a boolean array and a filtered copy per row, evaluated
  * interpretively, and the estimate stage runs it once per candidate
  * pair — millions of rows per corpus. (For UNEQUAL lengths the
  * composed form null-pads and drops the tail; this counts over the
  * overlap — identical on the overlap, and the operator never produces
  * unequal signatures.)
  */
case class IntArrayMatchCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_int_array_match_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getInt(i) == y.getInt(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getInt($i) == $b.getInt($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntArrayMatchCount =
    copy(left = newLeft, right = newRight)
}

object IntArrayMatchCount {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IntArrayMatchCount].getName, "graft_int_array_match_count")
}
