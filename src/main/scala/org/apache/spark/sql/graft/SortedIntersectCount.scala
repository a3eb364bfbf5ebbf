package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression: |A ∩ B| for two SORTED, DISTINCT
  * `array<bigint>` inputs via an allocation-free two-pointer merge.
  *
  * The builtin path — `size(array_intersect(a, b))` — builds a hash set
  * from one side and MATERIALIZES the intersection array per row, only
  * for `size` to read its length. On dedup_minhash's verify stage
  * (millions of candidate pairs × ~10³-element shingle arrays) that
  * allocation is the hot loop of the whole bench tree; the merge scan
  * does the same set count with zero allocation and stays inside
  * whole-stage codegen.
  *
  * PRECONDITION (caller-enforced, not checked): both arrays are
  * strictly increasing (sorted + distinct) and null-free, as produced
  * by `array_sort(array_distinct(...))`. On such inputs the result
  * equals `size(array_intersect(a, b))` exactly — SortedIntersectSpec
  * locks the equivalence property-style.
  *
  * (Reference capability: content-overlap verification of near-dup
  * candidates; the reference dedups by full content hash at ingest —
  * src/rust/common/src/hashing.rs — and this is the set-overlap
  * analogue the near-dup scale path needs.)
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr1, arr2) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val c = ctx.freshName("c")
      s"""
         |int $nx = $arr1.numElements();
         |int $ny = $arr2.numElements();
         |int $i = 0, $j = 0;
         |long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $arr1.getLong($i);
         |  long $yv = $arr2.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedIntersectCount].getName, "graft_sorted_intersect_count")
}
