package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: keyword→basket assignment
  * (basket_assignment.rs:75 `assign_baskets`) over a document's
  * candidate, pair-similarity and selected-tag arrays, in plain loops.
  *
  * Semantics are exactly the relational formulation it replaces
  * (KeywordTagsSpec's driver model + the keyword_baskets oracle pin
  * both): every candidate keyword that is NOT itself a selected tag
  * goes to the selected tag with the highest doc-local pair similarity
  * — ties keep the EARLIER tag in selection order (the window's
  * (s desc, tag_rank) with row_number ≡ strict-`>` first-wins over
  * tags in order) — or to `misc` when no tag exists or the best
  * similarity is below `minSimSq`. Pair lookup normalizes to the
  * stored ta < tb convention (binary string order, as least/greatest).
  *
  * The relational form ran three per-doc joins plus a rank window for
  * arrays of ≤12 keywords × ≤5 tags; this emits
  * `array<struct<keyword, basket>>` in one pass inside the projection.
  *
  * Input shapes (positional struct fields, as `keywordTagInputs` and
  * MmrSelect produce them): cands `array<struct<idx:int, term:string,
  * rel:double>>`, sims `array<struct<ta:string, tb:string,
  * s:double>>`, tags `array<string>` in selection order.
  */
case class BasketAssign(first: Expression, second: Expression, third: Expression,
                        minSimSq: Double)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("keyword", StringType, nullable = false),
      StructField("basket", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_basket_assign"

  override protected def nullSafeEval(c: Any, s: Any, t: Any): Any =
    BasketAssign.compute(c.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData],
      t.asInstanceOf[ArrayData], minSimSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BasketAssign.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (c, s, t) =>
      s"${ev.value} = $helper.compute($c, $s, $t, $minSimSq);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BasketAssign =
    copy(first = f, second = s, third = t)
}

object BasketAssign {

  private val MISC = UTF8String.fromString("misc")

  /** The assignment loop; also the codegen target. */
  def compute(cands: ArrayData, sims: ArrayData, tags: ArrayData,
              minSimSq: Double): ArrayData = {
    val nT = tags.numElements()
    val tagArr = new Array[UTF8String](nT)
    var i = 0
    while (i < nT) { tagArr(i) = tags.getUTF8String(i); i += 1 }
    val m = sims.numElements()
    val ta = new Array[UTF8String](m)
    val tb = new Array[UTF8String](m)
    val sv = new Array[Double](m)
    i = 0
    while (i < m) {
      val r = sims.getStruct(i, 3)
      ta(i) = r.getUTF8String(0); tb(i) = r.getUTF8String(1); sv(i) = r.getDouble(2)
      i += 1
    }
    val nC = cands.numElements()
    val out = new java.util.ArrayList[Any](nC)
    i = 0
    while (i < nC) {
      val kw = cands.getStruct(i, 3).getUTF8String(1)
      var isTag = false
      var t = 0
      while (t < nT && !isTag) { if (tagArr(t).equals(kw)) isTag = true; t += 1 }
      if (!isTag) {
        var bestS = 0.0
        var bestTag: UTF8String = null
        t = 0
        while (t < nT) {
          val tag = tagArr(t)
          val lo = if (kw.compareTo(tag) <= 0) kw else tag
          val hi = if (kw.compareTo(tag) <= 0) tag else kw
          var s = 0.0
          var p = 0
          while (p < m) {
            if (ta(p).equals(lo) && tb(p).equals(hi) && sv(p) > s) s = sv(p)
            p += 1
          }
          if (bestTag == null && nT > 0 && t == 0) { bestS = s; bestTag = tag }
          else if (s > bestS) { bestS = s; bestTag = tag }
          t += 1
        }
        val basket =
          if (bestTag == null || bestS < minSimSq) MISC else bestTag
        val row = new GenericInternalRow(2)
        row.update(0, kw.clone()); row.update(1, basket.clone())
        out.add(row)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
