package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the greedy MMR tag-selection fold over a
  * document's candidate and pair-similarity arrays, in plain loops.
  *
  * Semantics are EXACTLY `KeywordTags.mmrSelection`'s higher-order
  * column fold (KeywordTagsSpec pins equality on the corpus and on the
  * reference's select_tags vectors): per step, each unselected
  * candidate's redundancy is the max pair similarity against the
  * selected set (0 when absent / none selected), candidates above
  * `maxSimSq` are ineligible, and the winner maximizes
  * `lambda·rel − (1−lambda)·ms` with the lower candidate index on exact
  * ties (the fold's struct-sort tiebreak; candidate indices are unique,
  * so its final term tiebreak is unreachable). A step with no eligible
  * candidate freezes selection, like the fold's empty slice.
  *
  * The column fold builds, filters, transforms, and sorts nested array
  * structs per step per row — interpreted lambda evaluation with
  * allocation per element, measured as the dominant cost of the whole
  * keyword pipeline (keyword_tags / keyword_baskets / tag_affinity /
  * tag_hierarchy / project_groups all pay it). These loops do the same
  * arithmetic in place; `1 - lambda` is computed in the same double
  * arithmetic as the fold's `lit(1) - lit(lambda)`.
  *
  * Input shapes (positional struct fields, as `keywordTagInputs`
  * builds them): cands `array<struct<idx:int, term:string,
  * rel:double>>`, sims `array<struct<ta:string, tb:string,
  * s:double>>`. Null in either input yields null, matching the fold
  * over a null column.
  */
case class MmrSelect(left: Expression, right: Expression,
                     maxTags: Int, lambda: Double, maxSimSq: Double)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_mmr_select"

  override protected def nullSafeEval(c: Any, s: Any): Any =
    MmrSelect.compute(c.asInstanceOf[ArrayData], s.asInstanceOf[ArrayData],
      maxTags, lambda, maxSimSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = MmrSelect.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (c, s) =>
      s"${ev.value} = $helper.compute($c, $s, $maxTags, $lambda, $maxSimSq);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmrSelect =
    copy(left = newLeft, right = newRight)
}

object MmrSelect {

  /** The greedy fold; also the codegen target. */
  def compute(cands: ArrayData, sims: ArrayData,
              maxTags: Int, lambda: Double, maxSimSq: Double): ArrayData = {
    val n = cands.numElements()
    val idx = new Array[Int](n)
    val term = new Array[UTF8String](n)
    val rel = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = cands.getStruct(i, 3)
      idx(i) = r.getInt(0); term(i) = r.getUTF8String(1); rel(i) = r.getDouble(2)
      i += 1
    }
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
    val oneMinusLambda = 1 - lambda // same double op as lit(1) - lit(lambda)
    val selected = new Array[Int](math.min(maxTags, math.max(n, 1)))
    var nSel = 0
    val isSel = new Array[Boolean](n)
    var step = 0
    var frozen = false
    while (step < maxTags && !frozen) {
      var bestK = -1
      var bestM = Double.NegativeInfinity
      var bestNi = Int.MinValue
      var k = 0
      while (k < n) {
        if (!isSel(k)) {
          // redundancy: max over selected of the best matching pair sim
          var ms = 0.0
          var t = 0
          while (t < nSel) {
            val selTerm = term(selected(t))
            var best = 0.0
            var p = 0
            while (p < m) {
              if ((ta(p).equals(term(k)) && tb(p).equals(selTerm)) ||
                  (ta(p).equals(selTerm) && tb(p).equals(term(k)))) {
                if (sv(p) > best) best = sv(p)
              }
              p += 1
            }
            if (best > ms) ms = best
            t += 1
          }
          if (ms <= maxSimSq) {
            val score = lambda * rel(k) - oneMinusLambda * ms
            val ni = -idx(k)
            val cmp = java.lang.Double.compare(score, bestM)
            if (cmp > 0 || (cmp == 0 && ni > bestNi)) {
              bestM = score; bestNi = ni; bestK = k
            }
          }
        }
        k += 1
      }
      if (bestK < 0) frozen = true
      else {
        isSel(bestK) = true
        selected(nSel) = bestK
        nSel += 1
      }
      step += 1
    }
    val out = new Array[Any](nSel)
    i = 0
    while (i < nSel) { out(i) = term(selected(i)); i += 1 }
    new GenericArrayData(out)
  }
}
