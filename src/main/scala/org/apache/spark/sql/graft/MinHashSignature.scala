package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: the full MinHash signature of a hashed
  * shingle set in ONE traversal.
  *
  * Position i of the output is `min over h in sh of
  * ((h pmod p) * a(i) + b(i)) pmod p` with p = 2^31 − 1 — bit-identical
  * to the `array_min(transform(sh, …))` column per position (Spark
  * `pmod` sign semantics), but where the composed form walks the
  * shingle array once PER SIGNATURE POSITION and allocates a
  * transformed copy each time (k arrays of |sh| elements per row, k=36
  * in dedup_minhash), this expression keeps k running minima in one
  * pass over the input with zero allocation beyond the k-element
  * output. Output is `array<int>` — every value is < 2^31 by
  * construction (dedup_minhash ships signatures as ints).
  *
  * PRECONDITION (caller-enforced): input non-empty and null-free, as
  * produced by `array_distinct(transform(shingles, xxhash64))` after a
  * `size > 0` filter. An empty input returns null (the composed form
  * would return an all-null array; dedup_minhash filters empties out
  * before signatures, so the two never diverge in use — DedupSpec
  * locks per-position equality on the live corpus).
  *
  * Coefficient vectors are constructor parameters (not child
  * expressions), so the function is Column-API only — not registered
  * for SQL.
  */
case class MinHashSignature(child: Expression, coeffsA: Array[Long], coeffsB: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  require(coeffsA.length == coeffsB.length && coeffsA.nonEmpty,
    "coefficient vectors must be non-empty and equal-length")

  private val P = 2147483647L // 2^31 - 1

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // nullable even over a non-null child: empty input yields null, and a
  // constant-false isNull slot would make the codegen assignment illegal
  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = coeffsA.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      val hm = ((h % P) + P) % P
      var j = 0
      while (j < k) {
        val v = (hm * coeffsA(j) + coeffsB(j)) % P // operands ≥ 0 ⇒ % == pmod
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(_.toInt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("coeffsA", coeffsA, "long[]")
    val bRef = ctx.addReferenceObj("coeffsB", coeffsB, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $aRef.length;
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $arr.getLong($i);
         |    long $hm = (($h % ${P}L) + ${P}L) % ${P}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($hm * $aRef[$j] + $bRef[$j]) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  int[] $out = new int[$k];
         |  for (int $j = 0; $j < $k; $j++) $out[$j] = (int) $mins[$j];
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
