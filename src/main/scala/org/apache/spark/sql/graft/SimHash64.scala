package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash (Charikar '02) of a token
  * array in ONE map-side pass — per token, xxhash64 the string (seed 42,
  * bit-identical to the builtin `xxhash64` column function); per bit
  * position, accumulate ±1 by that bit of the hash; output sets the
  * bits with positive balance.
  *
  * Replaces the explode → 64-conditional-sum groupBy formulation, which
  * shuffles |tokens| rows per document and carries 64 aggregation
  * buffers per group: a whole-corpus-tokens exchange that at 100 TB is
  * the dominant cost of the simhash dedup path. This expression keeps
  * the whole signature computation inside the scan projection —
  * map-only, zero shuffle — and DedupSpec pins output equality against
  * the aggregation formulation.
  *
  * Null array → null; null tokens hash to the seed (42), matching
  * `xxhash64(null)`.
  *
  * (Reference capability: near-dup detection at ingest; the reference
  * dedups by full content hash — src/rust/common/src/hashing.rs — and
  * simhash is the standard hamming-bucketed near-dup extension.)
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($arr.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) { $counts[$j]++; } else { $counts[$j]--; }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, "graft_simhash64")
}
