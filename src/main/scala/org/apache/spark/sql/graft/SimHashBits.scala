package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash (Charikar '02) over an
  * array of PRE-COMPUTED token hashes — per hash, accumulate ±1 by each
  * bit; output sets the bits with strictly positive balance (the same
  * `> 0` convention as [[SimHash64]], which hashes token strings with
  * xxhash64 internally).
  *
  * Exists for hash functions the engine-portable oracle can reproduce:
  * `dedup_simhash_oracle` feeds it 60-bit md5-nibble token hashes
  * (`conv(substr(md5(t), 1, 15), 16, 10)` — the store_points /
  * communities digest precedent), which DuckDB recomputes with a
  * nibble fold, giving the simhash near-dup family a HARD hash oracle.
  * Bits above the hash width accumulate −1 per token and stay zero on
  * both engines.
  *
  * Precondition: null-free hash arrays (the tokenizer produces
  * non-null tokens; a null element evaluates as hash 0). Null array →
  * null.
  */
case class SimHashBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_simhash_bits"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
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
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.isNullAt($i) ? 0L : $arr.getLong($i);
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

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHashBits].getName, "graft_simhash_bits")
}
