package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression: all `tables` sampled-bit LSH keys of a
  * simhash in ONE constant-size loop.
  *
  * Position t of the output is bit-identical to the composed form
  * `Σ_i shiftleft(shiftright(simhash, pos(t)(i)).bitwiseAND(1L), i)` —
  * exact integer arithmetic over disjoint bits, so the fold order is
  * immaterial and the generated DuckDB oracle (built from the same
  * position table) is unaffected.
  *
  * WHY IT EXISTS (round 15, board #2): the composed form unrolls
  * tables × bitsPerTable shift/mask terms into ONE generated method —
  * 57,701 bytecode bytes at the DEFAULT 24×16 (JitBytecodeLockSpec).
  * That is under janino's 64 KB class limit the round-13 fix budgeted
  * against, but 7× over HotSpot's SILENT 8 KB DontCompileHugeMethods
  * cliff: the method can never be JIT-compiled, and at decade-3
  * per-partition row counts it runs in the bytecode interpreter
  * forever (it escaped the round-14 PrintCompilation audit only
  * because sf0.1 partitions stay under the OSR backedge threshold).
  * This loop's generated code is a few hundred bytes regardless of
  * (tables, bitsPerTable) — the same cure MinHashBandBuckets applied
  * to the minhash banding stage — and it replaces the round-13
  * term-budget batching (checkpoint + unioned per-batch projections)
  * with a single fused projection: cheaper at every scale AND
  * JIT-safe at every knob.
  */
case class SimHashLshKeys(child: Expression, positions: Array[Array[Int]])
    extends UnaryExpression with ExpectsInputTypes {

  require(positions.nonEmpty && positions.forall(_.nonEmpty),
    "positions must be a non-empty table of non-empty bit samples")
  require(positions.forall(_.length == positions(0).length),
    "every table must sample the same number of bits")
  require(positions(0).length <= 63,
    "bitsPerTable must fit a long key")

  private val tables = positions.length
  private val bits = positions(0).length
  private val flat: Array[Int] = positions.flatten

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_simhash_lsh_keys"

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[Long]
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var k = 0L
      var i = 0
      while (i < bits) {
        k += ((sh >> flat(t * bits + i)) & 1L) << i
        i += 1
      }
      out(t) = k
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val posRef = ctx.addReferenceObj("simhashLshPositions", flat, "int[]")
    nullSafeCodeGen(ctx, ev, sh => {
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      s"""
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $k = 0L;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    $k += (($sh >> $posRef[$t * $bits + $i]) & 1L) << $i;
         |  }
         |  $out[$t] = $k;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashLshKeys =
    copy(child = newChild)
}
