package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native Catalyst expression: all `bands` LSH band-bucket keys of a
  * MinHash signature in ONE constant-size loop.
  *
  * Position b of the output is bit-identical to
  * `hash(sig(b*rowsPerBand).cast("long"), …, sig(b*rowsPerBand+rowsPerBand-1).cast("long"))`
  * — the Spark murmur3 fold with seed 42, each int signature value
  * widened to long exactly as the composed form's `.cast("long")` does
  * (murmur3 folds ints and longs differently; the long view is the
  * historical bucket contract, NativeExpressionPropSpec pins equality).
  *
  * WHY IT EXISTS (round 13): the composed form unrolls
  * bands × rowsPerBand murmur3 inlines into ONE generated method. At
  * the default 12×3 that is ~7 KB of bytecode; at the band counts the
  * scale knobs reach (bands=24 single-family, or multi-pass banding)
  * it crosses HotSpot's 8 KB DontCompileHugeMethods limit and the
  * whole projection — signatures included — runs in the BYTECODE
  * INTERPRETER: measured 46× the stage CPU at ×10 (§6 round-13
  * forensic; -XX:-DontCompileHugeMethods restored parity, confirming
  * the diagnosis). This loop's generated code is a few hundred bytes
  * REGARDLESS of bands, so the banding stage stays JIT-compiled (and
  * janino-compilable) at any knob setting.
  */
case class MinHashBandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bands > 0 && rowsPerBand > 0, "bands and rowsPerBand must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_minhash_band_buckets"

  /** Precondition (enforced in BOTH eval paths, same message): the
    * signature must carry at least bands × rowsPerBand NON-NULL ints.
    * The composed GetArrayItem form this replaces yields null on a
    * short array; as a public GraftFunctions API a silent null would
    * hide a mis-sized signature, so this fails loud instead. Null
    * elements are rejected by the non-null requirement on the doc —
    * minhashSignature (the only internal producer) never emits them.
    */
  private def requireLength(n: Int): Unit =
    if (n < bands * rowsPerBand)
      throw new IllegalArgumentException(
        s"graft_minhash_band_buckets: signature has $n elements, " +
          s"needs bands*rowsPerBand = ${bands * rowsPerBand}")

  override protected def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    requireLength(sig.numElements())
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var h = 42
      var r = 0
      while (r < rowsPerBand) {
        h = Murmur3_x86_32.hashLong(sig.getInt(b * rowsPerBand + r).toLong, h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gad = classOf[GenericArrayData].getName
    val m3 = classOf[Murmur3_x86_32].getName
    nullSafeCodeGen(ctx, ev, sig => {
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |if ($sig.numElements() < ${bands * rowsPerBand}) {
         |  throw new IllegalArgumentException(
         |    "graft_minhash_band_buckets: signature has " + $sig.numElements() +
         |    " elements, needs bands*rowsPerBand = ${bands * rowsPerBand}");
         |}
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $h = 42;
         |  for (int $r = 0; $r < $rowsPerBand; $r++) {
         |    $h = $m3.hashLong((long) $sig.getInt($b * $rowsPerBand + $r), $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
    copy(child = newChild)
}
