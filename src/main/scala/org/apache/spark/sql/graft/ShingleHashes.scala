package org.apache.spark.sql.graft

import java.util.Arrays

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: sorted distinct xxhash64 values of every
  * character 3-gram of a string, in ONE pass over its bytes.
  *
  * Bit-identical to the composed column
  * `array_sort(array_distinct(transform(sequence(1, greatest(length(t)
  * - 2, 1)), i -> xxhash64(substr(t, i, 3)))))` — including the
  * composed form's short-string corner (length < 3 hashes the whole
  * string once, the empty string included) and its seed (42, the
  * builtin `xxhash64` default). Where the composed form materializes a
  * position sequence plus one UTF8String copy per position and then
  * hash-sets the result, this expression walks the char boundaries
  * once, hashes each 3-char byte slice in place, and sort+uniques a
  * primitive array — the shingle stage of dedup_minhash is a scan-side
  * projection over every document, so per-row allocation is the cost
  * that scales with the corpus. DedupSpec pins equality on the live
  * corpus.
  */
case class ShingleHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ShingleHashes].getName, "graft_shingle_hashes")

  /** One-pass 3-gram hashing; also the codegen target. */
  def compute(s: UTF8String): ArrayData = {
    val numChars = s.numChars()
    if (numChars < 3) {
      // composed-form corner: sequence(1, greatest(len-2, 1)) = [1] and
      // substr(t, 1, 3) is the whole (short) string
      return new GenericArrayData(Array(XXH64.hashUTF8String(s, 42L)))
    }
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val numBytes = s.numBytes()
    // char-start byte offsets, one walk
    val starts = new Array[Int](numChars + 1)
    var b = 0
    var c = 0
    while (b < numBytes) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      c += 1
    }
    starts(numChars) = numBytes
    val n = numChars - 2
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = starts(i)
      hashes(i) = XXH64.hashUnsafeBytes(base, offset + from, starts(i + 3) - from, 42L)
      i += 1
    }
    Arrays.sort(hashes)
    // unique in place
    var w = 0
    var r = 1
    while (r < n) {
      if (hashes(r) != hashes(w)) { w += 1; hashes(w) = hashes(r) }
      r += 1
    }
    val out = if (w + 1 == n) hashes else Arrays.copyOf(hashes, w + 1)
    new GenericArrayData(out)
  }
}
