package org.apache.spark.sql.graft

import java.security.MessageDigest
import java.util.Arrays

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5-nibble fold: the 60-bit integer value of the first 15
  * hex nibbles of an md5 digest — exactly
  * `CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)`: nibble k of
  * the hex string is the high/low half of digest byte k/2, so the
  * value is (first 7 digest bytes as a 56-bit big-endian integer) << 4
  * | (high nibble of byte 7). The composed form allocates a 32-char
  * hex string, a substring, and a radix-parse per hash; this computes
  * the long straight from the digest bytes with a thread-local
  * MessageDigest.
  */
private[graft] object Md5Nibble {
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def hashBytes(bytes: Array[Byte], from: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(bytes, from, len)
    fold(d.digest())
  }

  def hashUTF8(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    d.update(s.getBytes)
    fold(d.digest())
  }

  private def fold(digest: Array[Byte]): Long = {
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (digest(k) & 0xffL); k += 1 }
    (v << 4) | ((digest(7) & 0xffL) >>> 4)
  }
}

/** Native twin of the md5-nibble SHINGLE stage of the oracle-portable
  * minhash family: sorted distinct md5-nibble values of every character
  * 3-gram, in one pass — bit-identical to
  * `array_sort(array_distinct(transform(sequence(1, greatest(
  * length(text) - 2, 1)), i -> CAST(conv(substr(md5(substr(text, i,
  * 3)), 1, 15), 16, 10) AS BIGINT))))` including the short-string
  * corner (length < 3 hashes the whole — possibly empty — string
  * once). Same shape as [[ShingleHashes]], with the md5-nibble hash in
  * place of xxhash64; the generated DuckDB oracles recompute md5
  * themselves, so they are unaffected. NativeExpressionPropSpec pins
  * equality against the composed form on random strings and the corpus.
  */
case class Md5NibbleShingleHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_md5_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    Md5NibbleShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Md5NibbleShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5NibbleShingleHashes =
    copy(child = newChild)
}

object Md5NibbleShingleHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5NibbleShingleHashes].getName, "graft_md5_shingle_hashes")

  def compute(s: UTF8String): ArrayData = {
    val numChars = s.numChars()
    // UTF8String byte storage may be an offset slice of a larger array;
    // materialize the exact bytes once (like Spark's Md5 eval does).
    val bytes = s.getBytes
    if (numChars < 3) {
      // composed-form corner: sequence(1, greatest(len-2, 1)) = [1] and
      // substr(t, 1, 3) is the whole (short) string
      return new GenericArrayData(Array(Md5Nibble.hashBytes(bytes, 0, bytes.length)))
    }
    // char-start byte offsets, one walk
    val starts = new Array[Int](numChars + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    starts(numChars) = bytes.length
    val n = numChars - 2
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val from = starts(i)
      hashes(i) = Md5Nibble.hashBytes(bytes, from, starts(i + 3) - from)
      i += 1
    }
    Arrays.sort(hashes)
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

/** Native twin of the md5-nibble TOKEN-hash projection of the simhash
  * oracle/LSH family: element-wise md5-nibble values of a string array
  * — bit-identical to `transform(toks, t -> CAST(conv(substr(md5(t),
  * 1, 15), 16, 10) AS BIGINT))` including null elements mapping to
  * null. NativeExpressionPropSpec pins equality.
  */
case class Md5NibbleHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def prettyName: String = "graft_md5_hashes"

  override protected def nullSafeEval(input: Any): Any =
    Md5NibbleHashes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Md5NibbleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5NibbleHashes =
    copy(child = newChild)
}

object Md5NibbleHashes {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Md5NibbleHashes].getName, "graft_md5_hashes")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (arr.isNullAt(i)) null
        else java.lang.Long.valueOf(Md5Nibble.hashUTF8(arr.getUTF8String(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
