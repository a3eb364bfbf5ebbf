package org.apache.spark.sql.graft

import java.util.{HashMap => JHashMap}

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document character 3-gram counts as
  * `array<struct<g:string, cnt:bigint>>`, sorted by gram.
  *
  * Exploding this array yields exactly the rows of
  * `explode(transform(sequence(1, greatest(length(t) - 2, 1)),
  * i -> substr(t, i, 3)))` followed by a `groupBy(gram).count` —
  * including the short-string corner (length < 3 counts the whole
  * string once, the empty string included) — but the aggregation
  * happens inside the scan projection, per document, so the
  * corpus-wide trigram-occurrence shuffle (one row per CHARACTER of
  * the corpus) disappears entirely; only distinct grams per document
  * leave the scan. That exchange was the dominant cost of lang_id's
  * profile/scoring pipeline.
  *
  * (Reference capability: n-gram language identification at ingest;
  * this is its candidate-gram aggregation step.)
  */
case class GramCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("g", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def prettyName: String = "graft_gram_counts"

  override protected def nullSafeEval(input: Any): Any =
    GramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = GramCounts.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $helper.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramCounts =
    copy(child = newChild)
}

object GramCounts {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GramCounts].getName, "graft_gram_counts")

  /** One-pass 3-gram counting; also the codegen target. */
  def compute(s: UTF8String): ArrayData = {
    val numChars = s.numChars()
    if (numChars < 3) {
      // composed-form corner: sequence(1, greatest(len-2, 1)) = [1] and
      // substr(t, 1, 3) is the whole (short) string
      val row = new GenericInternalRow(2)
      row.update(0, s.clone()); row.setLong(1, 1L)
      return new GenericArrayData(Array[Any](row))
    }
    val numBytes = s.numBytes()
    val starts = new Array[Int](numChars + 1)
    var b = 0
    var c = 0
    while (b < numBytes) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(s.getByte(b))
      c += 1
    }
    starts(numChars) = numBytes
    val counts = new JHashMap[UTF8String, Array[Long]]()
    var i = 0
    val n = numChars - 2
    while (i < n) {
      // substring copies bytes — required, keys must not alias the
      // backing buffer of a reused row
      val g = s.substring(i, i + 3)
      val cell = counts.get(g)
      if (cell == null) counts.put(g, Array(1L)) else cell(0) += 1L
      i += 1
    }
    val grams = new Array[UTF8String](counts.size)
    val it = counts.keySet().iterator()
    var k = 0
    while (it.hasNext) { grams(k) = it.next(); k += 1 }
    java.util.Arrays.sort(grams, null)
    val out = new Array[Any](grams.length)
    k = 0
    while (k < grams.length) {
      val row = new GenericInternalRow(2)
      row.update(0, grams(k)); row.setLong(1, counts.get(grams(k))(0))
      out(k) = row
      k += 1
    }
    new GenericArrayData(out)
  }
}
