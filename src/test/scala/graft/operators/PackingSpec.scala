package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class PackingSpec extends SparkSpec {

  test("pack_sequences: fixture spans, boundaries, and zero-token exclusion") {
    import spark.implicits._
    val counts = Seq((1L, 3L), (2L, 5L), (3L, 2L), (4L, 0L))
      .toDF("doc_id", "n_tokens")
    val rows = Packing.packSequencesOf(counts, seqLen = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // stream: doc1 [0,3) doc2 [3,8) doc3 [8,10); L=4
    assert(rows == Seq(
      (0L, 1L, 0L, 3L),
      (0L, 2L, 3L, 1L),
      (1L, 2L, 0L, 4L),
      (2L, 3L, 0L, 2L)))
  }

  test("pack_sequences: corpus sequences are gapless and token-conserving") {
    val out = Packing.packSequences(spark, sfDir, seqLen = 512).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out.nonEmpty)
    val totalPacked = out.map(_._4).sum
    val totalTokens = Tables.documents(spark, sfDir)
      .select(sum(size(regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"), lit(0))).cast("long")))
      .collect().head.getLong(0)
    assert(totalPacked == totalTokens, "every token lands in exactly one slice")
    // sequence ids are contiguous from 0
    val seqIds = out.map(_._1).distinct.sorted
    assert(seqIds == (0L until seqIds.length).toSeq)
    // inside each sequence the slices tile [0, 512) with no gap or
    // overlap (the last sequence tiles a prefix)
    val maxSeq = seqIds.last
    out.groupBy(_._1).foreach { case (sid, slices) =>
      val sorted = slices.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"seq $sid starts at 0")
      sorted.sliding(2).foreach {
        case Seq((_, _, s1, l1), (_, _, s2, _)) =>
          assert(s1 + l1 == s2, s"seq $sid gap at $s2")
        case _ => ()
      }
      val filled = sorted.map(_._4).sum
      if (sid < maxSeq) assert(filled == 512L, s"seq $sid holds $filled")
      else assert(filled <= 512L)
    }
    // doc slices appear in doc_id order along the stream
    val streamOrder = out.sortBy(t => (t._1, t._3)).map(_._2)
    assert(streamOrder == streamOrder.sorted)
  }
}
