package graft.operators

import graft.{SparkSpec, Tables}

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate: fixture overlap counts and the flag") {
    val eval = Seq(
      (1L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val cands = Seq(
      // shares the 8-gram "two ... nine" with the eval doc
      (10L, "x two three four five six seven eight nine"),
      // no shared 8-gram
      (11L, "p q r s t u v w x y z"),
      // too short for any 8-gram
      (12L, "one two three")).toDF("doc_id", "text")
    val out = Decontamination.decontaminateOf(cands, eval, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(10L) == ((2L, 1L, 1)))
    assert(out(11L) == ((4L, 0L, 0)))
    assert(out(12L) == ((0L, 0L, 0)))
  }

  test("decontaminate: corpus invariants") {
    val rows = Decontamination.decontaminate(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.length == total - 50)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"overlap > n_grams for ${r.getLong(0)}")
      assert(r.getInt(3) == (if (r.getLong(2) > 0) 1 else 0))
    }
  }

  // Unigram LM score on a hand-computable corpus: words a a b c,
  // total 4; p(a)=1/2, p(b)=p(c)=1/4.
  test("lm_quality: fixture mean log-probabilities and the keep rule") {
    import spark.implicits._
    val docs = Seq((1L, "a A b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    val out = LmQuality.lmQualityOf(docs, vocabSize = 10000, keepThreshold = -4.0)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getInt(2)))).toMap
    // doc 1: (2*log10(1/2) + log10(1/4)) / 3 = -0.401373...
    assert(out(1L) == ((-0.4014, 1)))
    assert(out(2L) == ((-0.6021, 1)))
    assert(out(3L) == ((0.0, 0)))
  }

  test("lm_quality: OOV words hit the 1/total floor under a tiny vocab") {
    import spark.implicits._
    // vocab of 1 keeps only "a" (cnt 3); "z" is OOV -> p = 1/4
    val docs = Seq((1L, "a a a"), (2L, "z")).toDF("doc_id", "text")
    val out = LmQuality.lmQualityOf(docs, vocabSize = 1, keepThreshold = -4.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == -0.1249) // log10(3/4)
    assert(out(2L) == -0.6021) // log10(1/4)
  }

  test("lm_quality: corpus invariants") {
    val rows = LmQuality.lmQuality(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      val lp = r.getDouble(1)
      assert(lp <= 0.0)
      assert(r.getInt(2) == (if (lp >= -4.0 && lp < 0.0) 1 else 0))
    }
  }
}
