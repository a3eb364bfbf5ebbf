package graft.operators

import org.scalacheck.Gen

import graft.SparkSpec

/** Randomized equivalence for the round-9 pipeline operators: each
  * must match a plain-Scala recomputation on generated adversarial
  * text (repeated tokens, multibyte chars, whitespace runs, empties),
  * not just the corpus and the hand fixtures. Seeded generators keep
  * the suite deterministic.
  */
class PipelineOpsPropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val textGen: Gen[String] = {
    val tokGen = Gen.frequency(
      (4, Gen.oneOf("a", "b", "ab", "the", "dup")),
      (2, Gen.identifier.map(_.take(6))),
      (1, Gen.oneOf("α", "中文", "Mixed")),
      (1, Gen.oneOf("", " ")))
    val sepGen = Gen.frequency((5, Gen.const(" ")), (2, Gen.const("\n")),
      (1, Gen.const("\t ")), (1, Gen.const("  ")))
    for {
      n <- Gen.chooseNum(0, 40)
      toks <- Gen.listOfN(n, tokGen)
      seps <- Gen.listOfN(n, sepGen)
    } yield toks.zip(seps).map { case (t, s) => t + s }.mkString
  }

  private def wordsOf(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def dupFrac(xs: Seq[String]): Double =
    if (xs.isEmpty) 0.0
    else BigDecimal(1.0 - xs.distinct.size.toDouble / xs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("quality_repetition equals a driver recomputation on random text") {
    val texts = sample(textGen, 250) ++
      Seq("", " \n ", "a a a a", "x\nx\nx", "a b\na b")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val expected = docs.map { case (id, t) =>
      // Spark trim() strips 0x20 spaces only; mirror exactly
      val keptLines = t.split("\n", -1).filter(l =>
        l.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse.nonEmpty).toSeq
      val w = wordsOf(t)
      val g2 = if (w.size >= 2) w.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty
      val g3 = if (w.size >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
      val (l, d3) = (dupFrac(keptLines), dupFrac(g3))
      id -> ((l, dupFrac(g2), d3, if (l <= 0.30 && d3 <= 0.18) 1 else 0))
    }.toMap
    val got = TextAnalysis.qualityRepetitionOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))).toMap
    val bad = expected.keys.filter(k => got(k) != expected(k))
    assert(bad.isEmpty,
      s"first diff doc ${bad.headOption}: got ${bad.headOption.map(got)}, " +
        s"expected ${bad.headOption.map(expected)}")
  }

  test("lm_quality equals a driver recomputation on a random corpus") {
    val texts = sample(textGen, 120) ++ Seq("", "a", "a a a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val allWords = docs.flatMap { case (_, t) => wordsOf(t) }
    val total = allWords.size.toDouble
    val counts = allWords.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val vocabSize = 25 // force real OOV traffic
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(vocabSize).toMap
    val expected = docs.map { case (id, t) =>
      val ws = wordsOf(t)
      val lp =
        if (ws.isEmpty) 0.0
        else BigDecimal(ws.map(w =>
            math.log10(vocab.getOrElse(w, 1L).toDouble / total)).sum / ws.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> lp
    }.toMap
    val got = LmQuality.lmQualityOf(docs.toDF("doc_id", "text"), vocabSize, -4.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bad = expected.keys.filter(k => math.abs(got(k) - expected(k)) > 1e-9)
    assert(bad.isEmpty,
      s"first diff doc ${bad.headOption}: got ${bad.headOption.map(got)}, " +
        s"expected ${bad.headOption.map(expected)}")
  }

  test("decontaminate equals a driver recomputation on random corpora") {
    val texts = sample(textGen, 150)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val n = 3 // short grams so random text actually overlaps
    def grams(t: String): Set[String] = {
      val w = wordsOf(t)
      if (w.size >= n) w.sliding(n).map(_.mkString(" ")).toSet else Set.empty
    }
    val (evalDocs, candDocs) = docs.partition(_._1 < 20)
    val evalGrams = evalDocs.flatMap(d => grams(d._2)).toSet
    val expected = candDocs.map { case (id, t) =>
      val g = grams(t)
      val ov = g.count(evalGrams.contains).toLong
      id -> ((g.size.toLong, ov, if (ov > 0) 1 else 0))
    }.toMap
    val got = Decontamination.decontaminateOf(
        candDocs.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    val bad = expected.keys.filter(k => got(k) != expected(k))
    assert(bad.isEmpty,
      s"first diff doc ${bad.headOption}: got ${bad.headOption.map(got)}, " +
        s"expected ${bad.headOption.map(expected)}")
  }
}
