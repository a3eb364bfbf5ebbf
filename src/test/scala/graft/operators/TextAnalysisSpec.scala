package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TextAnalysisSpec extends SparkSpec {

  test("quality_score counts match a driver-side recomputation on a sample") {
    val rows = TextAnalysis.qualityScore(spark, sfDir)
      .filter(col("doc_id") < 10).collect()
    val texts = Tables.documents(spark, sfDir).filter(col("doc_id") < 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("n_chars_m") == t.length)
      assert(r.getAs[Int]("n_words") == t.split("\\s+").length)
      assert(r.getAs[Int]("n_punct") == t.count(c => !c.isLetterOrDigit && !c.isWhitespace))
    }
  }

  test("token_count ws and bpe-ish counts are consistent") {
    val rows = TextAnalysis.tokenCount(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getInt(1) > 0)
      assert(r.getInt(2) >= r.getInt(1)) // subword segmentation is finer
    }
  }

  test("doc_fingerprint rolling hash matches a driver-side recomputation") {
    val rows = TextAnalysis.docFingerprint(spark, sfDir)
      .filter(col("doc_id") < 10).collect()
    val texts = Tables.documents(spark, sfDir).filter(col("doc_id") < 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val expected = t.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % 1000000007L)
      assert(r.getAs[Long]("rolling_hash") == expected)
      assert(r.getAs[String]("content_md5").length == 32)
    }
  }

  test("lang_id is deterministic and covers every document") {
    val a = TextAnalysis.langId(spark, sfDir).collect()
    val b = TextAnalysis.langId(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.length == 500)
    val langs = Tables.documents(spark, sfDir).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    a.foreach(r => assert(langs.contains(r.getString(1))))
  }

  // graft_gram_counts (in-scan aggregation) must equal the
  // explode-every-occurrence + groupBy-count formulation it replaced,
  // on the corpus plus short/multibyte corner strings.
  test("lang_id: gram-count expression equals the explode+groupBy form") {
    import spark.implicits._
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .unionByName(Seq((90001L, ""), (90002L, "a"), (90003L, "ab"),
        (90004L, "abc"), (90005L, "ααβγ"), (90006L, "aaaa"), (90007L, "a🙂b🙂c"))
        .toDF("doc_id", "text"))
    val viaExpr = corpus
      .select(col("doc_id"),
        explode(graft.GraftFunctions.gramCounts(col("text"))).as("gc"))
      .select(col("doc_id"), col("gc.g").as("g"), col("gc.cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaAgg = corpus
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(length(text) - 2, 1)), i -> substr(text, i, 3))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaExpr == viaAgg,
      s"first diff: ${viaExpr.find { case (k, v) => viaAgg.get(k) != Some(v) }}")
  }

  // Repetition metrics on hand-computable fixtures: the dup fraction of
  // a list is 1 - |distinct|/|list| over non-empty trimmed lines /
  // lowercased whitespace words.
  test("quality_repetition: fixture fractions and the keep verdict") {
    import spark.implicits._
    val docsDf = Seq(
      (1L, "a b\na b\na b a b\na b a b"),
      // unique everything -> keep
      (2L, "one two three\nfour five six"),
      // empty and whitespace-only -> all zeros, keep
      (3L, ""), (4L, "  \n \n\t")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityRepetitionOf(docsDf).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))).toMap
    // doc 1: 4 lines 2 distinct -> 0.5; 12 words (a/b alternating):
    // 11 2-grams 2 distinct -> 1-2/11, 10 3-grams 2 distinct -> 0.8
    assert(out(1L) == ((0.5, 0.818182, 0.8, 0)))
    assert(out(2L) == ((0.0, 0.0, 0.0, 1)))
    assert(out(3L) == ((0.0, 0.0, 0.0, 1)))
    assert(out(4L) == ((0.0, 0.0, 0.0, 1)))
  }

  test("quality_repetition: corpus invariants") {
    val rows = TextAnalysis.qualityRepetition(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (l, g2, g3) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(l >= 0.0 && l <= 1.0 && g2 >= 0.0 && g2 <= 1.0 && g3 >= 0.0 && g3 <= 1.0)
      assert(r.getInt(4) == (if (l <= 0.30 && g3 <= 0.18) 1 else 0))
    }
  }
}
