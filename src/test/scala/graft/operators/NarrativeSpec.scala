package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's narrative section extraction and depth
  * estimation (narrative/sections.rs + depth.rs tests).
  */
class NarrativeSpec extends SparkSpec {
  import spark.implicits._

  test("markdown sections: heading spans run to the next heading or EOF") {
    val md = "# Title\nintro line\n\n## Introduction\nbody a\nbody b\n" +
      "## Background\nmore\n###### Deep\ntail\nlast"
    val rows = Narrative.sectionsOf(Seq((1L, md)).toDF("doc_id", "content"))
      .orderBy("section_index").collect()
      .map(r => (r.getString(2), r.getInt(3), r.getInt(4)))
    assert(rows.toSeq == Seq(
      ("Title", 1, 3), ("Introduction", 4, 6),
      ("Background", 7, 8), ("Deep", 9, 11)))
    // headings past h6 or without text are not headings
    val none = Narrative.sectionsOf(Seq(
      (1L, "####### seven\n#\n#    \nplain text")).toDF("doc_id", "content"))
    assert(none.isEmpty)
  }

  /** (heading, start, end) triples from textSectionSpansOf. */
  private def paras(txt: String): Seq[(String, Int, Int)] =
    Narrative.textSectionSpansOf(Seq((1L, txt)).toDF("doc_id", "content"))
      .orderBy("section_index").collect()
      .map(r => (r.getAs[String]("heading"), r.getAs[Int]("start_line"),
        r.getAs[Int]("end_line"))).toSeq

  // sections.rs:533 test_plain_text_paragraphs
  test("text sections: blank-line-separated paragraphs with first-line headings") {
    val txt = "First paragraph title\nSome body text here.\n\n" +
      "Second paragraph title\nMore body text.\n\n" +
      "Third paragraph title\nEven more text.\n"
    assert(paras(txt) == Seq(
      ("First paragraph title", 1, 2),
      ("Second paragraph title", 4, 5),
      ("Third paragraph title", 7, 8)))
  }

  // sections.rs:564 test_txt_empty_returns_empty
  test("text sections: empty content yields no paragraphs") {
    assert(paras("").isEmpty)
  }

  // collect_text_paragraphs semantics: whitespace-only lines are blank
  // (Rust str::trim), headings trim their indentation, trailing
  // paragraphs flush at EOF, leading blanks shift start lines
  test("text sections: whitespace blanks, trimmed headings, trailing flush") {
    assert(paras("Alpha\n  \n  Beta indented\nbody\n\t\nGamma no newline") == Seq(
      ("Alpha", 1, 1), ("Beta indented", 3, 4), ("Gamma no newline", 6, 6)))
    assert(paras("\n\nLate start\n") == Seq(("Late start", 3, 3)))
  }

  test("is_technical_word vectors (depth.rs tests)") {
    val yes = Seq("snake_case", "MY_CONST", "camelCase", "getHttpResponse",
      "MAX", "HTTP", "std::vec", "self.field", "a->b")
    val no = Seq("OK", "word", "Capitalized", "hello")
    val out = (yes ++ no).toDF("w")
      .select(Narrative.isTechnicalWord(col("w"))).collect().map(_.getBoolean(0))
    assert(out.take(yes.length).forall(identity))
    assert(out.drop(yes.length).forall(!_))
  }

  test("estimate_depth cascade: reference / rigorous / qualitative / intermediate") {
    def depth(text: String, level: Int = 0, subs: Boolean = false): String =
      Seq(text).toDF("t")
        .select(Narrative.estimateDepth(col("t"), lit(level), lit(subs)))
        .collect().head.getString(0)
    assert(depth("short") == "reference", "under 50 words")
    assert(depth(Seq.fill(60)("plain").mkString(" "), level = 5) == "reference",
      "h5+ headings are reference regardless of length")
    assert(depth("```\ncode\n```\nthe $x$ equation " +
      Seq.fill(60)("word").mkString(" ")) == "rigorous", "code + equations")
    assert(depth(Seq.fill(60)("std::call").mkString(" ")) == "rigorous",
      "technical density above 0.3")
    val prose60 = Seq.fill(60)("ab").mkString(" ") // 179 chars, zero tech
    assert(depth(prose60) == "qualitative", "short chars, low tech density")
    val prose600tech = (Seq.fill(480)("plain word") ++ Seq.fill(120)("some_id"))
      .mkString(" ") // >500 words, tech ~0.11... adjust to >=0.15
    val mid = (Seq.fill(700)("plain") ++ Seq.fill(200)("tech_id")).mkString(" ")
    assert(depth(mid, level = 3) == "intermediate",
      "501-2000 words, tech >= 0.15, deeper heading with no subsection shortcut")
    assert(depth(mid, level = 1) == "introductory",
      "production-style shallow heading collapses to introductory")
  }

  test("doc_sections on the corpus: three sections per doc, appendix rigorous") {
    val rows = Narrative.docSections(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length == 3))
    rows.filter(_.getString(2) == "Math Appendix").foreach { r =>
      assert(r.getString(5) == "rigorous" || r.getString(5) == "reference",
        s"appendix is rigorous (or reference when the doc text runs short): $r")
    }
    assert(rows.exists(_.getString(5) == "rigorous"))
  }
}
