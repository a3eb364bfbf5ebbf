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
