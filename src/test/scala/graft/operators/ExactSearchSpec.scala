package graft.operators

import graft.SparkSpec

/** Parity with the reference's escaping + exact-search test vectors
  * (text_search/escaping.rs tests module).
  */
class ExactSearchSpec extends SparkSpec {
  import ExactSearch._

  // escaping.rs test_escape_like_pattern
  test("escape_like_pattern vectors") {
    assert(escapeLikePattern("hello") == "hello")
    assert(escapeLikePattern("100%") == "100\\%")
    assert(escapeLikePattern("under_score") == "under\\_score")
    assert(escapeLikePattern("back\\slash") == "back\\\\slash")
  }

  // escaping.rs test_escape_fts5_pattern_basic/_with_quotes/_short/_exactly_3
  test("escape_fts5_pattern vectors") {
    assert(escapeFts5Pattern("println").contains("\"println\""))
    assert(escapeFts5Pattern("say \"hello\"").contains("\"say \"\"hello\"\"\""))
    assert(escapeFts5Pattern("fn").isEmpty)
    assert(escapeFts5Pattern("a").isEmpty)
    assert(escapeFts5Pattern("").isEmpty)
    assert(escapeFts5Pattern("abc").contains("\"abc\""))
  }

  // escaping.rs test_expand_braces_basic/_three_alternatives/_no_braces
  test("expand_braces vectors") {
    assert(expandBraces("*.{rs,toml}") == Seq("*.rs", "*.toml"))
    assert(expandBraces("src/**/*.{rs,ts,js}") ==
      Seq("src/**/*.rs", "src/**/*.ts", "src/**/*.js"))
    assert(expandBraces("**/*.rs") == Seq("**/*.rs"))
  }

  // escaping.rs test_extract_glob_prefix_*
  test("extract_glob_prefix vectors") {
    assert(extractGlobPrefix("src/**/*.rs").contains("src/"))
    assert(extractGlobPrefix("src/rust/*.rs").contains("src/rust/"))
    assert(extractGlobPrefix("**/*.rs").isEmpty)
    assert(extractGlobPrefix("*.rs").isEmpty)
    assert(extractGlobPrefix("?abc").isEmpty)
    assert(extractGlobPrefix("src/main.rs").contains("src/main.rs"))
  }

  // search.rs exact-substring semantics: metacharacters are literal,
  // case mode routes both sides through lower()
  test("exact search: literal metacharacters, occurrence counts, case mode") {
    import spark.implicits._
    val docs = Seq(
      (1L, "val a_b = a_b + aXb"),
      (2L, "aXb only"),
      (3L, "ratio is 100% here, 100% there"),
      (4L, "Hash Join beats hash join")
    ).toDF("doc_id", "text")
    val under = exactSearchOf(docs, "a_b").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(under.toSeq == Seq((1L, 2)), "_ must not act as a wildcard")
    val pct = exactSearchOf(docs, "100%").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(pct.toSeq == Seq((3L, 2)), "% must not act as a wildcard")
    val cs = exactSearchOf(docs, "hash join").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(cs.toSeq == Seq((4L, 1)), "case-sensitive by default")
    val ci = exactSearchOf(docs, "hash join", caseInsensitive = true)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(ci.toSeq == Seq((4L, 2)), "case-insensitive lowers both sides")
  }

  test("exact_search on the corpus matches a regex-free recount") {
    val rows = ExactSearch.exactSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    rows.foreach { r =>
      val t = docs(r.getLong(0))
      val expected = t.sliding("hash join".length).count(_ == "hash join")
      assert(r.getInt(1) == expected && expected > 0)
    }
  }
}
