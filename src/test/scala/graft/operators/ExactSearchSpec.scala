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

  private def matcher(glob: String): String => Boolean = { path =>
    expandBraces(glob).map(globToRegex).exists(path.matches)
  }

  // escaping.rs test_compile_glob_matcher_star_star/_with_prefix/_braces
  test("glob matcher vectors (separators not literal)") {
    val m1 = matcher("**/*.rs")
    assert(m1("src/main.rs") && m1("src/deep/nested/lib.rs") && m1("lib.rs"))
    assert(!m1("src/main.ts"))
    val m2 = matcher("src/**/*.rs")
    assert(m2("src/main.rs") && m2("src/deep/lib.rs"))
    assert(!m2("tests/test.rs"))
    val m3 = matcher("**/*.{rs,toml}")
    assert(m3("src/main.rs") && m3("Cargo.toml"))
    assert(!m3("src/main.ts"))
  }

  // escaping.rs test_resolve_path_filter_* (#94 anchoring)
  test("resolve_path_filter anchors relative globs, keeps absolute prefixes") {
    val (g1, p1) = resolvePathFilter("src/rust/**/*.rs")
    assert(g1 == "**/src/rust/**/*.rs" && p1.isEmpty)
    assert(matcher(g1)("/home/user/project/src/rust/daemon/core/src/lib.rs"))
    assert(!matcher(g1)("/home/user/project/src/python/main.py"))
    val (g2, p2) = resolvePathFilter("/abs/path/**/*.rs")
    assert(g2 == "/abs/path/**/*.rs" && p2.contains("/abs/path/"))
    val (g3, _) = resolvePathFilter("**/*.rs")
    assert(g3 == "**/*.rs")
  }

  test("glob_search scopes to matching paths and counts like exact_search") {
    val rows = ExactSearch.globSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, path, n) =>
      assert(path.matches("^/corpus/src1.*/doc.*\\.txt$"), path)
      assert(n > 0)
    }
    val unscoped = ExactSearch.exactSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    rows.foreach { case (id, _, n) => assert(unscoped(id) == n) }
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
