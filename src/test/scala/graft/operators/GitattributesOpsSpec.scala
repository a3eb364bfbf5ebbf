package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with patterns/gitattributes.rs — the parser's own test
  * vectors plus the glob matcher's semantics. */
class GitattributesOpsSpec extends SparkSpec {

  import spark.implicits._
  import GitattributesOps._

  private def check(content: String, paths: Seq[String]): Map[String, String] = {
    val rules = parse(content)
    val files = paths.map(("w", _)).toDF("watch_folder_id", "relative_path")
    gitattrOverridesOf(files, rules).collect()
      .map(r => r.getAs[String]("relative_path") -> r.getAs[String]("result"))
      .toMap
  }

  test("empty content and comment-only files parse to no rules (gitattributes.rs parse_empty/parse_comments_and_blanks)") {
    assert(parse("").isEmpty)
    assert(parse("# This is a comment\n\n# Another comment\n").isEmpty)
    // A pattern with no attributes contributes nothing.
    assert(parse("orphanpattern\n").isEmpty)
  }

  test("language overrides lowercase their value; =true attribute forms accepted (gitattributes.rs parse_language_override)") {
    val r = parse("*.c linguist-language=Objective-C\n*.v linguist-vendored=true\n")
    assert(r.map(_.action.value) ==
      Seq("language:objective-c", "skip:vendored"))
    assert(check("*.c linguist-language=objective-c", Seq("foo.c"))("foo.c") ==
      "language:objective-c")
  }

  test("basename-only patterns match at any depth; path patterns anchor the full path (gitattributes.rs matches_gitattribute_glob)") {
    val content = "*.md linguist-documentation\nsrc/*.rs linguist-generated\n"
    val got = check(content, Seq("a.md", "deep/dir/b.md", "src/x.rs",
      "other/src/x.rs", "src/sub/y.rs"))
    assert(got("a.md") == "skip:documentation")
    assert(got("deep/dir/b.md") == "skip:documentation")
    assert(got("src/x.rs") == "skip:generated")
    // Path patterns anchor at the start — 'other/src/x.rs' escapes.
    assert(got("other/src/x.rs") == "no_match")
    // Single * never crosses '/' in a path pattern.
    assert(got("src/sub/y.rs") == "no_match")
  }

  test("double-star crosses any boundary — including mid-component (glob_match_inner ** quirk)") {
    val content = "docs/** linguist-vendored\n**/gen.rs linguist-generated\n"
    val got = check(content, Seq("docs/a.md", "docs/deep/b.md",
      "x/gen.rs", "gen.rs", "oxygen.rs"))
    assert(got("docs/a.md") == "skip:vendored")
    assert(got("docs/deep/b.md") == "skip:vendored")
    assert(got("x/gen.rs") == "skip:generated")
    assert(got("gen.rs") == "skip:generated")
    // The quirk: ** tries EVERY suffix, so **/gen.rs also matches a
    // path merely ENDING in 'gen.rs'.
    assert(got("oxygen.rs") == "skip:generated")
  }

  test("last matching rule wins; multi-attribute lines append in order (gitattributes.rs check last-match-wins)") {
    val content =
      """*.rs linguist-language=rust2018
        |src/f1*.rs linguist-language=rust-beta
        |src/f10.rs linguist-documentation linguist-language=rs10
        |""".stripMargin
    val got = check(content, Seq("lib/f2.rs", "src/f11.rs", "src/f10.rs"))
    assert(got("lib/f2.rs") == "language:rust2018")
    assert(got("src/f11.rs") == "language:rust-beta")
    // The file's own line carries documentation THEN language — the
    // later attribute's rule wins.
    assert(got("src/f10.rs") == "language:rs10")
  }

  test("corpus: every action arm live, convenience projections consistent") {
    val rows = gitattrOverrides(spark, sfDir).collect()
    val results = rows.map(_.getAs[String]("result")).toSet
    assert(results.exists(_.startsWith("language:")))
    assert(results.contains("skip:documentation"))
    assert(results.contains("skip:vendored"))
    assert(results.contains("skip:generated"))
    rows.foreach { r =>
      val res = r.getAs[String]("result")
      val lang = Option(r.getAs[String]("language_override"))
      assert(r.getAs[Boolean]("should_skip") == res.startsWith("skip:"))
      assert(lang.isDefined == res.startsWith("language:"))
      lang.foreach(l => assert(res == s"language:$l"))
    }
  }
}
