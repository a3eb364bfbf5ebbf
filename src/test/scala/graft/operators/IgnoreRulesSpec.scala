package graft.operators

import graft.SparkSpec

/** Parity with the reference's Gate-0 ignore matcher
  * (patterns/gitignore.rs tests): directory exclusion with descendant
  * matching, extension globs, union semantics across .gitignore and
  * .wqmignore, re-inclusion priority in both syntaxes, comments/blank
  * handling.
  */
class IgnoreRulesSpec extends SparkSpec {
  import spark.implicits._

  private def ignored(paths: Seq[(String, Boolean)], git: Seq[String],
                      wqm: Seq[String] = Nil): Map[String, Boolean] =
    IgnoreRules.ignoreFilterOf(
      paths.zipWithIndex.map { case ((p, d), i) => (i.toLong, p, d) }
        .toDF("doc_id", "rel_path", "is_dir"), git, wqm)
      .collect().map(r => r.getString(1) -> (r.getInt(3) == 1)).toMap

  test("gitignore excludes matching directory and its descendants (#105)") {
    val out = ignored(Seq(
      ("target", true), ("target/debug/app.o", false),
      ("src/main.rs", false), ("targets/x.o", false)),
      git = Seq("target/"))
    assert(out("target") && out("target/debug/app.o"))
    assert(!out("src/main.rs"))
    assert(!out("targets/x.o"), "dir-only pattern must not match a prefix name")
  }

  test("extension glob at any depth; anchored pattern only at root") {
    val out = ignored(Seq(
      ("a.log", false), ("deep/nested/b.log", false), ("c.txt", false),
      ("dist/x.js", false), ("sub/dist/y.js", false)),
      git = Seq("*.log", "/dist"))
    assert(out("a.log") && out("deep/nested/b.log") && !out("c.txt"))
    assert(out("dist/x.js") && !out("sub/dist/y.js"))
  }

  test("dir-only pattern does not match a plain file of the same name") {
    val out = ignored(Seq(("build", false), ("build", true)).distinct,
      git = Seq("build/"))
    // can't key two rows by same path — test separately
    val asFile = ignored(Seq(("build", false)), git = Seq("build/"))
    val asDir = ignored(Seq(("build", true)), git = Seq("build/"))
    assert(!asFile("build") && asDir("build"))
  }

  test("union semantics: .gitignore and .wqmignore exclusions both apply") {
    val out = ignored(Seq(
      ("node_modules/x.js", false), ("tmp/y.bin", false), ("keep/z.txt", false)),
      git = Seq("node_modules/"), wqm = Seq("tmp/"))
    assert(out("node_modules/x.js") && out("tmp/y.bin") && !out("keep/z.txt"))
  }

  test("re-inclusion overrides gitignore in both syntaxes; others unaffected") {
    val out = ignored(Seq(
      ("logs/keep.log", false), ("logs/drop.log", false),
      ("cache/save.bin", false), ("cache/drop.bin", false)),
      git = Seq("*.log", "cache/"),
      wqm = Seq("# comment", "", "!keep.log", "- cache/save.bin"))
    assert(!out("logs/keep.log"), "! re-inclusion overrides *.log")
    assert(out("logs/drop.log"))
    assert(!out("cache/save.bin"), "legacy '- ' re-inclusion overrides dir exclusion")
    assert(out("cache/drop.bin"))
  }

  test("in-file negation: last matching pattern wins within exclusions") {
    val out = ignored(Seq(("important.log", false), ("other.log", false)),
      git = Seq("*.log", "!important.log"))
    assert(!out("important.log") && out("other.log"))
  }

  test("recursive glob and middle ** patterns") {
    val out = ignored(Seq(
      ("docs/a/b/c.md", false), ("docs", true), ("x/docs/y.md", false),
      ("a/deep/b/file.txt", false), ("a/b/file.txt", false)),
      git = Seq("docs/**", "a/**/b/file.txt"))
    assert(out("docs/a/b/c.md"))
    assert(!out("docs"), "docs/** matches contents, not the dir itself")
    assert(!out("x/docs/y.md"), "anchored by the middle slash")
    assert(out("a/deep/b/file.txt") && out("a/b/file.txt"),
      "** crosses zero or more directories")
  }

  test("ignore_filter on the corpus matches the documented expectations") {
    val rows = IgnoreRules.ignoreFilter(spark, sfDir).collect()
      .map(r => (r.getLong(0) % 10, r.getInt(3))).distinct.toMap
    assert(rows == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 0, 4L -> 1,
      5L -> 0, 6L -> 1, 7L -> 1, 8L -> 0, 9L -> 0))
  }
}
