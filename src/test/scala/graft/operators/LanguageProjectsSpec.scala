package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with language/projects.rs + common/exclusion.rs: the
  * directory-walk exclusion rules, the extension map, and the project
  * display abbreviation.
  */
class LanguageProjectsSpec extends SparkSpec {

  import spark.implicits._

  test("exclusion.rs:44 rules: .github whitelisted, hidden skipped, critical dirs skipped") {
    val rows = Seq(
      ("p", "/w/p", "src/main.rs"),          // counted
      ("p", "/w/p", ".github/ci.yaml"),      // .github whitelisted → counted
      ("p", "/w/p", ".git/config.py"),       // hidden dir → skipped
      ("p", "/w/p", "node_modules/x.js"),    // critical dir → skipped
      ("p", "/w/p", "target/debug/x.rs"),    // critical dir → skipped
      ("p", "/w/p", "src/vendor/y.go"))      // nested critical → skipped
      .toDF("project_name", "root", "rel_path")
    val out = LanguageProjects.languageProjectsOf(rows).collect()
      .map(r => r.getAs[String]("language") -> r.getAs[Long]("file_count")).toMap
    assert(out == Map("rust" -> 1L, "yaml" -> 1L))
  }

  test("unmapped extensions and extensionless files don't count (projects.rs:224)") {
    val rows = Seq(
      ("p", "/w/p", "src/README"),
      ("p", "/w/p", "src/notes.xyz"),
      ("p", "/w/p", "src/types.d.ts"))       // compound key → typescript
      .toDF("project_name", "root", "rel_path")
    val out = LanguageProjects.languageProjectsOf(rows).collect()
    assert(out.length == 1 &&
      out.head.getAs[String]("language") == "typescript")
  }

  test("abbreviate_project: name wins, else root basename (projects.rs:232 vectors)") {
    val rows = Seq(
      ("myapp", "/home/user/myapp", "src/a.rs"),
      ("", "/home/user/other", "src/b.rs"))
      .toDF("project_name", "root", "rel_path")
    val out = LanguageProjects.languageProjectsOf(rows).collect()
      .map(_.getAs[String]("project")).sorted.toSeq
    assert(out == Seq("myapp", "other"))
  }
}
