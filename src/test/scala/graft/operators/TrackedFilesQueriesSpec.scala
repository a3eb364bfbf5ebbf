package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with the MCP tracked-files read surface's own unit vectors
  * (tracked_files/filters.rs tests, queries.rs extract_repo_name,
  * project_queries.rs tests). Scenario-liveness runs on a literal
  * fixture (every arm deterministic at any SF); the corpus checks are
  * invariants over whatever the SF yields. */
class TrackedFilesQueriesSpec extends SparkSpec {

  import spark.implicits._
  import TrackedFilesQueries._

  test("glob translation: ** becomes * before the GLOB compile; * crosses / (filters.rs glob_translates_double_star)") {
    // The TS layer rewrites ** → *; SQLite GLOB '*' then crosses '/'.
    assert(globToRegex("src/**/*.rs".replace("**", "*")) == "^src/.*/.*\\.rs$")
    assert(globToRegex("f?.rs") == "^f.\\.rs$")
    assert(globToRegex("f[0-9x].py") == "^f[0-9x]\\.py$")
    assert(globToRegex("f[!2-9].md") == "^f[^2-9]\\.md$")
    // Unterminated class falls back to a literal bracket.
    assert(globToRegex("f[2.rs") == "^f\\[2\\.rs$")
  }

  private lazy val fixture = Seq(
    ("w-3", "src/f0.rs", "code", "rust", "rs", false, Seq("main", "dev")),
    ("w-3", "src/f10.rs", "code", "rust", "rs", false, Seq("b2")),
    ("w-3", "tests/f7.py", "code", "python", "py", true, Seq("main", "dev")),
    ("w-3", "lib/f1.md", "docs", "markdown", "md", false, Seq("main")),
    ("w-3", "lib/f5.md", "docs", "markdown", "md", false, Seq("dev")),
    ("w-4", "src/f0.rs", "code", "rust", "rs", false, Seq("main")),
    ("w-6", "docs/f2.md", "docs", "markdown", "md", false, Seq.empty[String]))
    .toDF("watch_folder_id", "relative_path", "file_type", "language",
      "extension", "is_test", "branches")

  private lazy val byScenario =
    trackedSearchOf(fixture, Scenarios).collect()
      .groupBy(_.getAs[String]("scenario"))
      .map { case (k, v) =>
        k -> v.sortBy(_.getAs[Int]("rk")).map(_.getAs[String]("relative_path")).toSeq }

  test("every buildFilterClause arm selects exactly its rows (filters.rs condition tests)") {
    assert(byScenario("bare") ==
      Seq("lib/f1.md", "lib/f5.md", "src/f0.rs", "src/f10.rs", "tests/f7.py"))
    // path prefix LIKE + exclude-tests (is_test rows dropped).
    assert(byScenario("path_no_tests") == Seq("src/f0.rs", "src/f10.rs"))
    // language + extension equality on the other watch.
    assert(byScenario("lang_ext") == Seq("src/f0.rs"))
    // branch membership via json_each EXISTS ≡ array_contains.
    assert(byScenario("branch") == Seq("lib/f5.md", "src/f0.rs", "tests/f7.py"))
    // file_type equality.
    assert(byScenario("file_type") == Seq("docs/f2.md"))
  }

  test("glob arms: * crosses /, ? is one char, classes and negated classes (SQLite GLOB semantics)") {
    assert(byScenario("glob") == Seq("src/f10.rs"))
    assert(byScenario("glob_q") == Seq("src/f0.rs"))
    assert(byScenario("glob_class") == Seq("tests/f7.py"))
    assert(byScenario("glob_neg") == Seq("lib/f1.md"))
  }

  test("component base paths OR + keyset cursor (filters.rs component_base_paths_or_logic / after_path_cursor_added)") {
    // src/* ∪ lib/* with relative_path > 'lib/f3' (strict keyset).
    assert(byScenario("components_cursor") ==
      Seq("lib/f5.md", "src/f0.rs", "src/f10.rs"))
  }

  test("total is the pre-limit count; the listing caps at the limit (queries.rs count_tracked_files)") {
    val tiny = Scenarios.map(s => if (s.name == "bare") s.copy(limit = 2) else s)
    val rows = trackedSearchOf(fixture, tiny).collect()
      .filter(_.getAs[String]("scenario") == "bare")
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("total") == 5L))
    assert(rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[String]("relative_path"))
      .toSeq == Seq("lib/f1.md", "lib/f5.md"))
  }

  test("corpus invariants: every returned row satisfies its scenario's filters") {
    val rows = trackedSearch(spark, sfDir).collect()
    rows.foreach { r =>
      val p = r.getAs[String]("relative_path")
      r.getAs[String]("scenario") match {
        case "path_no_tests" =>
          assert(p.startsWith("src/") && !r.getAs[Boolean]("is_test"))
        case "lang_ext" =>
          assert(r.getAs[String]("language") == "rust" &&
            r.getAs[String]("extension") == "rs")
        case "glob" => assert(p.matches("^.*/f1.*\\.rs$"))
        case "glob_q" => assert(p.matches("^src/f.\\.rs$"))
        case "glob_class" => assert(p.matches("^tests/f[0-9]\\.py$"))
        case "glob_neg" => assert(p.matches("^lib/f[^2-9]\\.md$"))
        case "components_cursor" =>
          assert((p.startsWith("src/") || p.startsWith("lib/")) && p > "lib/f3")
        case "file_type" => assert(r.getAs[String]("file_type") == "docs")
        case _ => ()
      }
    }
  }

  test("extract_repo_name: .git/slash trims, scp colon form, empty → path basename (queries.rs extract_repo_name)") {
    val rows = submoduleRepos(spark, sfDir).filter(col("section") === "submodule")
      .collect().map(r => r.getAs[String]("path") -> r.getAs[String]("name")).toMap
    assert(rows("vendor/lib-a") == "lib-a")
    assert(rows("vendor/lib-b") == "lib-b")
    assert(rows("vendor/lib-c") == "lib-c")
    assert(rows("deps/fallback") == "fallback")
    assert(rows("x/y") == "lib-d")
    assert(rows("tools/helper") == "r")
    // 'x:' → colon part empty → falls to the submodule-path basename.
    assert(rows("odd") == "odd")
  }

  test("components listed per watch in name order (queries.rs list_project_components)") {
    val comps = submoduleRepos(spark, sfDir)
      .filter(col("section") === "component" && col("watch_id") === "w-3")
      .orderBy(col("name")).collect().map(_.getAs[String]("name")).toSeq
    assert(comps == Seq("cli", "core"))
  }

  test("registered projects include inactive rows; activity-desc order with NULLs last (project_queries.rs list_registered_projects_includes_inactive)") {
    val rows = projectRegistry(spark, sfDir)
      .filter(col("section") === "project").orderBy(col("rk")).collect()
    // 16 project-collection folders, active AND inactive.
    assert(rows.length == 16)
    assert(rows.exists(!_.getAs[Boolean]("is_active")))
    val acts = rows.map(r => Option(r.getAs[String]("last_activity_at")))
    // Non-null activities first, descending; NULLs at the tail.
    val (some, none) = acts.span(_.isDefined)
    assert(none.forall(_.isEmpty))
    val vals = some.flatten
    assert(vals.sorted(Ordering[String].reverse).sameElements(vals))
  }

  test("container folder is the last non-empty path segment (project_queries.rs container_folder_extracted_correctly)") {
    val byId = projectRegistry(spark, sfDir)
      .filter(col("section") === "project").collect()
      .map(r => r.getAs[String]("project_id") -> r.getAs[String]("container_folder"))
      .toMap
    assert(byId("src3") == "proj-3")
    assert(byId("src11") == "docs")
  }

  test("hint names the first 15 with projectIds and appends (+N more) (project_queries.rs format_available_projects_hint_lists_ids)") {
    val hint = projectRegistry(spark, sfDir)
      .filter(col("section") === "hint").collect().head.getAs[String]("hint")
    assert(hint.startsWith(" Available projects — retry with projectId=<id>: "))
    assert(hint.contains("(projectId: src"))
    assert(hint.endsWith(" (+1 more)"))
    assert(hint.split(", ").length == 15)

    // Empty registry → the register guidance arm.
    val empty = projectRegistryOf(
      Seq.empty[(String, String, Boolean, String, String)]
        .toDF("project_id", "path", "is_active", "created_at",
          "last_activity_at"))
      .filter(col("section") === "hint").collect().head.getAs[String]("hint")
    assert(empty.contains("No projects are registered yet"))
    assert(empty.contains("register"))
  }
}
