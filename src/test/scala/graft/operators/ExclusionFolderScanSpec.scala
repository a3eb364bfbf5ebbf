package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with patterns/exclusion/tests.rs (the engine cascade) and
  * strategies/processing/folder/scan.rs (the scan decision chain). */
class ExclusionFolderScanSpec extends SparkSpec {

  import spark.implicits._

  private def excluded(paths: String*): Seq[Boolean] = {
    val df = paths.toDF("path")
    val m = ExclusionEngineOps.exclusionCheckOf(df).collect()
      .map(r => r.getAs[String]("path") -> r.getAs[Boolean]("excluded")).toMap
    paths.map(m)
  }

  test("basic exclusion: vcs, node_modules, build artifacts; source files pass (tests.rs test_basic_exclusion)") {
    assert(excluded(".git/config", ".gitignore",
      "node_modules/package/index.js", "target/debug/main") ==
      Seq(true, true, true, true))
    assert(excluded("src/main.rs", "README.md") == Seq(false, false))
  }

  test("critical patterns: system, security, temp files (tests.rs test_critical_patterns)") {
    assert(excluded(".DS_Store", "Thumbs.db", ".env", "id_rsa",
      "file.tmp", "document.swp") == Seq.fill(6)(true))
  }

  test("filename and full-path forms both hit (tests.rs test_filename_vs_path_exclusion)") {
    assert(excluded("path/to/.DS_Store", ".DS_Store",
      "project/node_modules/package.json", "node_modules/package.json") ==
      Seq.fill(4)(true))
  }

  test("hidden components exclude at any depth (tests.rs test_hidden_files_excluded_at_all_depths)") {
    assert(excluded(".mypy_cache/something.json", ".vscode/settings.json",
      ".idea/workspace.xml", "src/.cache/file.txt",
      "deep/path/.mypy_cache/file.json", "a/b/c/.hidden/file.txt",
      "src/.hidden_file", "deep/path/.secret",
      ".hidden1/.hidden2/file.txt", "/.hidden/file", ".hidden/file/",
      "src//.hidden//file") == Seq.fill(12)(true))
  }

  test(".github is whitelisted at every position; other .g* excluded (tests.rs test_github_directory_not_excluded)") {
    assert(excluded(".github/workflows/ci.yml", ".github/CODEOWNERS",
      "project/.github/workflows/test.yml") == Seq(false, false, false))
    assert(excluded(".gradle/cache/file") == Seq(true))
  }

  test("dotted-but-not-hidden names never trip the hidden rule (tests.rs test_non_hidden_paths_not_excluded_by_hidden_rule)") {
    val df = Seq("config.json", "src/my.module.ts").toDF("path")
    ExclusionEngineOps.exclusionCheckOf(df).collect().foreach { r =>
      Option(r.getAs[String]("reason")).foreach(reason =>
        assert(!reason.contains("Hidden path component")))
    }
  }

  test("containment quirks: substring matches exclude (engine.rs contains bucket)") {
    assert(excluded("retargeting.rs", "rebuild.rs", "outline.md",
      "src/digit.gitignore", "x.tmp.bak") == Seq.fill(5)(true))
    // The dead exact-match arms never rescue these — everything plain
    // lands in contains (helpers.rs:8 ignores the exact set).
  }

  test("should_exclude_directory: .github whitelisted, dots excluded, engine probe (tests.rs test_should_exclude_directory)") {
    val names = Seq("target", "node_modules", ".git", ".hidden", ".github",
      "src", "vendor").toDF("name")
    val got = names.select(col("name"),
      ExclusionEngineOps.shouldExcludeDirectory(col("name")).as("x"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("target") && got("node_modules") && got(".git") && got(".hidden"))
    assert(!got(".github") && !got("src") && !got("vendor"))
  }

  test("root-anchored exclusion ignores dotted components above the watch root (#97, mod.rs should_exclude_file_in_root)") {
    val rows = Seq(
      ("/home/u/.config/app/ok.rs", "/home/u/.config/app"),
      ("/home/u/.config/app/.env", "/home/u/.config/app"),
      ("/home/u/.config/app", "/home/u/.config/app"),
      ("/other/x.tmp", "/home/u/.config/app"))
      .toDF("abs", "root")
    val got = rows.select(col("abs"),
      ExclusionEngineOps.shouldExcludeInRoot(col("abs"), col("root")).as("x"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!got("/home/u/.config/app/ok.rs"))
    assert(got("/home/u/.config/app/.env"))
    // The root itself is never excluded.
    assert(!got("/home/u/.config/app"))
    // Non-descendants fall back to the full path ('.tmp' contains).
    assert(got("/other/x.tmp"))
  }

  test("folder scan cascade: every verdict arm and the counter quirks (scan.rs + scan_tests.rs)") {
    val rows = FolderScanOps.folderScan(spark, sfDir).collect()
    val v = rows.filter(_.getAs[String]("root") == "/w/proj-3")
      .map(r => r.getAs[String]("name") -> r.getAs[String]("verdict")).toMap
    assert(v("vendor") == "enqueue_folder_scan")
    assert(v(".github") == "enqueue_folder_scan")
    assert(v("submod") == "enqueue_tenant_add")
    // Gate-0 ignored entries COUNT as excluded (directories too).
    assert(v("secret") == "excluded_ignore")
    assert(v("app.log") == "excluded_ignore")
    // should_exclude_directory drops SILENTLY (no counter).
    assert(v(".hidden") == "skipped_dir")
    assert(v("node_modules") == "skipped_dir")
    assert(v("target") == "skipped_dir")
    assert(v("main.rs") == "enqueue_file_add")
    assert(v("notes.md") == "enqueue_file_add")
    assert(v("old.rs") == "pruned_mtime")
    assert(v("huge.py") == "excluded_large")
    assert(v("x.tmp.rs") == "excluded_static")
    assert(v("README") == "excluded_extension")
    assert(v("link.rs") == "skipped_symlink")
    // Counters: q=2 files, d=3 dirs (folder+github+tenant), x=6
    // (secret, app.log, old.rs, huge.py, x.tmp.rs, README) — the
    // silently-skipped dirs and the symlink are uncounted.
    assert(v("__counters__") == "q=2,d=3,x=6")
    // The #97 root: the dotted home component does not exclude ok.rs.
    val dotted = rows.filter(_.getAs[String]("root") == "/home/u/.config/app")
      .map(r => r.getAs[String]("name") -> r.getAs[String]("verdict")).toMap
    assert(dotted("ok.rs") == "enqueue_file_add")
    assert(dotted(".env") == "excluded_static")
    assert(dotted("__counters__") == "q=1,d=0,x=1")
  }

  test("enqueued files carry classify_file_type and size; others carry neither (scan.rs enqueue_scanned_file)") {
    val rows = FolderScanOps.folderScan(spark, sfDir).collect()
      .filter(_.getAs[String]("name") != "__counters__")
    rows.foreach { r =>
      val enq = r.getAs[String]("verdict") == "enqueue_file_add"
      assert((r.getAs[String]("file_type") != null) == enq)
      assert((r.get(r.fieldIndex("size_bytes")) != null) == enq)
    }
    val ft = rows.filter(_.getAs[String]("verdict") == "enqueue_file_add")
      .map(r => r.getAs[String]("name") -> r.getAs[String]("file_type")).toMap
    assert(ft("main.rs") == "code")
    assert(ft("notes.md") == "text")
  }
}
