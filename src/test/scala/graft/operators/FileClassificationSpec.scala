package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's file classification
  * (file_classification/mod.rs tests + classification.rs tests):
  * classify_file_type priority routing, extension extraction
  * (compound `.d.ts`), language lookup, and is_test_file detection.
  */
class FileClassificationSpec extends SparkSpec {
  import spark.implicits._

  private def classify(paths: Seq[String]): Seq[(String, String, String, Int)] =
    FileClassification
      .classifyOf(paths.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("doc_id", "file_path"))
      .orderBy("doc_id")
      .collect()
      .map(r => (Option(r.getString(2)).orNull, Option(r.getString(3)).orNull,
        r.getString(4), r.getInt(5))).toSeq

  test("classify_file_type: the reference's per-category fixtures") {
    val vectors: Seq[(String, String)] = Seq(
      // code (mod.rs test_code_files)
      "main.py" -> "code", "lib.rs" -> "code", "app.js" -> "code",
      "handler.go" -> "code", "script.ps1" -> "code", "module.d" -> "code",
      "app.vue" -> "code", "page.svelte" -> "code", "main.zig" -> "code",
      "app.dart" -> "code",
      // text
      "README.md" -> "text", "guide.rst" -> "text", "notes.txt" -> "text",
      "doc.adoc" -> "text", "notes.org" -> "text", "paper.tex" -> "text",
      // docs
      "manual.pdf" -> "docs", "book.epub" -> "docs", "report.docx" -> "docs",
      "legacy.doc" -> "docs", "notes.pages" -> "docs", "book.mobi" -> "docs",
      // web
      "index.html" -> "web", "page.htm" -> "web", "doc.xhtml" -> "web",
      "styles.css" -> "web", "styles.scss" -> "web", "styles.less" -> "web",
      "data.xml" -> "web",
      // slides
      "deck.pptx" -> "slides", "legacy.ppt" -> "slides",
      "presentation.key" -> "slides", "slides.odp" -> "slides",
      // config (filename + extension)
      "config.yaml" -> "config", "settings.toml" -> "config",
      ".env" -> "config", "app.ini" -> "config",
      // json context-aware routing
      "/project/config/app.json" -> "config",
      "/project/data/records.json" -> "data",
      "/project/exports/data.xml" -> "web",
      // data
      "data.csv" -> "data", "export.parquet" -> "data",
      "db.sqlite" -> "data", "array.npy" -> "data",
      // build (extension + tarball compounds)
      "package.whl" -> "build", "app.zip" -> "build", "lib.so" -> "build",
      "archive.tar.gz" -> "build", "backup.tar.bz2" -> "build",
      // other
      "unknown.xyz" -> "other", "data" -> "other",
      // test files are still CODE for file_type
      "test_main.py" -> "code", "app.test.js" -> "code",
      "component.spec.ts" -> "code")
    val out = classify(vectors.map(_._1))
    vectors.zip(out).foreach { case ((path, expected), (_, _, ft, _)) =>
      assert(ft == expected, s"$path: $ft != $expected")
    }
  }

  test("extension extraction and language lookup (classification.rs vectors)") {
    val out = classify(Seq(
      "main.py", "lib.rs", "FILE.HTML", "types.d.ts", "global.d.mts",
      "index.d.cts", "noext", "app.jsx", "handler.go", "Main.java"))
    // storage form (no leading dot), compounds intact, case-folded
    assert(out.map(_._1) == Seq("py", "rs", "html", "d.ts", "d.mts", "d.cts",
      null, "jsx", "go", "java"))
    // language lookup (jsx → typescript is the YAML's own quirk)
    assert(out.map(_._2) == Seq("python", "rust", "html", "typescript",
      "typescript", "typescript", null, "typescript", "go", "java"))
  }

  test("is_test_file: patterns require a code extension (mod.rs fixtures)") {
    val yes = Seq("test_auth.py", "main_test.go", "app.test.js",
      "component.spec.ts", "conftest.py", "test_utils.rs",
      "/project/tests/helper.py", "/project/__tests__/utils.js",
      "/project/spec/models.rb")
    val no = Seq(
      // test-looking names WITHOUT code extensions are not tests
      "test_data.txt", "test_fixture.json", "test_input.md", "test_config.yaml",
      // non-test code
      "main.py", "utils.rs", "index.js",
      // non-code under a test dir
      "/project/tests/fixture.txt")
    val out = classify(yes ++ no)
    out.take(yes.length).zip(yes).foreach { case ((_, _, _, t), p) =>
      assert(t == 1, s"$p must be a test file")
    }
    out.drop(yes.length).zip(no).foreach { case ((_, _, _, t), p) =>
      assert(t == 0, s"$p must NOT be a test file")
    }
  }

  test("file_classify on the corpus: every router branch is populated") {
    val rows = FileClassification.fileClassify(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getString(4)).toSet
    assert(types == Set("code", "text", "docs", "web", "slides", "config",
      "data", "build", "other"))
    assert(rows.exists(_.getInt(5) == 1), "test files must occur")
    // json under /config/ routes to config, elsewhere to data
    val json = rows.filter(r => Option(r.getString(2)).contains("json"))
    assert(json.exists(_.getString(4) == "config"))
    assert(json.exists(_.getString(4) == "data"))
  }

  test("shebang + keyword language detection (comprehensive.rs signatures)") {
    import org.apache.spark.sql.functions.{col, lit}
    def sheb(c: String): Option[String] =
      Seq(c).toDF("c").select(FileClassification.shebangLanguage(col("c")))
        .collect().map(r => Option(r.getString(0))).head
    assert(sheb("#!/usr/bin/env python3\nprint('x')") == Some("python"))
    assert(sheb("#!/bin/bash\necho hi") == Some("bash"))
    assert(sheb("#!/bin/sh\necho hi") == Some("sh"))
    assert(sheb("#!/usr/bin/env node\nconsole.log(1)") == Some("javascript"))
    // shebang must sit in the first three lines
    assert(sheb("a\nb\nc\n#!/bin/bash") == None)
    // an unknown #! line does not stop the scan of later lines
    assert(sheb("#!/usr/bin/perl\n#!/bin/sh\nx") == Some("sh"))

    def kw(c: String): Option[String] =
      Seq(c).toDF("c").select(FileClassification.keywordLanguage(col("c")))
        .collect().map(r => Option(r.getString(0))).head
    assert(kw("fn main() { } struct X; impl X { }") == Some("rust"))
    assert(kw("def f():\n  import os\nclass A:") == Some("python"))
    assert(kw("const a = 1; let b = 2; var c; function f() {}") == Some("javascript"))
    assert(kw("nothing codey here") == None)
  }
}
