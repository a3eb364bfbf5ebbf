package graft.operators

import graft.SparkSpec

/** Parity with the reference's structural_tags test cases
  * (structural_tags.rs tests module), run through the Spark operator.
  */
class StructuralTagsSpec extends SparkSpec {

  private lazy val tagsByDoc: Map[Long, Set[String]] = {
    import spark.implicits._
    val files = Seq(
      (1L, "src/main.rs", "", "rust"),
      (2L, "src/main.rs", "use tokio::runtime::Runtime;\nuse serde::Serialize;\n", "rust"),
      (3L, "app/models.py", "from django.db import models\nimport pandas as pd\n", "python"),
      (4L, "src/App.tsx", "import React from 'react';\nimport axios from 'axios';\n", "typescript"),
      (5L, "Cargo.toml", "", null),
      (6L, "package.json", "", null),
      (7L, "src/tests/test_auth.py", "", "python"),
      (8L, "src/api/routes.rs", "", "rust"),
      (9L, "src/grpc/service.rs", "", "rust"),
      (10L, "src/storage/database.rs", "", "rust"),
      (11L, "README.md", "", null),
      (12L, "src/auth_test.rs", "", "rust"),
      (13L, "src/auth.spec.ts", "", "typescript"),
      (14L, "auth_test.go", "", "go"),
      (15L, "src/main/java/App.java", "import org.springframework.boot.SpringApplication;\n", "java"),
      (16L, "main.go", "import \"github.com/gin-gonic/gin\"\n", "go")
    ).toDF("doc_id", "file_path", "content", "language")
    StructuralTags.structuralTagsOf(files).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  // tests.rs test_language_tag
  test("language tag from the language id") {
    assert(tagsByDoc(1L).contains("language:rust"))
  }

  // tests.rs test_framework_rust_tokio / _python_django / _js_react /
  // _java_spring / _go_gin
  test("framework tags from import patterns per language") {
    assert(tagsByDoc(2L).contains("framework:tokio"))
    assert(tagsByDoc(2L).contains("framework:serde"))
    assert(tagsByDoc(3L).contains("framework:django"))
    assert(tagsByDoc(3L).contains("framework:pandas"))
    assert(tagsByDoc(4L).contains("framework:react"))
    assert(tagsByDoc(4L).contains("framework:axios"))
    assert(tagsByDoc(15L).contains("framework:spring"))
    assert(tagsByDoc(16L).contains("framework:gin"))
  }

  // tests.rs test_build_system_cargo / _npm (+ the .rs path heuristic)
  test("build system from manifest name or rust path") {
    assert(tagsByDoc(5L).contains("build:cargo"))
    assert(!tagsByDoc(5L).exists(_.startsWith("language:")), "no language id → no language tag")
    assert(tagsByDoc(6L).contains("build:npm"))
    assert(tagsByDoc(1L).contains("build:cargo"), ".rs path infers cargo")
  }

  // tests.rs test_layer_test / _api / _grpc / _data_access /
  // test_test_file_patterns
  test("layer from path patterns, first match wins") {
    assert(tagsByDoc(7L).contains("layer:test"))
    assert(tagsByDoc(8L).contains("layer:api"))
    assert(tagsByDoc(9L).contains("layer:api"), "gRPC maps to api layer")
    assert(tagsByDoc(10L).contains("layer:data-access"))
    assert(tagsByDoc(12L).contains("layer:test"), "_test.rs")
    assert(tagsByDoc(13L).contains("layer:test"), ".spec.ts")
    assert(tagsByDoc(14L).contains("layer:test"), "_test.go")
  }

  // tests.rs test_no_language_no_source
  test("README.md yields no structural tags") {
    assert(!tagsByDoc.contains(11L))
  }

  test("corpus query: every document carries exactly its language tag") {
    val rows = StructuralTags.structuralTags(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == docs.length, "one tag row per document")
    assert(rows.toSet == docs.map { case (d, l) => (d, s"language:$l") }.toSet)
  }
}
