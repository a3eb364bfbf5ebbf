package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Structural tag extraction — auto-derived tags from file metadata
  * (keyword_extraction/structural_tags.rs:19 `extract_structural_tags`):
  * a `language:<lang>` tag, `framework:<name>` tags from per-language
  * import-pattern tables matched against the content,
  * `build:<system>` from the manifest file name (or a Rust path
  * heuristic), and `layer:<layer>` from path patterns
  * (test/api/data-access/config, first match wins).
  *
  * Relational shape: the language/build/layer rules are pure
  * projections; framework detection is a BROADCAST join against the
  * ~55-row pattern table with a `contains` predicate — one corpus scan,
  * map-side only, no shuffle beyond the final distinct on (doc, tag)
  * (the reference pushes one tag per matching pattern, so e.g.
  * `import django` + `from django` both push `framework:django`; the
  * relational output dedups to one row — a documented normalization).
  *
  * The corpus query derives the file identity honestly from the
  * columns the corpus has: `language` = the `lang` column and
  * `file_path` = `source`/doc`<id>`.txt. Languages outside the
  * reference's five framework tables yield no framework tags
  * (structural_tags.rs:103 `_ => {}`), and the synthetic paths carry no
  * manifest or layer directories — so the corpus output is the
  * language-tag projection, while the framework/build/layer rules are
  * exercised by the reference's own test vectors in the parity spec.
  */
object StructuralTags {

  /** (language, import pattern, framework name) — structural_tags.rs
    * RUST_/PYTHON_/JS_/GO_/JAVA_FRAMEWORKS tables verbatim; the JS table
    * serves all four JS-family language ids (structural_tags.rs:82).
    */
  val frameworkPatterns: Seq[(String, String, String)] = {
    val rust = Seq(
      "use tokio" -> "tokio", "use axum" -> "axum", "use actix" -> "actix",
      "use serde" -> "serde", "use diesel" -> "diesel", "use sqlx" -> "sqlx",
      "use tonic" -> "tonic", "use warp" -> "warp", "use reqwest" -> "reqwest",
      "use clap" -> "clap", "use tracing" -> "tracing", "use hyper" -> "hyper",
      "use tower" -> "tower", "use qdrant_client" -> "qdrant",
      "use fastembed" -> "fastembed")
    val python = Seq(
      "import django" -> "django", "from django" -> "django",
      "import flask" -> "flask", "from flask" -> "flask",
      "import fastapi" -> "fastapi", "from fastapi" -> "fastapi",
      "import pandas" -> "pandas", "import numpy" -> "numpy",
      "import torch" -> "pytorch", "import tensorflow" -> "tensorflow",
      "import sqlalchemy" -> "sqlalchemy", "import pytest" -> "pytest",
      "import asyncio" -> "asyncio", "import aiohttp" -> "aiohttp")
    val js = Seq(
      "from 'react'" -> "react", "from \"react\"" -> "react",
      "require('react')" -> "react", "from 'vue'" -> "vue",
      "from \"vue\"" -> "vue", "from 'express'" -> "express",
      "require('express')" -> "express", "from 'next" -> "nextjs",
      "from '@angular" -> "angular", "from 'svelte'" -> "svelte",
      "from '@nestjs" -> "nestjs", "from 'axios'" -> "axios",
      "from 'prisma'" -> "prisma", "@modelcontextprotocol" -> "mcp")
    val go = Seq(
      "\"net/http\"" -> "net-http", "\"github.com/gin-gonic/gin\"" -> "gin",
      "\"github.com/gorilla/mux\"" -> "gorilla",
      "\"github.com/labstack/echo\"" -> "echo",
      "\"gorm.io/gorm\"" -> "gorm", "\"google.golang.org/grpc\"" -> "grpc")
    val java = Seq(
      "import org.springframework" -> "spring",
      "import javax.persistence" -> "jpa", "import io.quarkus" -> "quarkus",
      "import jakarta." -> "jakarta", "import org.junit" -> "junit",
      "import org.hibernate" -> "hibernate")
    rust.map { case (p, n) => ("rust", p, n) } ++
      python.map { case (p, n) => ("python", p, n) } ++
      Seq("javascript", "typescript", "tsx", "jsx").flatMap(l =>
        js.map { case (p, n) => (l, p, n) }) ++
      go.map { case (p, n) => ("go", p, n) } ++
      java.map { case (p, n) => ("java", p, n) }
  }

  /** detect_build_system (structural_tags.rs:183): manifest file name →
    * build system, else the Rust path heuristic. */
  def buildSystem(filePath: Column, fileName: Column): Column =
    when(fileName === "Cargo.toml", "cargo")
      .when(fileName === "package.json", "npm")
      .when(fileName === "pyproject.toml", "poetry")
      .when(fileName.isin("setup.py", "setup.cfg"), "setuptools")
      .when(fileName === "go.mod", "go-mod")
      .when(fileName === "pom.xml", "maven")
      .when(fileName.isin("build.gradle", "build.gradle.kts"), "gradle")
      .when(fileName.isin("Makefile", "makefile", "GNUmakefile"), "make")
      .when(fileName === "CMakeLists.txt", "cmake")
      .when(fileName === "Dockerfile", "docker")
      .when(filePath.contains("/src/rust/") || filePath.contains(".rs"), "cargo")

  /** detect_layer (structural_tags.rs:211): first matching layer over
    * the lowercased path/file name, reference rule order. */
  def layer(filePath: Column, fileName: Column): Column = {
    val p = lower(filePath)
    val f = lower(fileName)
    when(p.contains("/test") || p.contains("/tests/") || p.contains("/spec/") ||
        p.contains("/bench") || f.startsWith("test_") || f.endsWith("_test.rs") ||
        f.endsWith("_test.go") || f.endsWith(".test.ts") || f.endsWith(".test.js") ||
        f.endsWith(".spec.ts") || f.endsWith(".spec.js"), "test")
      .when(p.contains("/api/") || p.contains("/routes/") || p.contains("/controllers/") ||
        p.contains("/handlers/") || p.contains("/endpoints/") || p.contains("/grpc/"), "api")
      .when(p.contains("/models/") || p.contains("/schema/") || p.contains("/migrations/") ||
        p.contains("/storage/") || p.contains("/repository/") || p.contains("/dao/") ||
        f.contains("storage") || f.contains("repository"), "data-access")
      .when(p.contains("/config/") || p.contains("/settings/") || f.contains("config"), "config")
  }

  /** The generic operator over a (doc_id, file_path, content, language)
    * frame — also fed the reference's structural_tags test fixtures by
    * the parity spec. Output: one (doc_id, tag) row per distinct tag.
    */
  def structuralTagsOf(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val withName = files.withColumn("file_name", element_at(split(col("file_path"), "/"), -1))
    val langTags = withName.filter(col("language").isNotNull)
      .select(col("doc_id"), concat(lit("language:"), col("language")).as("tag"))
    val pats = frameworkPatterns.toDF("p_lang", "pattern", "fw")
    val fwTags = withName.filter(col("language").isNotNull)
      .join(broadcast(pats), col("language") === col("p_lang") &&
        col("content").contains(col("pattern")))
      .select(col("doc_id"), concat(lit("framework:"), col("fw")).as("tag"))
    val buildTags = withName
      .select(col("doc_id"), buildSystem(col("file_path"), col("file_name")).as("b"))
      .filter(col("b").isNotNull)
      .select(col("doc_id"), concat(lit("build:"), col("b")).as("tag"))
    val layerTags = withName
      .select(col("doc_id"), layer(col("file_path"), col("file_name")).as("l"))
      .filter(col("l").isNotNull)
      .select(col("doc_id"), concat(lit("layer:"), col("l")).as("tag"))
    langTags.union(fwTags).union(buildTags).union(layerTags)
      .distinct()
      .orderBy(col("doc_id"), col("tag"))
  }

  /** structural_tags query: the corpus metadata mapped through the rule
    * pipeline (language = `lang`, path = `source`/doc`<id>`.txt). */
  def structuralTags(spark: SparkSession, dir: String): DataFrame =
    structuralTagsOf(Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(col("source"), lit("/doc"), col("doc_id"), lit(".txt")).as("file_path"),
        col("text").as("content"),
        col("lang").as("language")))
}
