package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference vectors for graph relationship extraction: every unit test of
  * graph/extractor/tests.rs (parse_qualified_name, extract_type_references,
  * the four import parsers, is_valid_symbol_name incl. the turbofish
  * artifacts), plus the extract_edges integration counts.
  */
class GraphExtractionSpec extends SparkSpec {
  import spark.implicits._

  private def evalStr(c: Column): Seq[String] =
    Seq("x").toDF("x").select(c.as("r")).collect().map(_.getString(0)).toSeq

  private def evalArr(c: Column): Seq[String] =
    Seq("x").toDF("x").select(c.as("r")).collect()
      .flatMap(_.getSeq[String](0)).toSeq

  private def evalBool(c: Column): Boolean =
    Seq("x").toDF("x").select(c.as("r")).collect().head.getBoolean(0)

  // ── parse_qualified_name (tests.rs:9-34) ───────────────────────────────

  test("qualified base: rust path takes last :: component") {
    assert(evalStr(GraphExtraction.qualifiedBase(
      lit("std::collections::HashMap::new"))) == Seq("new"))
  }

  test("qualified base: dot method call") {
    assert(evalStr(GraphExtraction.qualifiedBase(lit("self.process"))) == Seq("process"))
  }

  test("qualified base: unqualified and empty pass through") {
    assert(evalStr(GraphExtraction.qualifiedBase(lit("println"))) == Seq("println"))
    assert(evalStr(GraphExtraction.qualifiedBase(lit(""))) == Seq(""))
  }

  // ── extract_type_references (tests.rs:39-66) ───────────────────────────

  test("type refs: rust signature keeps types, drops keywords/primitives") {
    val refs = evalArr(GraphExtraction.typeReferences(
      lit("fn process(data: Vec<String>) -> Result<(), Error>"), lit("rust")))
    assert(Seq("Vec", "String", "Result", "Error").forall(refs.contains))
    assert(!refs.contains("fn"))
  }

  test("type refs: typescript drops primitive string, keeps Promise/Response") {
    val refs = evalArr(GraphExtraction.typeReferences(
      lit("function fetch(url: string): Promise<Response>"), lit("typescript")))
    assert(refs.contains("Promise") && refs.contains("Response"))
    assert(!refs.contains("string"))
  }

  test("type refs: no duplicates") {
    val refs = evalArr(GraphExtraction.typeReferences(
      lit("fn merge(a: Vec<String>, b: Vec<String>) -> Vec<String>"), lit("rust")))
    assert(refs.count(_ == "Vec") == 1)
  }

  test("type refs: Self (rust) and None/True/False (python) are keywords, never types") {
    assert(!evalArr(GraphExtraction.typeReferences(
      lit("fn f(self: Self) -> Widget"), lit("rust"))).contains("Self"))
    val py = evalArr(GraphExtraction.typeReferences(
      lit("def f(x: Optional = None) -> True"), lit("python")))
    assert(py == Seq("Optional"))
  }

  // ── parse_rust_use (tests.rs:71-92) ────────────────────────────────────

  test("rust use: simple path takes last component") {
    assert(evalArr(GraphExtraction.rustUseSymbols(
      lit("use std::collections::HashMap;"))) == Seq("HashMap"))
  }

  test("rust use: grouped braces split") {
    assert(evalArr(GraphExtraction.rustUseSymbols(
      lit("use crate::graph::{GraphNode, GraphEdge};"))) == Seq("GraphNode", "GraphEdge"))
  }

  test("rust use: wildcard skipped") {
    assert(evalArr(GraphExtraction.rustUseSymbols(lit("use super::*;"))).isEmpty)
  }

  test("rust use: single segment kept; bare self after :: dropped") {
    assert(evalArr(GraphExtraction.rustUseSymbols(lit("use serde;"))) == Seq("serde"))
    assert(evalArr(GraphExtraction.rustUseSymbols(lit("use foo::self;"))).isEmpty)
  }

  // ── parse_python_import (tests.rs:97-118) ──────────────────────────────

  test("python: import simple / from single / from multiple / as alias") {
    assert(evalArr(GraphExtraction.pythonImportSymbols(lit("import numpy"))) == Seq("numpy"))
    assert(evalArr(GraphExtraction.pythonImportSymbols(
      lit("from pathlib import Path"))) == Seq("Path"))
    assert(evalArr(GraphExtraction.pythonImportSymbols(
      lit("from typing import Dict, List, Optional"))) == Seq("Dict", "List", "Optional"))
    assert(evalArr(GraphExtraction.pythonImportSymbols(
      lit("import numpy as np"))) == Seq("numpy"))
  }

  test("python: from-import star dropped") {
    assert(evalArr(GraphExtraction.pythonImportSymbols(lit("from os import *"))).isEmpty)
  }

  // ── parse_js_import (tests.rs:123-144) ─────────────────────────────────

  test("js: named imports / default / namespace skip / alias") {
    assert(evalArr(GraphExtraction.jsImportSymbols(
      lit("import { Component, useState } from 'react';"))) == Seq("Component", "useState"))
    assert(evalArr(GraphExtraction.jsImportSymbols(
      lit("import React from 'react';"))) == Seq("React"))
    assert(evalArr(GraphExtraction.jsImportSymbols(
      lit("import * as path from 'path';"))).isEmpty)
    assert(evalArr(GraphExtraction.jsImportSymbols(
      lit("import { useState as state } from 'react';"))) == Seq("useState"))
  }

  // ── parse_go_import (tests.rs:149-158) ─────────────────────────────────

  test("go: quoted path takes last segment; frame lines skipped") {
    assert(evalArr(GraphExtraction.goImportSymbols(lit("\"fmt\""))) == Seq("fmt"))
    assert(evalArr(GraphExtraction.goImportSymbols(lit("\"encoding/json\""))) == Seq("json"))
    assert(evalArr(GraphExtraction.goImportSymbols(lit("alias \"some/package\""))) == Seq("package"))
    assert(evalArr(GraphExtraction.goImportSymbols(lit("import ("))).isEmpty)
    assert(evalArr(GraphExtraction.goImportSymbols(lit(")"))).isEmpty)
  }

  test("import dispatch: the >=2-char gate drops single-char symbols") {
    assert(evalArr(GraphExtraction.importSymbols(
      lit("from os import a, ab"), lit("python"))) == Seq("ab"))
  }

  // ── is_valid_symbol_name (tests.rs:322-339) ────────────────────────────

  test("symbol validity: identifiers and :: paths pass, artifacts fail") {
    assert(evalBool(GraphExtraction.isValidSymbol(lit("foo"))))
    assert(evalBool(GraphExtraction.isValidSymbol(lit("HashMap"))))
    assert(evalBool(GraphExtraction.isValidSymbol(lit("_private"))))
    assert(evalBool(GraphExtraction.isValidSymbol(lit("std::vec::Vec"))))
    assert(evalBool(GraphExtraction.isValidSymbol(lit("_x"))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit("<String"))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit("_>"))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit("<String, _>"))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit("foo::"))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit(""))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit("_"))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit("__"))))
    assert(!evalBool(GraphExtraction.isValidSymbol(lit("foo::_"))))
  }

  // ── extract_edges integration (tests.rs:163-362) ───────────────────────

  private def chunksDf(rows: Seq[(String, String, String, String, String, String, String, String, String)]): DataFrame =
    rows.toDF("tenant_id", "file_path", "language", "chunk_type",
      "symbol_name", "parent_symbol", "calls", "signature", "content")

  test("extract: CONTAINS edge from parent_symbol") {
    val edges = GraphExtraction.extractEdgesOf(chunksDf(Seq(
      ("t1", "src/lib.rs", "rust", "method", "process", "MyStruct", "", null, null))))
      .collect()
    val contains = edges.filter(_.getAs[String]("edge_type") == "CONTAINS")
    assert(contains.length == 1)
    assert(contains.head.getAs[String]("src_symbol") == "MyStruct")
    assert(contains.head.getAs[String]("src_type") == "struct") // no 'impl '/:: prefix
  }

  test("extract: rust impl-prefixed and ::-qualified parents infer impl") {
    val edges = GraphExtraction.extractEdgesOf(chunksDf(Seq(
      ("t1", "a.rs", "rust", "method", "f", "impl Widget", "", null, null),
      ("t1", "b.rs", "rust", "method", "g", "ns::P", "", null, null),
      ("t1", "c.py", "python", "method", "h", "Parent", "", null, null))))
      .collect().filter(_.getAs[String]("edge_type") == "CONTAINS")
      .map(r => r.getAs[String]("src_symbol") -> r.getAs[String]("src_type")).toMap
    assert(edges == Map("impl Widget" -> "impl", "ns::P" -> "impl", "Parent" -> "class"))
  }

  test("extract: CALLS edges, one per callee") {
    val calls = GraphExtraction.extractEdgesOf(chunksDf(Seq(
      ("t1", "src/main.rs", "rust", "function", "main", "", "foo,bar", null, null))))
      .collect().filter(_.getAs[String]("edge_type") == "CALLS")
    assert(calls.map(_.getAs[String]("dst_symbol")).sorted.toSeq == Seq("bar", "foo"))
  }

  test("extract: USES_TYPE from signature (Vec, String, Result, Error)") {
    val types = GraphExtraction.extractEdgesOf(chunksDf(Seq(
      ("t1", "src/lib.rs", "rust", "function", "process", "", "",
        "fn process(data: Vec<String>) -> Result<(), Error>", null))))
      .collect().filter(_.getAs[String]("edge_type") == "USES_TYPE")
    assert(types.map(_.getAs[String]("dst_symbol")).sorted.toSeq ==
      Seq("Error", "Result", "String", "Vec"))
  }

  test("extract: turbofish artifacts never become CALLS targets (tests.rs:237)") {
    val rows = GraphExtraction.extractEdgesOf(chunksDf(Seq(
      ("t1", "src/lib.rs", "rust", "function", "caller", "", "foo,<String, _>", null, null))))
      .collect()
    val calls = rows.filter(_.getAs[String]("edge_type") == "CALLS")
    assert(calls.map(_.getAs[String]("dst_symbol")).toSeq == Seq("foo"))
    assert(rows.forall(r => !r.getAs[String]("dst_symbol").contains("<") &&
      !r.getAs[String]("dst_symbol").contains(">")))
  }

  test("extract: preamble imports become file->module IMPORTS edges (tests.rs:342)") {
    val imports = GraphExtraction.extractEdgesOf(chunksDf(Seq(
      ("t1", "src/lib.rs", "rust", "preamble", "", "", "", null,
        "use std::collections::HashMap;\nuse crate::graph::{GraphNode, GraphEdge};"))))
      .collect().filter(_.getAs[String]("edge_type") == "IMPORTS")
    assert(imports.map(_.getAs[String]("dst_symbol")).sorted.toSeq ==
      Seq("GraphEdge", "GraphNode", "HashMap"))
    assert(imports.forall(_.getAs[String]("src_type") == "file"))
  }

  test("extract: text chunks and empty symbol names produce no nodes or edges") {
    val rows = GraphExtraction.extractEdgesOf(chunksDf(Seq(
      ("t1", "a.rs", "rust", "text", "sym", "Parent", "foo", "fn f() -> Widget", null),
      ("t1", "a.rs", "rust", "function", "", "Parent", "foo", "fn f() -> Widget", null))))
      .collect()
    assert(rows.isEmpty)
  }

  test("corpus: graph_extract edge set is distinct and covers all four edge types") {
    val df = GraphExtraction.graphExtract(spark, sfDir).cache()
    val n = df.count()
    assert(n == df.distinct().count())
    val types = df.select("edge_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("CONTAINS", "CALLS", "USES_TYPE", "IMPORTS"))
    df.unpersist()
  }
}
