package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph relationship extraction — derives CONTAINS / CALLS / USES_TYPE /
  * IMPORTS edges from chunk metadata (graph/extractor/mod.rs
  * extract_edges_from_text_chunks) with the line-based import parsers
  * (extractor/import_parsers.rs) and signature type analysis
  * (extractor/type_analysis.rs).
  *
  * Everything here is a map-only projection: per-chunk CASE/regex logic,
  * `transform`/`filter` HOFs over split arrays, and `explode` — no joins,
  * no UDFs, so the whole extraction stays inside whole-stage codegen and
  * scales linearly with the chunk table. The only shuffle in the corpus
  * query is the final DISTINCT on the edge key (the reference dedups at
  * store time via INSERT OR IGNORE on the edge primary key).
  *
  * Faithful reference semantics worth naming:
  *  - `parse_qualified_name` (type_analysis.rs:10) prefers the LAST `::`
  *    over the last `.`, and a trailing empty component falls through to
  *    the next rule (`foo::` → the dot rule → the raw string, which the
  *    validity gate then rejects).
  *  - `is_valid_symbol_name` (mod.rs:361) accepts `::`-paths of plain
  *    identifiers, Unicode letters included, and rejects all-underscore
  *    segments — the turbofish-artifact gate (`<String`, `_>`, `_`).
  *    Split semantics are Rust's: a trailing `::` yields an empty final
  *    segment (Spark `split(_, _, -1)` keeps it; Java's default drops it).
  *  - `is_type_name` (type_analysis.rs:84) tests keyword/primitive tables
  *    BEFORE the uppercase-first rule, so `Self` (rust) and
  *    `None`/`True`/`False` (python) never become USES_TYPE stubs.
  *  - Import parsers: rust strips ALL trailing `;`, the wildcard test
  *    precedes the brace test; python takes the text after the FIRST
  *    ` import `, strips ` as ` aliases, and only the `from` branch
  *    filters `*`; JS skips `* as` namespace imports and the brace slice
  *    is between the FIRST `{` and FIRST `}`; go takes the first quoted
  *    path's last `/`-segment and skips the `import (` / `)` frame lines.
  *  - `extract_imports_from_content` (import_parsers.rs:26) drops symbols
  *    shorter than 2 chars.
  *
  * Node ids are the shared sha256(tenant|file|symbol|type)[..32] scheme
  * (graph/mod.rs:808 compute_node_id); stubs hash with an empty file path
  * (mod.rs:261 GraphNode::stub).
  */
object GraphExtraction {

  /** ChunkType display names that become graph nodes (extractor/mod.rs:387
    * node_type_from_display_name — preamble/text return None). */
  val NodeChunkTypes: Seq[String] = Seq(
    "function", "async_function", "class", "method", "struct", "trait",
    "interface", "enum", "impl", "module", "constant", "type_alias", "macro")

  private def emptyArr: Column = array().cast("array<string>")

  /** GraphNode::stub — compute_node_id with an empty file_path. */
  def stubNodeId(tenant: Column, sym: Column, symbolType: Column): Column =
    GraphFusion.computeNodeId(tenant, lit(""), sym, symbolType)

  /** parse_qualified_name (type_analysis.rs:10): base name after the last
    * `::`, else after the last `.`, else the whole trimmed string. An
    * empty component after the separator falls through, exactly like the
    * reference's early-return structure. */
  def qualifiedBase(call: Column): Column = {
    val t = trim(call)
    val afterColons = regexp_extract(t, "^(.*)::(.*)$", 2) // greedy → last ::
    val afterDot = regexp_extract(t, "^(.*)\\.(.*)$", 2)   // greedy → last .
    when(t.contains("::") && length(afterColons) > 0, afterColons)
      .when(t.contains(".") && length(afterDot) > 0, afterDot)
      .otherwise(t)
  }

  /** is_valid_symbol_name (extractor/mod.rs:361): every `::`-segment is a
    * plain identifier with at least one alphanumeric char. `split(_,-1)`
    * keeps trailing empty segments (Rust split semantics) so `foo::` is
    * rejected. */
  def isValidSymbol(name: Column): Column =
    length(name) > 0 && forall(split(name, "::", -1), seg =>
      seg.rlike("^[\\p{L}_][\\p{L}\\p{N}_]*$") && seg.rlike("[\\p{L}\\p{N}]"))

  // ── type_analysis.rs keyword / primitive tables ─────────────────────────

  private val RustKeywords = Seq("fn", "pub", "self", "Self", "mut", "let",
    "const", "static", "async", "await", "impl", "trait", "struct", "enum",
    "type", "where", "for", "in", "if", "else", "match", "return", "mod",
    "use", "crate", "super", "dyn", "ref", "unsafe", "extern")
  private val PythonKeywords = Seq("def", "self", "cls", "class", "return",
    "import", "from", "as", "if", "else", "elif", "for", "in", "while",
    "with", "try", "except", "raise", "pass", "lambda", "yield", "async",
    "await", "None", "True", "False")
  private val JsKeywords = Seq("function", "const", "let", "var", "return",
    "if", "else", "for", "while", "class", "extends", "implements",
    "import", "export", "default", "new", "this", "super", "async",
    "await", "yield", "typeof", "instanceof", "void", "null", "undefined",
    "true", "false")
  private val GoKeywords = Seq("func", "return", "if", "else", "for",
    "range", "switch", "case", "type", "struct", "interface", "package",
    "import", "var", "const", "defer", "go", "chan", "select", "nil",
    "true", "false", "map")
  private val RustPrimitives = Seq("i8", "i16", "i32", "i64", "i128",
    "isize", "u8", "u16", "u32", "u64", "u128", "usize", "f32", "f64",
    "bool", "char", "str")
  private val PythonPrimitives = Seq("int", "float", "str", "bool",
    "bytes", "list", "dict", "set", "tuple")
  private val JsPrimitives = Seq("string", "number", "boolean", "any",
    "never", "unknown", "void", "object")
  private val GoPrimitives = Seq("int", "int8", "int16", "int32", "int64",
    "uint", "uint8", "uint16", "uint32", "uint64", "float32", "float64",
    "bool", "string", "byte", "rune", "error")

  private val JsLangs = Seq("javascript", "typescript", "tsx", "jsx")

  private def isKeyword(tok: Column, lang: Column): Column =
    when(lang === "rust", tok.isin(RustKeywords: _*))
      .when(lang === "python", tok.isin(PythonKeywords: _*))
      .when(lang.isin(JsLangs: _*), tok.isin(JsKeywords: _*))
      .when(lang === "go", tok.isin(GoKeywords: _*))
      .otherwise(lit(false))

  private def isPrimitive(tok: Column, lang: Column): Column =
    when(lang === "rust", tok.isin(RustPrimitives: _*))
      .when(lang === "python", tok.isin(PythonPrimitives: _*))
      .when(lang.isin(JsLangs: _*), tok.isin(JsPrimitives: _*))
      .when(lang === "go", tok.isin(GoPrimitives: _*))
      .otherwise(lit(false))

  /** extract_type_references (type_analysis.rs:43): tokenize the signature
    * on non-[alnum_] boundaries, keep PascalCase non-keyword non-primitive
    * tokens of length ≥ 2, first occurrence only. */
  def typeReferences(sig: Column, lang: Column): Column =
    array_distinct(filter(
      regexp_extract_all(sig, lit("[\\p{L}\\p{N}_]+"), lit(0)),
      t => length(t) >= 2 && !isKeyword(t, lang) && !isPrimitive(t, lang) &&
        t.rlike("^\\p{Lu}")))

  /** infer_parent_node_type (extractor/mod.rs:432). */
  def parentNodeType(parent: Column, lang: Column): Column =
    when(lang === "rust",
      when(parent.startsWith("impl ") || parent.contains("::"), lit("impl"))
        .otherwise(lit("struct")))
      .when(lang.isin(("python" +: "java" +: "kotlin" +: JsLangs): _*), lit("class"))
      .when(lang === "go", lit("struct"))
      .otherwise(lit("module"))

  // ── import_parsers.rs — one array<string> expression per language ──────

  /** parse_rust_use (import_parsers.rs:60). */
  def rustUseSymbols(line: Column): Column = {
    val noSemi = regexp_replace(trim(line), ";+$", "")
    val path = trim(regexp_extract(noSemi, "^use (.*)$", 1))
    val braced = filter(
      transform(split(regexp_extract(path, "\\{([^}]*)\\}", 1), ",", -1),
        s => trim(s)),
      s => length(s) > 0 && s =!= "self" && s =!= "*")
    val lastComp = trim(regexp_extract(path, "^(.*)::(.*)$", 2))
    when(!noSemi.startsWith("use "), emptyArr)
      .when(path.endsWith("::*"), emptyArr)
      .when(path.contains("{") && path.contains("}"), braced)
      .when(path.contains("::"),
        when(length(lastComp) > 0 && lastComp =!= "self", array(lastComp))
          .otherwise(emptyArr))
      .when(length(path) > 0, array(path))
      .otherwise(emptyArr)
  }

  /** parse_python_import (import_parsers.rs:107). `substring_index`
    * slices before the FIRST ` as `, matching the reference's `find`. */
  def pythonImportSymbols(line: Column): Column = {
    val l = trim(line)
    def items(raw: Column, dropStar: Boolean): Column = {
      val stripped = transform(split(raw, ",", -1),
        s => trim(substring_index(trim(s), " as ", 1)))
      if (dropStar) filter(stripped, s => length(s) > 0 && s =!= "*")
      else filter(stripped, s => length(s) > 0)
    }
    when(l.startsWith("from ") && l.contains(" import "),
      items(regexp_extract(l, "^from .*? import (.*)$", 1), dropStar = true))
      .when(l.startsWith("import "),
        items(regexp_extract(l, "^import (.*)$", 1), dropStar = false))
      .otherwise(emptyArr)
  }

  /** parse_js_import (import_parsers.rs:154). */
  def jsImportSymbols(line: Column): Column = {
    val noSemi = regexp_replace(trim(line), ";+$", "")
    val rest = trim(regexp_extract(noSemi, "^import (.*)$", 1))
    val braced = filter(
      transform(split(regexp_extract(rest, "\\{([^}]*)\\}", 1), ",", -1),
        s => trim(substring_index(trim(s), " as ", 1))),
      s => length(s) > 0)
    val beforeFrom = trim(substring_index(rest, " from ", 1))
    when(!noSemi.startsWith("import "), emptyArr)
      .when(rest.startsWith("* as") || rest.startsWith("* "), emptyArr)
      .when(rest.contains("{") && rest.contains("}"), braced)
      .when(rest.contains(" from ") && length(beforeFrom) > 0 &&
        !beforeFrom.contains("{"), array(beforeFrom))
      .otherwise(emptyArr)
  }

  /** parse_go_import (import_parsers.rs:204): first quoted path's last
    * `/`-segment; the `import (` / `)` frame lines are skipped. */
  def goImportSymbols(line: Column): Column = {
    val l = trim(line)
    val quoted = regexp_extract(l, "\"([^\"]*)\"", 1)
    val segment = regexp_extract(quoted, "([^/]*)$", 1)
    when(l.startsWith("import") || l === "(" || l === ")", emptyArr)
      .when(l.contains("\"") && length(segment) > 0, array(segment))
      .otherwise(emptyArr)
  }

  /** parse_import_line dispatch (import_parsers.rs:44) + the ≥2-char gate
    * of extract_imports_from_content (:26). */
  def importSymbols(line: Column, lang: Column): Column = {
    val parsed =
      when(lang === "rust", rustUseSymbols(line))
        .when(lang === "python", pythonImportSymbols(line))
        .when(lang.isin(JsLangs: _*), jsImportSymbols(line))
        .when(lang === "go", goImportSymbols(line))
        .otherwise(emptyArr)
    filter(parsed, s => length(s) >= 2)
  }

  // ── edge extraction over a chunk frame ──────────────────────────────────

  /** The §3 `*Of` form: chunk metadata frame (tenant_id, file_path,
    * language, chunk_type, symbol_name, parent_symbol, calls —
    * comma-joined, signature, content — preamble text) → the DISTINCT
    * edge set with endpoint attributes:
    * (tenant_id, file_path, edge_type, src_node_id, dst_node_id,
    *  src_symbol, src_type, dst_symbol, dst_type).
    */
  def extractEdgesOf(chunks: DataFrame): DataFrame = {
    val nodeRows = chunks
      .filter(col("chunk_type").isin(NodeChunkTypes: _*) &&
        col("symbol_name").isNotNull && length(col("symbol_name")) > 0)
      .withColumn("node_id", GraphFusion.computeNodeId(
        col("tenant_id"), col("file_path"), col("symbol_name"), col("chunk_type")))

    val containsEdges = nodeRows
      .filter(col("parent_symbol").isNotNull && length(col("parent_symbol")) > 0)
      .withColumn("ptype", parentNodeType(col("parent_symbol"), col("language")))
      .select(col("tenant_id"), col("file_path"),
        lit("CONTAINS").as("edge_type"),
        stubNodeId(col("tenant_id"), col("parent_symbol"), col("ptype")).as("src_node_id"),
        col("node_id").as("dst_node_id"),
        col("parent_symbol").as("src_symbol"), col("ptype").as("src_type"),
        col("symbol_name").as("dst_symbol"), col("chunk_type").as("dst_type"))

    val callEdges = nodeRows
      .filter(col("calls").isNotNull && length(col("calls")) > 0)
      .select(col("tenant_id"), col("file_path"), col("node_id"),
        col("symbol_name"), col("chunk_type"),
        explode(split(col("calls"), ",", -1)).as("call_raw"))
      .withColumn("call", trim(col("call_raw")))
      .filter(length(col("call")) > 0)
      .withColumn("callee", qualifiedBase(col("call")))
      .filter(isValidSymbol(col("callee")))
      .select(col("tenant_id"), col("file_path"),
        lit("CALLS").as("edge_type"),
        col("node_id").as("src_node_id"),
        stubNodeId(col("tenant_id"), col("callee"), lit("function")).as("dst_node_id"),
        col("symbol_name").as("src_symbol"), col("chunk_type").as("src_type"),
        col("callee").as("dst_symbol"), lit("function").as("dst_type"))

    val typeEdges = nodeRows
      .filter(col("signature").isNotNull)
      .select(col("tenant_id"), col("file_path"), col("node_id"),
        col("symbol_name"), col("chunk_type"),
        explode(typeReferences(col("signature"), col("language"))).as("tname"))
      .filter(isValidSymbol(col("tname")))
      .select(col("tenant_id"), col("file_path"),
        lit("USES_TYPE").as("edge_type"),
        col("node_id").as("src_node_id"),
        stubNodeId(col("tenant_id"), col("tname"), lit("struct")).as("dst_node_id"),
        col("symbol_name").as("src_symbol"), col("chunk_type").as("src_type"),
        col("tname").as("dst_symbol"), lit("struct").as("dst_type"))

    val importEdges = chunks
      .filter(col("chunk_type") === "preamble" && col("content").isNotNull)
      .select(col("tenant_id"), col("file_path"), col("language"),
        explode(split(col("content"), "\n", -1)).as("line"))
      .select(col("tenant_id"), col("file_path"),
        explode(importSymbols(col("line"), col("language"))).as("sym"))
      .select(col("tenant_id"), col("file_path"),
        lit("IMPORTS").as("edge_type"),
        GraphFusion.computeNodeId(col("tenant_id"), col("file_path"),
          col("file_path"), lit("file")).as("src_node_id"),
        stubNodeId(col("tenant_id"), col("sym"), lit("module")).as("dst_node_id"),
        col("file_path").as("src_symbol"), lit("file").as("src_type"),
        col("sym").as("dst_symbol"), lit("module").as("dst_type"))

    containsEdges.unionByName(callEdges).unionByName(typeEdges)
      .unionByName(importEdges)
      .distinct()
  }

  // ── Corpus chunk axis (deterministic doc_id arithmetic, SQL-twinned) ────

  /** Synthetic chunk-metadata axis over `documents`: four languages, 16
    * files per tenant, the full 14-entry chunk-type rotation (`text`
    * exercises the no-node branch, `doc_id%17==5` the empty-symbol skip),
    * parent/calls/signature vectors that hit every parser gate (turbofish
    * artifacts, wildcard `_`, qualified calls, `impl `/`::` parent
    * inference, a missing signature), and per-language preamble content
    * covering each import-parser branch. */
  def chunkAxis(spark: SparkSession, dir: String): DataFrame = {
    val m = col("doc_id")
    val language = when(m % 4 === 0, "rust").when(m % 4 === 1, "python")
      .when(m % 4 === 2, "typescript").otherwise("go")
    val ext = when(m % 4 === 0, ".rs").when(m % 4 === 1, ".py")
      .when(m % 4 === 2, ".ts").otherwise(".go")
    val base = Tables.documents(spark, dir)
      .select(m.as("doc_id"), col("source").as("tenant_id"),
        language.as("language"),
        concat(col("source"), lit("/src/m"), m % 16, ext).as("file_path"))

    val ctypes = NodeChunkTypes :+ "text"
    val chunkType = element_at(
      array(ctypes.map(lit): _*), (col("doc_id") % 14 + 1).cast("int"))
    val symbolName = when(col("doc_id") % 17 === 5, lit(""))
      .otherwise(concat(lit("sym"), col("doc_id")))
    val parent = when(col("doc_id") % 5 === 0,
        concat(when(col("language") === "rust", lit("impl W"))
          .otherwise(lit("Parent")), col("doc_id") % 6))
      .when(col("doc_id") % 5 === 1, concat(lit("ns::P"), col("doc_id") % 6))
      .when(col("doc_id") % 5 === 4, concat(lit("Parent"), col("doc_id") % 6))
      .otherwise(lit(""))
    val calls = concat_ws(",",
      concat(lit("call"), col("doc_id") % 9),
      when(col("doc_id") % 3 === 0, lit("self.process")),
      when(col("doc_id") % 4 === 1, lit("<String")),
      when(col("doc_id") % 4 === 1, lit(" _>")),
      when(col("doc_id") % 6 === 2, lit("std::collections::HashMap::new")),
      when(col("doc_id") % 7 === 3, lit("pkg.Func")),
      when(col("doc_id") % 5 === 2, lit("_")))
    val signature = when(col("doc_id") % 11 === 7, lit(null).cast("string"))
      .otherwise(
        when(col("language") === "rust",
          concat(lit("fn f(data: Vec<String>, n: i32) -> Result<Widget"),
            col("doc_id") % 5, lit(", Error>")))
          .when(col("language") === "python",
            concat(lit("def f(self, data: dict, client: HttpClient"),
              col("doc_id") % 5, lit(") -> Response")))
          .when(col("language") === "typescript",
            concat(lit("function f(url: string, opts: RequestOpts"),
              col("doc_id") % 5, lit("): Promise<Response>")))
          .otherwise(
            concat(lit("func F(ctx Context, n int32) (Widget"),
              col("doc_id") % 5, lit(", error)"))))
    val code = base.select(col("tenant_id"), col("doc_id"), col("file_path"),
      col("language"), chunkType.as("chunk_type"), symbolName.as("symbol_name"),
      parent.as("parent_symbol"), calls.as("calls"), signature.as("signature"),
      lit(null).cast("string").as("content"))

    val preambleContent =
      when(col("language") === "rust", concat(
        lit("use std::collections::HashMap;\nuse crate::graph::{GraphNode, GraphEdge};\nuse super::*;\nuse serde;\nuse pkg::Sym"),
        col("doc_id") % 20, lit(";\n// not an import")))
        .when(col("language") === "python", concat(
          lit("import numpy as np\nfrom typing import Dict, List, Optional\nfrom pathlib import Path\nimport os, sys\nimport mod"),
          col("doc_id") % 20, lit("\nx = 1")))
        .when(col("language") === "typescript", concat(
          lit("import { Component, useState as state } from 'react';\nimport React from 'react';\nimport * as path from 'path';\nimport { Sym"),
          col("doc_id") % 20, lit(" } from './m';\nconst x = 1;")))
        .otherwise(concat(
          lit("import (\n\"fmt\"\n\"encoding/json\"\nalias \"some/package\"\n\"pkg/sym"),
          col("doc_id") % 20, lit("\"\n)")))
    val pre = base.filter(col("doc_id") % 3 === 0)
      .select(col("tenant_id"), col("doc_id"), col("file_path"),
        col("language"), lit("preamble").as("chunk_type"),
        lit("").as("symbol_name"), lit("").as("parent_symbol"),
        lit("").as("calls"), lit(null).cast("string").as("signature"),
        preambleContent.as("content"))

    code.unionByName(pre)
  }

  /** graph_extract query: the DISTINCT edge set extracted from the corpus
    * chunk axis. */
  def graphExtract(spark: SparkSession, dir: String): DataFrame =
    extractEdgesOf(chunkAxis(spark, dir))
      .orderBy(col("tenant_id"), col("file_path"), col("edge_type"),
        col("src_symbol"), col("dst_symbol"), col("src_node_id"), col("dst_node_id"))

  /** import_edges query: the per-line parser view over the preamble axis —
    * (tenant, file, language, lineno, ord, symbol) with 1-based positions,
    * symbols filtered to the ≥2-char gate BEFORE ordinal assignment. */
  def importEdges(spark: SparkSession, dir: String): DataFrame = {
    val pre = chunkAxis(spark, dir)
      .filter(col("chunk_type") === "preamble")
      .select(col("tenant_id"), col("doc_id"), col("file_path"), col("language"),
        posexplode(split(col("content"), "\n", -1)).as(Seq("ln0", "line")))
    pre.select(col("tenant_id"), col("doc_id"), col("file_path"), col("language"),
        (col("ln0") + 1).cast("int").as("lineno"),
        posexplode(importSymbols(col("line"), col("language"))).as(Seq("ord0", "symbol")))
      .select(col("tenant_id"), col("doc_id"), col("file_path"), col("language"),
        col("lineno"), (col("ord0") + 1).cast("int").as("ord"), col("symbol"))
      .orderBy(col("tenant_id"), col("doc_id"), col("lineno"), col("ord"))
  }
}
