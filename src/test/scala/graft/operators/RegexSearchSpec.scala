package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.RegexSearch.{RegexLiterals, buildFts5Query, extractLiterals}

/** Literal-prefilter regex search parity with the reference's own unit
  * vectors (text_search/regex_parser/mod.rs tests, cited per case),
  * plus prefilter==bare-regex equivalence over the corpus.
  */
class RegexSearchSpec extends SparkSpec {

  // mod.rs test_extract_literals_basic
  test("regex literals: mandatory run before a metachar") {
    val l = extractLiterals("async.*fn")
    assert(l.mandatory == Vector("async") && l.alternations.isEmpty)
  }

  // mod.rs test_extract_literals_multiple_mandatory
  test("regex literals: escaped metachar classes end the run") {
    val l = extractLiterals("pub fn \\w+\\(\\)")
    assert(l.mandatory == Vector("pub fn ") && l.alternations.isEmpty)
  }

  // mod.rs test_extract_literals_escaped_chars
  test("regex literals: escaped literals join the run") {
    assert(extractLiterals("log\\.info\\(").mandatory == Vector("log.info("))
  }

  // mod.rs test_extract_literals_no_literals
  test("regex literals: patterns without usable literals extract nothing") {
    for (p <- Seq("^.$", "[a-z]+", "\\d+\\.\\d+")) {
      val l = extractLiterals(p)
      assert(l.mandatory.isEmpty && l.alternations.isEmpty, p)
    }
  }

  // mod.rs test_extract_literals_word_boundary
  test("regex literals: word boundaries strip cleanly") {
    assert(extractLiterals("\\bclass\\b").mandatory == Vector("class"))
  }

  // mod.rs test_extract_literals_top_level_alternation + three_way (#90)
  test("regex literals: top-level alternation collapses to ONE OR group") {
    val two = extractLiterals("async|await")
    assert(two.mandatory.isEmpty && two.alternations == Vector(Vector("async", "await")))
    val three = extractLiterals("async|await|yield")
    assert(three.alternations.size == 1 &&
      three.alternations.head.toSet == Set("async", "await", "yield"))
  }

  // mod.rs test_build_fts5_query_four_way_top_level_or (#90 reproduction)
  test("regex literals: four-way top-level branches OR, never AND") {
    val q = buildFts5Query(extractLiterals("comment_prefix|line_comment|\"//\"|DoubleSlash")).get
    assert(!q.contains(" AND ") && q.contains(" OR "))
    assert(q.contains("comment_prefix") && q.contains("line_comment") && q.contains("DoubleSlash"))
  }

  // mod.rs test_top_level_alternation_literalless_branch_drops_prefilter
  test("regex literals: a literal-less branch abandons the whole prefilter") {
    val l = extractLiterals("foobar|.*|bazqux")
    assert(l.mandatory.isEmpty && l.alternations.isEmpty)
    assert(buildFts5Query(l).isEmpty)
  }

  // mod.rs test_extract_literals_parenthesized_alternation
  test("regex literals: multiple mandatory runs") {
    assert(extractLiterals("impl \\w+ for \\w+").mandatory == Vector("impl ", " for "))
  }

  // mod.rs test_extract_literals_group_alternation
  test("regex literals: group branches combine with their affixes") {
    val l = extractLiterals("use (std|tokio|serde)::\\w+")
    assert(l.mandatory == Vector("use "))
    assert(l.alternations == Vector(Vector("use std::", "use tokio::", "use serde::")))
  }

  // mod.rs test_extract_literals_pub_decls
  test("regex literals: short pure-literal branches still combine") {
    val l = extractLiterals("pub (fn|struct|enum|trait|type) \\w+")
    assert(l.mandatory == Vector("pub "))
    assert(l.alternations.head.toSet ==
      Set("pub fn ", "pub struct ", "pub enum ", "pub trait ", "pub type "))
  }

  // mod.rs test_extract_literals_mixed
  test("regex literals: run resumes after a class") {
    assert(extractLiterals("fn\\s+main\\(").mandatory == Vector("main("))
  }

  // mod.rs test_extract_literals_escaped_backslash
  test("regex literals: escaped backslashes are literal") {
    assert(extractLiterals("C:\\\\Windows\\\\system32").mandatory ==
      Vector("C:\\Windows\\system32"))
  }

  // query_builder.rs vectors (build_fts5_query kept string-for-string so
  // these port verbatim)
  test("fts5 query builder vectors") {
    assert(buildFts5Query(RegexLiterals(Vector("impl ", " for "), Vector())) ==
      Some("\"impl \" AND \" for \""))
    assert(buildFts5Query(RegexLiterals(Vector("use "),
      Vector(Vector("std", "tokio", "serde")))) ==
      Some("\"use \" AND (\"std\" OR \"tokio\" OR \"serde\")"))
    assert(buildFts5Query(RegexLiterals(Vector(), Vector(Vector("async", "await")))) ==
      Some("(\"async\" OR \"await\")"))
    assert(buildFts5Query(RegexLiterals(Vector(), Vector())).isEmpty)
    assert(buildFts5Query(RegexLiterals(Vector("fn"), Vector())).isEmpty)
    assert(buildFts5Query(RegexLiterals(Vector("println"), Vector())) ==
      Some("\"println\""))
  }

  // mod.rs end-to-end vectors, incl. the mandatory-prefix subsumption
  test("fts5 query builder end-to-end: subsumed mandatory prefixes drop") {
    assert(buildFts5Query(extractLiterals("impl \\w+ for \\w+")) ==
      Some("\"impl \" AND \" for \""))
    assert(buildFts5Query(extractLiterals("use (std|tokio|serde)::\\w+")) ==
      Some("(\"use std::\" OR \"use tokio::\" OR \"use serde::\")"))
    assert(buildFts5Query(extractLiterals("pub (fn|struct|enum|trait|type) \\w+")) ==
      Some("(\"pub fn \" OR \"pub struct \" OR \"pub enum \" OR \"pub trait \" OR \"pub type \")"))
    val chains = extractLiterals("\\.(await|unwrap|expect)\\b")
    assert(chains.mandatory.isEmpty &&
      chains.alternations.head.toSet == Set(".await", ".unwrap", ".expect"))
    assert(buildFts5Query(chains) ==
      Some("(\".await\" OR \".unwrap\" OR \".expect\")"))
  }

  // Soundness end-to-end: the two-phase plan returns exactly what the
  // bare regex scan returns — with extractable literals, with a
  // subsumed-prefix pattern, and with no literals at all (full-scan
  // fallback).
  test("regex search equals the bare regex scan on the corpus") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    for (p <- Seq("(batch|stream) window", "quer(y|ies)", "hash", "^.{10}")) {
      val twoPhase = RegexSearch.regexSearchOf(docs, p)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      val bare = docs
        .select(col("doc_id"), regexp_count(col("text"), lit(p)).as("n"))
        .filter(col("n") > 0)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(twoPhase == bare, s"pattern $p")
      assert(bare.nonEmpty, s"pattern $p should match something in the corpus")
    }
  }
}
