package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Narrative EXPLAINS parity with the reference's own test vectors
  * (narrative/explains.rs:244-426 and symbol_index.rs:190-259, cited
  * per case). The reference passes explicit SectionSpans to the
  * extractor; the helper here mirrors that by materializing the span
  * slices as the section axis.
  */
class ExplainsSpec extends SparkSpec {
  import spark.implicits._

  /** Mirrors ExplainsExtractor::with_context(...).extract(t1, path,
    * content): returns (section_index, symbol, node_id, n_occ) rows.
    */
  private def edgesOf(path: String, content: String,
                      spans: Seq[(Int, Int)],
                      symbols: Seq[(String, String)],
                      minLen: Int = 4, maxPerSection: Int = 10,
                      maxInputKb: Int = 256): Seq[(Int, String, String, Long)] = {
    val docs = Seq(("t1", 1L, path, content))
      .toDF("tenant_id", "doc_id", "file_path", "content")
    val gated = Explains.narrativeDocs(docs, maxInputKb)
      .select("tenant_id", "doc_id").distinct()
    val lines = content.split("\n", -1)
    val sections: DataFrame = spans.zipWithIndex
      .map { case ((s, e), i) =>
        ("t1", 1L, i, lines.slice(s - 1, e).mkString("\n"))
      }
      .toDF("tenant_id", "doc_id", "section_index", "section_text")
      .join(gated, Seq("tenant_id", "doc_id"))
    val syms = symbols.map { case (n, id) => ("t1", n, id) }
      .toDF("tenant_id", "symbol_name", "node_id")
    Explains.explainsOf(sections, syms, minLen, maxPerSection)
      .orderBy("section_index", "rnk")
      .collect()
      .map(r => (r.getAs[Int]("section_index"), r.getAs[String]("symbol"),
        r.getAs[String]("node_id"), r.getAs[Long]("n_occ")))
      .toSeq
  }

  // explains.rs:245 no_context_extractor_emits_nothing — empty spans and
  // empty symbol set must emit nothing.
  test("explains: no-context (empty spans + empty automaton) emits nothing") {
    val md = "# Auth\nThe validate_token validate_token function.\n"
    assert(edgesOf("auth.md", md, Seq.empty, Seq.empty).isEmpty)
  }

  // explains.rs:253 resolves_real_symbol_to_real_node_id
  test("explains: two occurrences of a unique symbol resolve to its real node id") {
    val md = "# Authentication\nThe validate_token function checks tokens.\nCall validate_token before access.\n"
    val edges = edgesOf("auth.md", md, Seq((1, 3)),
      Seq(("validate_token", "node:auth.rs:validate_token")))
    assert(edges == Seq((0, "validate_token", "node:auth.rs:validate_token", 2L)))
  }

  // explains.rs:273 ambiguous_symbol_drops_edge — two nodes share the name.
  test("explains: ambiguous symbol never produces an edge") {
    val md = "# Handlers\nThe request_handler is called twice.\nAlways invoke request_handler safely.\n"
    val edges = edgesOf("h.md", md, Seq((1, 3)),
      Seq(("request_handler", "a.rs:request_handler"),
        ("request_handler", "b.rs:request_handler")))
    assert(edges.isEmpty)
  }

  // explains.rs:294 single_occurrence_drops_edge
  test("explains: a single mention is below the >=2 occurrence gate") {
    val md = "# Config\nThe parse_config function matters.\n"
    assert(edgesOf("c.md", md, Seq((1, 2)),
      Seq(("parse_config", "c.rs:parse_config"))).isEmpty)
  }

  // explains.rs:307 unknown_symbol_no_edge
  test("explains: unknown symbols match nothing") {
    val md = "# X\ntotally_unknown_symbol totally_unknown_symbol here.\n"
    assert(edgesOf("x.md", md, Seq((1, 2)),
      Seq(("validate_token", "auth.rs:validate_token"))).isEmpty)
  }

  // explains.rs:317 edge_attaches_to_containing_section
  test("explains: edges attach to the containing section span") {
    val md = "# First\nparse_config parse_config here.\n# Second\nvalidate_token validate_token there.\n"
    val edges = edgesOf("doc.md", md, Seq((1, 2), (3, 4)),
      Seq(("parse_config", "c.rs:parse_config"),
        ("validate_token", "a.rs:validate_token")))
    assert(edges == Seq(
      (0, "parse_config", "c.rs:parse_config", 2L),
      (1, "validate_token", "a.rs:validate_token", 2L)))
  }

  // explains.rs:340 max_per_section_cap_enforced — 15 symbols x3 mentions,
  // default cap 10; ranking is count desc then name asc (explains.rs:179),
  // so exactly symbol_func_00..09 survive.
  test("explains: per-section cap keeps the top-10 by count desc, name asc") {
    val names = (0 until 15).map(i => f"symbol_func_$i%02d")
    val md = "# Many\n" + names.map(n => s"$n $n $n").mkString("\n") + "\n"
    val edges = edgesOf("many.md", md, Seq((1, 16)),
      names.map(n => (n, s"x.rs:$n")))
    assert(edges.size == 10)
    assert(edges.map(_._2) == names.take(10))
  }

  // explains.rs:362 min_length_filter_via_automaton — `io` is under the
  // 4-char automaton floor (symbol_index.rs:44) and never matches.
  test("explains: symbols under the min length never enter the automaton") {
    val md = "# IO\nio io io io\n"
    assert(edgesOf("io.md", md, Seq((1, 2)), Seq(("io", "io.rs:io"))).isEmpty)
  }

  // explains.rs:373 stop_word_dropped — `result` resolves but is stop-listed.
  test("explains: stop-listed symbols are dropped even when they resolve") {
    val md = "# R\nresult result result\n"
    assert(edgesOf("r.md", md, Seq((1, 2)), Seq(("result", "r.rs:result"))).isEmpty)
  }

  // explains.rs:384 non_narrative_file_empty
  test("explains: non-narrative extensions are skipped whole") {
    assert(edgesOf("code.rs", "validate_token validate_token",
      Seq((1, 1)), Seq(("validate_token", "a.rs:validate_token"))).isEmpty)
  }

  // explains.rs:393 input_size_cap_skips_large_files — 2 KB content over a
  // 1 KB cap.
  test("explains: files over the byte cap are skipped whole") {
    val sb = new StringBuilder("# Big\n")
    while (sb.length < 2048) sb.append("parse_config parse_config filler text line\n")
    val md = sb.toString
    val lineCount = md.split("\n", -1).length
    assert(edgesOf("big.md", md, Seq((1, lineCount)),
      Seq(("parse_config", "c.rs:parse_config")), maxInputKb = 1).isEmpty)
  }

  // symbol_index.rs:58 LeftmostLongest — `HttpServer` beats its `Http`
  // substring symbol at the same position, so `Http` can only match on
  // its own.
  test("explains: leftmost-longest suppression of substring symbols") {
    val md = "# S\nHttpServer HttpServer starts.\n"
    val both = Seq(("HttpServer", "n.rs:HttpServer"), ("Http", "h.rs:Http"))
    assert(edgesOf("s.md", md, Seq((1, 2)), both) ==
      Seq((0, "HttpServer", "n.rs:HttpServer", 2L)))
    // standalone occurrences of the shorter symbol still match
    val md2 = "# S\nHttp Http and HttpServer HttpServer here.\n"
    assert(edgesOf("s.md", md2, Seq((1, 2)), both) == Seq(
      (0, "Http", "h.rs:Http", 2L),
      (0, "HttpServer", "n.rs:HttpServer", 2L)))
  }

  // explains.rs:186 — ambiguous symbols are SKIPPED without consuming cap
  // budget: with cap 1, the most frequent (ambiguous) symbol drops and the
  // runner-up still emits.
  test("explains: ambiguous symbols do not consume the per-section cap") {
    val md = "# C\nambig_sym ambig_sym ambig_sym uniq_sym uniq_sym\n"
    val edges = edgesOf("c.md", md, Seq((1, 2)),
      Seq(("ambig_sym", "a.rs:ambig_sym"), ("ambig_sym", "b.rs:ambig_sym"),
        ("uniq_sym", "u.rs:uniq_sym")), maxPerSection = 1)
    assert(edges == Seq((0, "uniq_sym", "u.rs:uniq_sym", 2L)))
  }
}
