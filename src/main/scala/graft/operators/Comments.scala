package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** CodeComment extraction + comment EXPLAINS edges
  * (narrative/comments.rs): contiguous single-line-comment runs of >= 3
  * lines become CodeComment nodes; when a function signature within the
  * next 5 non-blank non-comment lines resolves to exactly one real code
  * node (via the shared symbol resolution of [[Explains]]), the block
  * gains an EXPLAINS edge. Unknown/ambiguous symbols are dropped, never
  * stubbed (comments.rs:341-356).
  *
  * Relational shape: comment-run detection is a gaps-and-islands window
  * over the exploded line axis; the signature search joins each block
  * to AT MOST five candidate lines by exploding
  * `sequence(first_candidate_seq, first_candidate_seq + 4)` into
  * (doc, seq) equi-join keys — shuffle proportional to 5 x blocks, never
  * lines². Symbol extraction is one codegen'd CASE chain per candidate
  * line. The resolution join is broadcast (tenant symbol axis).
  */
object Comments {

  /** Whitespace-true trim (Rust `str::trim`; Spark `trim()` strips only
    * 0x20 — tab-indented comment lines need the regexp form). */
  private def wsTrim(c: Column): Column =
    regexp_replace(c, "^\\s+|\\s+$", "")

  /** Single-line comment prefix per language family
    * (comments.rs:51 comment_prefix_for_language, case-folded); null for
    * unsupported languages (whole file skipped). */
  def commentPrefixFor(lang: Column): Column = {
    val l = lower(lang)
    when(l.isin("rust", "c", "cpp", "c++", "go", "java", "javascript",
      "typescript", "swift", "kotlin", "js", "ts", "jsx", "tsx"), "//")
      .when(l.isin("python", "ruby", "shell", "bash", "sh", "zsh", "yaml",
        "yml", "toml", "dockerfile", "makefile", "perl", "r"), "#")
      .when(l.isin("lua", "sql", "haskell", "hs"), "--")
      .otherwise(lit(null))
  }

  /** Keywords never treated as function names (comments.rs:198
    * is_keyword, verbatim — a public rule table). */
  val Keywords: Seq[String] = Seq(
    "if", "else", "for", "while", "return", "match", "let", "var", "val",
    "const", "static", "class", "struct", "enum", "trait", "impl", "pub",
    "super", "self", "new", "void", "int", "bool", "true", "false",
    "import", "export", "async", "await", "type", "interface")

  /** The identifier run at the start of `rest` (comments.rs:174
    * ident_before_paren): leading [A-Za-z0-9_]+ or null. The reference
    * deliberately does NOT validate identifier shape here (digits-first
    * names pass), unlike the C heuristic below. */
  private def identBeforeParen(rest: Column): Column = {
    val id = regexp_extract(rest, "^([A-Za-z0-9_]+)", 1)
    when(id =!= "", id)
  }

  /** Function-name extraction from one (whitespace-trimmed) source line
    * (comments.rs:130 extract_symbol_name). Mirrors the reference's
    * return-early structure: a line CONTAINING `fn `/`func `/`fun `
    * commits to that branch even when no identifier follows (the later
    * def/function/C patterns are not consulted), which is why each
    * keyword arm maps to one `when` whose value may be null.
    */
  def extractSymbolName(t: Column): Column = {
    def kwArm(kw: String): (Column, Column) = {
      val pos = instr(t, kw)
      (pos > 0, identBeforeParen(t.substr(pos + kw.length, length(t))))
    }
    val (fnHit, fnId) = kwArm("fn ")
    val (funcHit, funcId) = kwArm("func ")
    val (funHit, funId) = kwArm("fun ")
    // C/C++/Java heuristic: the last space-separated word before `(`
    // must look like an identifier and not be a keyword (comments.rs:160)
    val parenPos = instr(t, "(")
    val beforeParen = wsTrim(t.substr(lit(1), parenPos - 1))
    val cCandidate = substring_index(beforeParen, " ", -1)
    val cValid = parenPos > 0 && beforeParen.contains(" ") &&
      cCandidate.rlike("^[A-Za-z_][A-Za-z0-9_]*$") &&
      !cCandidate.isin(Keywords: _*)
    when(fnHit, fnId)
      .when(funcHit, funcId)
      .when(funHit, funId)
      .when(t.startsWith("def "), identBeforeParen(t.substr(lit(5), length(t))))
      .when(t.startsWith("async def "), identBeforeParen(t.substr(lit(11), length(t))))
      .when(t.startsWith("function "), identBeforeParen(t.substr(lit(10), length(t))))
      .when(cValid, cCandidate)
  }

  /** CodeComment blocks + their EXPLAINS resolution over a (tenant_id,
    * doc_id, file_path, content, language) frame and a (tenant_id,
    * symbol_name, node_id) symbol frame. One row per block of >=
    * `minCommentLines` contiguous comment lines: 1-based inclusive line
    * span, prefix-stripped text, and — when a signature within
    * `proximityLines` candidate lines resolves uniquely — the symbol and
    * its real node id (null otherwise).
    */
  def commentsOf(docs: DataFrame, symbols: DataFrame,
                 minCommentLines: Int = 3, proximityLines: Int = 5,
                 minSymbolLength: Int = 4): DataFrame = {
    val supported = docs
      .withColumn("prefix", commentPrefixFor(col("language")))
      .filter(col("prefix").isNotNull)
    val lines = supported
      .select(col("tenant_id"), col("doc_id"), col("file_path"), col("prefix"),
        posexplode(split(col("content"), "\n")))
      .withColumn("lineno", col("pos") + 1)
      .withColumn("t", wsTrim(col("col")))
      .withColumn("is_comment", col("t").startsWith(col("prefix")))
      .drop("pos", "col")

    // gaps-and-islands: consecutive comment linenos share (lineno - rank)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("lineno"))
    val after = col("t").substr(length(col("prefix")) + 1, length(col("t")))
    val stripped = when(after.startsWith(" "), after.substr(lit(2), length(after)))
      .otherwise(after) // strip_comment_prefix (comments.rs:69)
    val blocks = lines.filter(col("is_comment"))
      .withColumn("grp", col("lineno") - row_number().over(wDoc))
      .withColumn("stripped", stripped)
      .groupBy(col("tenant_id"), col("doc_id"), col("file_path"), col("grp"))
      .agg(min(col("lineno")).as("start_line"), max(col("lineno")).as("end_line"),
        count(lit(1)).as("n_lines"),
        array_join(transform(array_sort(collect_list(struct(col("lineno"), col("stripped")))),
          p => p.getField("stripped")), "\n").as("text"))
      .filter(col("n_lines") >= minCommentLines)
      .withColumn("first_line", substring_index(col("text"), "\n", 1))
      .drop("grp")

    // candidate lines for the signature search: non-blank, non-comment,
    // numbered per doc (comments.rs:237 find_nearby_symbol skips blank
    // and comment lines without consuming proximity budget)
    val cands = lines.filter(col("t") =!= "" && !col("is_comment"))
      .withColumn("seq", row_number().over(wDoc))
      .withColumn("symbol", extractSymbolName(col("t")))
      .select(col("doc_id"), col("lineno"), col("seq"), col("symbol"))

    // first candidate seq after each block end, via one merged window —
    // then explode exactly `proximityLines` (doc, seq) keys per block
    val merged = blocks.select(col("doc_id"), col("end_line").as("lineno"),
      col("start_line"), lit(null).cast("int").as("seq"))
      .unionByName(cands.select(col("doc_id"), col("lineno"),
        lit(null).cast("long").as("start_line"), col("seq")))
    val wAfter = Window.partitionBy(col("doc_id"))
      .orderBy(col("lineno"), col("seq").asc_nulls_first)
      .rowsBetween(1, Window.unboundedFollowing)
    val blockF = merged
      .withColumn("f", first(col("seq"), ignoreNulls = true).over(wAfter))
      .filter(col("start_line").isNotNull && col("f").isNotNull)
      .select(col("doc_id"), col("start_line"),
        explode(sequence(col("f"), col("f") + (proximityLines - 1))).as("seq"))

    // first symbol-bearing candidate within the proximity window
    val wBlock = Window.partitionBy(col("doc_id"), col("start_line")).orderBy(col("seq"))
    val found = blockF
      .join(cands.select(col("doc_id"), col("seq"), col("symbol")), Seq("doc_id", "seq"))
      .filter(col("symbol").isNotNull)
      .withColumn("rk", row_number().over(wBlock))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("start_line"), col("symbol"))

    val resolution = Explains.resolutionOf(symbols, minSymbolLength)
      .filter(col("n_nodes") === 1)
      .withColumnRenamed("symbol_name", "symbol")
      .drop("n_nodes")
    val resolved = found
      .join(blocks.select(col("tenant_id"), col("doc_id"), col("start_line")),
        Seq("doc_id", "start_line"))
      .join(broadcast(resolution), Seq("tenant_id", "symbol"))
      .select(col("doc_id"), col("start_line"), col("symbol"), col("node_id"))

    blocks.join(resolved, Seq("doc_id", "start_line"), "left")
      .select(col("tenant_id"), col("doc_id"), col("file_path"),
        col("start_line"), col("end_line"), col("n_lines"),
        col("first_line"), col("text"), col("symbol"), col("node_id"))
  }

  /** code_comments query: deterministic code-shaped scaffolding around
    * the corpus prose — per doc one language family (rust/python/lua/
    * java/unsupported), a content variant exercising each gate
    * (immediate signature, under-threshold run, signature beyond the
    * proximity budget, blank+comment skipping, non-signature candidate
    * first, trailing block at EOF), and a signature name that resolves /
    * is ambiguous / is unknown by doc arithmetic.
    */
  def codeComments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lang = when(col("doc_id") % 5 === 0, "rust")
      .when(col("doc_id") % 5 === 1, "python")
      .when(col("doc_id") % 5 === 2, "lua")
      .when(col("doc_id") % 5 === 3, "java")
      .otherwise("text")
    val p = when(col("doc_id") % 5 === 0, "//")
      .when(col("doc_id") % 5 === 1, "#")
      .when(col("doc_id") % 5 === 2, "--")
      .otherwise("//")
    val name = when(col("doc_id") % 4 === 2, lit("proc_amb"))
      .when(col("doc_id") % 4 === 3, lit("proc_unknown"))
      .otherwise(concat(lit("proc_a_"), (col("doc_id") % 3).cast("string")))
    val sig = when(col("doc_id") % 5 === 0, concat(lit("pub fn "), name, lit("(x: i32) -> bool {")))
      .when(col("doc_id") % 5 === 1,
        when(col("doc_id") % 2 === 0, concat(lit("async def "), name, lit("():")))
          .otherwise(concat(lit("def "), name, lit("(x):"))))
      .when(col("doc_id") % 5 === 2, concat(lit("function "), name, lit("()")))
      .otherwise(concat(lit("static int "), name, lit("(int x) {")))
    val w = substring(col("text"), 1, 24)
    val nl = lit("\n")
    val content = when(col("doc_id") % 6 === 0, concat(
      p, lit(" intro "), w, nl, p, lit(" middle line"), nl, p, lit(" end of block"), nl,
      sig, nl, lit("x = 1;")))
      .when(col("doc_id") % 6 === 1, concat(
        p, lit(" short "), w, nl, p, lit(" two lines"), nl, sig))
      .when(col("doc_id") % 6 === 2, concat(
        p, lit(" far "), w, nl, p, lit(" comment b"), nl, p, lit(" comment c"), nl,
        lit("a = 1;"), nl, lit("b = 2;"), nl, lit("c = 3;"), nl, lit("d = 4;"), nl,
        lit("e = 5;"), nl, sig))
      .when(col("doc_id") % 6 === 3, concat(
        p, lit(" skip "), w, nl, p, lit(" over blanks"), nl, p, lit(" and comments"), nl,
        nl, p, lit(" stray note"), nl, p, lit(" another"), nl, nl, sig))
      .when(col("doc_id") % 6 === 4, concat(
        p, lit(" second "), w, nl, p, lit(" candidate line"), nl, p, lit(" wins"), nl,
        lit("notasig = value"), nl, sig))
      .otherwise(concat(
        lit("setup = true"), nl, p, lit(" trailing "), w, nl, p, lit(" block at"), nl,
        p, lit(" file end")))
    val docs = Tables.documents(spark, dir).select(
      col("source").as("tenant_id"), col("doc_id"),
      concat(col("source"), lit("/src"), col("doc_id")).as("file_path"),
      content.as("content"), lang.as("language"))
    val symDefs = Seq(
      ("proc_a_0", 0), ("proc_a_1", 0), ("proc_a_2", 0),
      ("proc_amb", 0), ("proc_amb", 1)).toDF("symbol_name", "fidx")
    val tenants = Tables.documents(spark, dir)
      .select(col("source").as("tenant_id")).distinct()
    val symbols = tenants.crossJoin(broadcast(symDefs))
      .select(col("tenant_id"), col("symbol_name"),
        concat(lit("node:"), col("tenant_id"), lit("/f"), col("fidx"),
          lit(".rs:"), col("symbol_name")).as("node_id"))
    commentsOf(docs, symbols)
      .select(col("tenant_id"), col("doc_id"), col("start_line"), col("end_line"),
        col("n_lines"), col("first_line"), col("text"),
        coalesce(col("symbol"), lit("")).as("symbol"),
        coalesce(col("node_id"), lit("")).as("node_id"))
      .orderBy(col("doc_id"), col("start_line"))
  }
}
