package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Narrative section extraction + depth estimation — the narrative
  * graph layer's document input (narrative/sections.rs
  * `collect_markdown_headings` / `section_spans`, narrative/depth.rs
  * `estimate_depth`).
  *
  * Markdown sections are ATX-heading-delimited: a heading line matches
  * `^#{1,6}\s+(.+)$` with non-empty trimmed text, and its section runs
  * from the heading line to the line before the next heading (EOF for
  * the last). Depth classifies each section's coverage as reference /
  * rigorous / qualitative / introductory / intermediate from word and
  * char counts, code fences, equation markers, and the technical-word
  * density (underscores, `::`/`->`/`.` separators, ALL_CAPS >= 3,
  * camelCase transitions). The production caller
  * (strategies/processing/file/narrative_phase.rs:221) passes
  * heading_level 0 and has_subsections false, which collapses the
  * intermediate branch — mirrored here with the full cascade kept
  * parameterizable.
  *
  * Relational shape: one posexplode of the line axis, a lead window for
  * span ends keyed per doc, and codegen'd HOF aggregates for the depth
  * features — no join at all.
  */
object Narrative {

  /** is_technical_word (depth.rs:14). */
  def isTechnicalWord(w: Column): Column =
    w.contains("_") || w.contains("::") || w.contains("->") || w.contains(".") ||
      w.rlike("^[A-Z]{3,}$") || w.rlike("[a-z][A-Z]")

  /** technical_density (depth.rs:36) over a section text column. */
  def technicalDensity(text: Column): Column = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val tech = size(filter(words, w => isTechnicalWord(w)))
    when(size(words) > 0, tech.cast("double") / size(words)).otherwise(0.0)
  }

  /** estimate_depth (depth.rs:52): the full cascade; the corpus query
    * passes the production (heading_level = 0, has_subsections = false)
    * arguments. */
  def estimateDepth(text: Column, headingLevel: Column = lit(0),
                    hasSubsections: Column = lit(false)): Column = {
    val words = size(filter(split(text, "\\s+"), w => w =!= ""))
    val chars = length(text)
    val code = text.contains("```")
    val eq = text.contains("$") || text.contains("\\(")
    val tech = technicalDensity(text)
    when(words < 50 || headingLevel >= 5, "reference")
      .when(words > 2000 || (code && eq) || tech > 0.3, "rigorous")
      .when(chars < 200 && tech < 0.1, "qualitative")
      .when(words <= 500 || (headingLevel <= 2 && !hasSubsections), "introductory")
      .when(words <= 2000 && tech >= 0.15, "intermediate")
      .otherwise("introductory")
  }

  /** Section spans with their text over a (doc_id, content [, *]) frame:
    * one row per ATX heading with its 0-based index, trimmed heading
    * text, 1-indexed inclusive line span, and the span's joined text
    * (heading line included) — the `SectionSpan` axis the EXPLAINS
    * extractor consumes (narrative/sections.rs section_spans). Extra
    * input columns (tenant_id, file_path, ...) pass through.
    */
  def sectionSpansOf(docs: DataFrame): DataFrame = {
    val passThrough = docs.columns.filterNot(c => c == "content").map(col).toSeq
    val lines = docs.withColumn("ls", split(col("content"), "\n"))
      .select(passThrough :+ col("ls"): _*)
      .select(passThrough ++ Seq(col("ls"), posexplode(col("ls"))): _*)
      .withColumn("lineno", col("pos") + 1)
      .withColumn("heading", trim(regexp_extract(col("col"), "^#{1,6}\\s+(.+)$", 1)))
      .filter(col("col").rlike("^#{1,6}\\s+.+$") && col("heading") =!= "")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("lineno"))
    lines
      .withColumn("section_index", row_number().over(w) - 1)
      .withColumn("end_line",
        coalesce(lead(col("lineno"), 1).over(w) - 1, size(col("ls"))))
      .withColumn("section_text",
        array_join(slice(col("ls"), col("lineno"), col("end_line") - col("lineno") + 1), "\n"))
      .withColumn("start_line", col("lineno"))
      .drop("ls", "pos", "col", "lineno")
  }

  /** Plain-text section spans: blank-line-separated paragraphs
    * (narrative/sections.rs:186 collect_text_paragraphs — the
    * `FileKind::PlainText` half of the section extractor). A paragraph
    * is a maximal run of non-blank lines (blank = whitespace-only,
    * Rust `str::trim` semantics, so tabs count); its heading is the
    * TRIMMED first line, its span the 1-indexed first..last non-blank
    * lines. Gaps-and-islands over the exploded line axis, same shape
    * as the comment-run detection. Extra input columns pass through.
    */
  def textSectionSpansOf(docs: DataFrame): DataFrame = {
    val passThrough = docs.columns.filterNot(c => c == "content").map(col).toSeq
    val lines = docs.withColumn("ls", split(col("content"), "\n"))
      .select(passThrough ++ Seq(col("ls"), posexplode(col("ls"))): _*)
      .withColumn("lineno", col("pos") + 1)
      .withColumn("t", regexp_replace(col("col"), "^\\s+|\\s+$", ""))
      .filter(col("t") =!= "")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("lineno"))
    lines
      .withColumn("grp", col("lineno") - row_number().over(w))
      .groupBy(passThrough :+ col("grp"): _*)
      .agg(min(col("lineno")).as("start_line"), max(col("lineno")).as("end_line"),
        min_by(col("t"), col("lineno")).as("heading"),
        first(col("ls")).as("ls"))
      .withColumn("section_index",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("start_line"))) - 1)
      .withColumn("section_text",
        array_join(slice(col("ls"), col("start_line"),
          col("end_line") - col("start_line") + 1), "\n"))
      .drop("ls", "grp")
  }

  /** text_sections query: the corpus prose reshaped as plain text —
    * optional leading blank lines, a two-line paragraph, an indented
    * paragraph behind a whitespace-only (tab) separator, and a
    * trailing paragraph with no closing newline (absent for short
    * docs, so paragraph counts vary).
    */
  def textSections(spark: SparkSession, dir: String): DataFrame = {
    val content = concat(
      when(col("doc_id") % 4 === 1, "\n  \n").otherwise(""),
      substring(col("text"), 1, 60), lit("\n"),
      substring(col("text"), 61, 60), lit("\n\n"),
      lit("  "), substring(col("text"), 121, 40), lit("\n\t\n"),
      substring(col("text"), 161, 80))
    textSectionSpansOf(Tables.documents(spark, dir)
      .select(col("doc_id"), content.as("content")))
      .select(col("doc_id"), col("section_index"), col("heading"),
        col("start_line"), col("end_line"))
      .orderBy(col("doc_id"), col("section_index"))
  }

  /** Markdown sections over a (doc_id, content) frame: one row per
    * heading with its 0-based index, trimmed heading text, 1-indexed
    * inclusive line span, and the section's estimated depth (section
    * text = the span's lines joined, heading line included). */
  def sectionsOf(docs: DataFrame): DataFrame =
    sectionSpansOf(docs)
      .select(col("doc_id"), col("section_index"), col("heading"),
        col("start_line"), col("end_line"),
        estimateDepth(col("section_text")).as("depth"))

  /** doc_sections query: the corpus prose wrapped into a deterministic
    * three-section markdown shape — a short overview (reference), a
    * long prose body (introductory at typical lengths), and an appendix
    * carrying a code fence + equation markers plus enough prose to
    * clear the 50-word floor (rigorous). */
  /** The corpus prose wrapped into a deterministic three-section
    * markdown shape — a short overview, a longer prose body, and an
    * appendix carrying a code fence + equation markers plus repeated
    * prose (shared by doc_sections and the narrative edge queries so
    * their section axes agree). The corpus documents run ~50-560
    * chars, so the appendix repeats a slice to clear the 50-word
    * reference floor for typical docs.
    */
  def syntheticMarkdown(text: Column): Column = concat(
    lit("# Overview\n"), substring(text, 1, 80),
    lit("\n## Usage\n"), substring(text, 81, 400),
    lit("\n## Math Appendix\n```\ncode sample $x$\n```\n"),
    lit("The value $y$ is defined above. "),
    repeat(substring(text, 1, 150), 5))

  def docSections(spark: SparkSession, dir: String): DataFrame =
    sectionsOf(Tables.documents(spark, dir)
      .select(col("doc_id"), syntheticMarkdown(col("text")).as("content")))
      .orderBy(col("doc_id"), col("section_index"))
}
