package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Document title extraction — the reference's priority cascade
  * (title_extraction/mod.rs:28 `extract_title`): embedded metadata
  * title (placeholder-filtered) → format-routed content heuristics
  * (HTML <title>/og:title/<h1>, Markdown frontmatter/# heading,
  * first-prominent-line for plain text) → cleaned title-cased filename
  * fallback. Binary-format metadata probing (PDF Info, DOCX core.xml —
  * metadata.rs) needs codec I/O this container doesn't have; the
  * pre-extracted metadata title is an input column instead, exactly as
  * `extract_title` receives it from document_processor.
  *
  * Pure per-row column expressions — one projected scan, map-only at
  * any scale. The markdown heading scan is a per-row fold (the
  * reference stops at the first non-heading line, content.rs:77).
  */
object TitleExtraction {

  /** is_placeholder_title (mod.rs:89). */
  def isPlaceholder(t: Column): Column = {
    val tl = lower(t)
    tl.isin("untitled", "document", "presentation", "slide", "book",
      "new document", "noname") ||
      trim(t).rlike("(?i)^(microsoft\\s+word\\s*[-–—]\\s*|document|presentation|slide|book|untitled)\\s*\\d*$") ||
      tl.startsWith("microsoft word")
  }

  /** extract_markdown_title (content.rs:57): YAML frontmatter `title:`
    * first, else the first `# ` heading reached without crossing a
    * non-heading content line. */
  def markdownTitle(text: Column): Column = {
    val fm = when(text.startsWith("---"),
      regexp_extract(text, "(?s)^---(.*?)---", 1)).otherwise(lit(""))
    val fmTitle = regexp_replace(regexp_replace(
      trim(regexp_extract(fm, "(?m)^\\s*title:\\s*(.+?)\\s*$", 1)),
      "^[\"']+", ""), "[\"']+$", "")
    val heading = aggregate(split(text, "\n"),
      struct(lit(false).as("done"), lit("").as("t")),
      (acc, l0) => {
        val l = trim(l0)
        when(acc("done") || acc("t") =!= "", acc)
          .when(l.startsWith("# "),
            struct(acc("done").as("done"), trim(l.substr(lit(3), length(l))).as("t")))
          .when(l === "" || l === "---" || l.startsWith("#"), acc)
          .otherwise(struct(lit(true).as("done"), acc("t").as("t")))
      },
      acc => acc("t"))
    when(fmTitle =!= "", fmTitle).when(heading =!= "", heading)
  }

  /** extract_html_title (content.rs:25): <title> → og:title → stripped
    * first <h1>. */
  def htmlTitle(text: Column): Column = {
    val t = trim(regexp_extract(text, "(?is)<title[^>]*>(.*?)</title>", 1))
    val og = trim(regexp_extract(text,
      "(?i)<meta\\s+(?:property|name)=[\"']og:title[\"']\\s+content=[\"']([^\"']+)[\"']", 1))
    val h1 = trim(regexp_replace(
      regexp_extract(text, "(?is)<h1[^>]*>(.*?)</h1>", 1), "<[^>]+>", ""))
    when(t =!= "" && !isPlaceholder(t), t)
      .when(og =!= "" && !isPlaceholder(og), og)
      .when(h1 =!= "", h1)
  }

  /** extract_first_line_title (content.rs:100): first non-empty line,
    * ≤ 200 chars, no trailing sentence punctuation, carries an
    * uppercase letter — else nothing. */
  def firstLineTitle(text: Column): Column = {
    val fl = get(filter(transform(split(text, "\n"), l => trim(l)), l => l =!= ""), lit(0))
    when(fl.isNotNull && length(fl) <= 200 &&
      !fl.rlike("[.,;]$") && fl.rlike("\\p{Lu}"), fl)
  }

  /** title_from_filename (mod.rs:126): stem, `_`/`-` → spaces, each
    * word's first letter upper-cased (rest untouched — NOT initcap). */
  def filenameTitle(filePath: Column): Column = {
    val name = element_at(split(filePath, "/"), -1)
    val stem = when(name.contains("."),
      regexp_replace(name, "\\.[^.]*$", "")).otherwise(name)
    val cleaned = translate(stem, "_-", "  ")
    val titled = concat_ws(" ",
      transform(filter(split(cleaned, "\\s+"), w => w =!= ""),
        w => concat(upper(substring(w, 1, 1)), substring(w, 2, 100000))))
    when(titled =!= "", titled).otherwise(lit("Untitled"))
  }

  /** The cascade over a (doc_id, file_path, meta_title, text,
    * source_format) frame → (doc_id, title, title_source). */
  def titleExtractOf(docs: DataFrame): DataFrame = {
    val meta = trim(col("meta_title"))
    val metaOk = col("meta_title").isNotNull && meta =!= "" && !isPlaceholder(meta)
    val content = when(col("source_format").isin("html", "htm"), htmlTitle(col("text")))
      .when(col("source_format").isin("markdown", "md"), markdownTitle(col("text")))
      .otherwise(firstLineTitle(col("text")))
    docs
      .withColumn("title",
        when(metaOk, meta)
          .when(content.isNotNull && content =!= "", content)
          .otherwise(filenameTitle(col("file_path"))))
      .withColumn("title_source",
        when(metaOk, lit("metadata"))
          .when(content.isNotNull && content =!= "", lit("content"))
          .otherwise(lit("filename")))
      .select(col("doc_id"), col("title"), col("title_source"))
      .orderBy(col("doc_id"))
  }

  /** title_extract query: the corpus carries no embedded metadata and
    * its plain text is lowercase, so the cascade evaluates the
    * first-line heuristic per document and lands on the filename
    * fallback — the oracle re-evaluates the same conditions. */
  def titleExtract(spark: SparkSession, dir: String): DataFrame =
    titleExtractOf(Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit("/corpus/"), col("source"), lit("/doc"),
          col("doc_id").cast("string"), lit(".txt")).as("file_path"),
        lit(null).cast("string").as("meta_title"),
        col("text"),
        lit("txt").as("source_format")))
}
