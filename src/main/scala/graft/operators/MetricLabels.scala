package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bounded-cardinality metric labels (monitoring/labels/cardinality.rs,
  * PRD A1) — the transform that keeps `language` / `file_type` label
  * cardinality from exploding a metrics backend: a raw value maps to
  * itself only when it sits in the top-`cap` slice of the
  * prevalence-ordered bundled language list (default cap 40 over 45
  * bundled languages — the 5-language tail collapses), everything
  * else to the `other` sentinel, so at most cap+1 series ever exist
  * per label (AC3). `file_type` derives from the path's extension via
  * the registry map, matched case-INSENSITIVELY, then bounds through
  * the same language gate; missing/unknown extensions are `other`.
  *
  * This is the 100 TB-facing posture in miniature: the label axes are
  * config-sized broadcasts, the stream is map-only, and the output
  * key space is bounded by construction.
  */
object MetricLabels {

  val Other = "other"
  val DefaultCap = 40

  /** BUNDLED_LANGUAGES (cardinality.rs:38) — prevalence order. */
  val BundledLanguages: Seq[String] = Seq(
    "python", "javascript", "typescript", "java", "go", "rust", "c", "cpp",
    "c-sharp", "php", "ruby", "swift", "kotlin", "scala", "dart", "lua",
    "perl", "r", "julia", "html", "css", "json", "yaml", "toml", "markdown",
    "sql", "bash", "haskell", "elixir", "erlang", "clojure", "ocaml",
    "scheme", "lisp", "fortran", "pascal", "ada", "nix", "tsx", "vue",
    // --- tail (dropped at the default cap of 40) ---
    "vala", "latex", "elm", "odin", "zig")

  /** EXTENSION_TO_LANGUAGE (cardinality.rs:88) — the registry mirror. */
  val ExtensionToLanguage: Seq[(String, String)] = Seq(
    "adb" -> "ada", "ads" -> "ada", "sh" -> "bash", "bash" -> "bash",
    "zsh" -> "bash", "c" -> "c", "h" -> "c", "cs" -> "c-sharp",
    "clj" -> "clojure", "cljs" -> "clojure", "cljc" -> "clojure",
    "edn" -> "clojure", "cpp" -> "cpp", "cxx" -> "cpp", "cc" -> "cpp",
    "c++" -> "cpp", "hpp" -> "cpp", "hxx" -> "cpp", "hh" -> "cpp",
    "h++" -> "cpp", "ipp" -> "cpp", "tpp" -> "cpp", "css" -> "css",
    "dart" -> "dart", "ex" -> "elixir", "exs" -> "elixir", "elm" -> "elm",
    "erl" -> "erlang", "hrl" -> "erlang", "f" -> "fortran",
    "f90" -> "fortran", "f95" -> "fortran", "f03" -> "fortran",
    "f08" -> "fortran", "for" -> "fortran", "fpp" -> "fortran", "go" -> "go",
    "hs" -> "haskell", "lhs" -> "haskell", "html" -> "html", "htm" -> "html",
    "xhtml" -> "html", "java" -> "java", "js" -> "javascript",
    "mjs" -> "javascript", "cjs" -> "javascript", "jsx" -> "javascript",
    "json" -> "json", "jsonc" -> "json", "jl" -> "julia", "kt" -> "kotlin",
    "kts" -> "kotlin", "tex" -> "latex", "sty" -> "latex", "cls" -> "latex",
    "lisp" -> "lisp", "lsp" -> "lisp", "cl" -> "lisp", "fasl" -> "lisp",
    "lua" -> "lua", "md" -> "markdown", "markdown" -> "markdown",
    "mdx" -> "markdown", "nix" -> "nix", "ml" -> "ocaml", "mli" -> "ocaml",
    "mll" -> "ocaml", "mly" -> "ocaml", "odin" -> "odin", "pas" -> "pascal",
    "pp" -> "pascal", "dpr" -> "pascal", "dpk" -> "pascal",
    "lfm" -> "pascal", "pl" -> "perl", "pm" -> "perl", "pod" -> "perl",
    "t" -> "perl", "psgi" -> "perl", "php" -> "php", "phtml" -> "php",
    "php3" -> "php", "php4" -> "php", "php5" -> "php", "php7" -> "php",
    "phps" -> "php", "py" -> "python", "pyw" -> "python", "pyi" -> "python",
    "r" -> "r", "rmd" -> "r", "rnw" -> "r", "rb" -> "ruby", "rbw" -> "ruby",
    "rake" -> "ruby", "gemspec" -> "ruby", "rs" -> "rust",
    "scala" -> "scala", "sc" -> "scala", "sbt" -> "scala", "scm" -> "scheme",
    "ss" -> "scheme", "rkt" -> "scheme", "sql" -> "sql", "swift" -> "swift",
    "toml" -> "toml", "tsx" -> "tsx", "ts" -> "typescript",
    "mts" -> "typescript", "cts" -> "typescript", "vala" -> "vala",
    "vapi" -> "vala", "vue" -> "vue", "yaml" -> "yaml", "yml" -> "yaml",
    "zig" -> "zig")

  private def allowTable(spark: SparkSession, cap: Int): DataFrame = {
    import spark.implicits._
    BundledLanguages.zipWithIndex
      .toDF("lang", "prevalence")
      .filter(col("prevalence") < cap)
      .select(col("lang"))
  }

  private def extTable(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ExtensionToLanguage.toDF("ext_key", "ext_lang")
  }

  /** Plain Path::extension: text after the last dot of the basename;
    * NULL when there is none. */
  private def extOf(path: Column): Column = {
    val base = coalesce(try_element_at(filter(split(path, "/"),
      c => c =!= ""), lit(-1)), path)
    when(base.rlike("^.+\\.[^.]+$"),
      regexp_extract(base, "\\.([^.]+)$", 1))
  }

  /** §3 `*Of` form: per event, the bounded language and file_type
    * labels, then the per-label series counts (the Prometheus view —
    * bounded by construction at cap+1 per label). */
  def metricLabelsOf(events: DataFrame, cap: Int): DataFrame = {
    val spark = events.sparkSession
    val allow = allowTable(spark, cap)
    val exts = extTable(spark)
    val langBound = events
      .join(broadcast(allow), events("raw_language") === allow("lang"), "left")
      .withColumn("bounded_language",
        coalesce(col("lang"), lit(Other))).drop("lang")
    val withExt = langBound.withColumn("ext_lc", lower(extOf(col("path"))))
    val ftBound = withExt
      .join(broadcast(exts), col("ext_lc") === col("ext_key"), "left")
      .join(broadcast(allow.withColumnRenamed("lang", "ft_allow")),
        col("ext_lang") === col("ft_allow"), "left")
      .withColumn("bounded_file_type", coalesce(col("ft_allow"), lit(Other)))
      .drop("ext_key", "ext_lang", "ft_allow", "ext_lc")
    val rows = ftBound.select(lit("event").as("section"),
      col("event_id"), col("raw_language"), col("path"),
      col("bounded_language"), col("bounded_file_type"),
      lit(null).cast("long").as("n"))
    val series = ftBound
      .select(lit("language").as("label"), col("bounded_language").as("v"))
      .unionByName(ftBound.select(lit("file_type").as("label"),
        col("bounded_file_type").as("v")))
      .groupBy(col("label"), col("v")).agg(count(lit(1)).as("n"))
      .select(lit("series").as("section"), lit(null).cast("long").as("event_id"),
        col("label").as("raw_language"), col("v").as("path"),
        lit(null).cast("string").as("bounded_language"),
        lit(null).cast("string").as("bounded_file_type"), col("n"))
    rows.unionByName(series)
      .orderBy(col("section"), col("event_id"), col("raw_language"),
        col("path"))
  }

  /** The raw-label stream over the events axis: languages cycling
    * head-of-list, mid-list, TAIL (bounded away at the default cap),
    * junk, and empty; paths cycling known extensions (one uppercase —
    * the case-insensitive arm), a tail-language extension, unknown,
    * and extension-less. */
  def rawEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      element_at(array(lit("python"), lit("rust"), lit("c-sharp"),
        lit("zig"), lit("vala"), lit("cobol"), lit("")),
        (pmod(col("event_id"), lit(7)) + 1).cast("int")).as("raw_language"),
      element_at(array(
        lit("a/b/main.PY"), lit("src/app.rs"), lit("x/y.Ts"),
        lit("pkg/mod.zig"), lit("doc/readme.MD"), lit("data/file.xyz"),
        lit("Makefile"), lit("deep/path/q.sql")),
        (pmod(col("event_id"), lit(8)) + 1).cast("int")).as("path"))

  def metricLabels(spark: SparkSession, dir: String): DataFrame =
    metricLabelsOf(rawEvents(spark, dir), DefaultCap)
}
