package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** File-type classification — the ingest router every stored file
  * passes through (file_classification/classify.rs:33
  * `classify_file_type`, test_detection.rs:18 `is_test_file`, and the
  * unified rule tables in common/src/content_classification.yaml /
  * classification.rs).
  *
  * Priority order (classify.rs): (1) configuration dotfiles by exact
  * filename; (2) extension lookup — with `.json` context-routed to
  * config when the path carries a config indicator, else data; (3)
  * compound tarball suffixes → build; (4) `other`. Test detection is
  * independent of file_type: a test file must have a CODE extension
  * (test_data.txt is NOT a test) and match a filename pattern or sit
  * under a test directory.
  *
  * Relational shape: the extension table is a ~170-row BROADCAST join
  * on the extracted extension key; every other rule is a codegen'd
  * projection over the path/filename — one map-side pass, no shuffle
  * at any corpus size.
  */
object FileClassification {

  /** (extension, language, file_type, document_type) —
    * content_classification.yaml mirrored verbatim (compound `d.ts`
    * family included as first-class keys, as classification.rs does).
    */
  val extensionTable: Seq[(String, Option[String], String, Option[String])] = {
    def code(lang: String, exts: String*) = exts.map(e => (e, Some(lang), "code", None))
    val codes =
      code("python", "py", "pyw", "pyx", "pyi") ++ code("rust", "rs") ++
      code("javascript", "js", "mjs", "cjs") ++
      code("typescript", "jsx", "ts", "tsx", "mts", "cts", "d.ts", "d.mts", "d.cts") ++
      code("go", "go") ++ code("java", "java") ++ code("kotlin", "kt", "kts") ++
      code("scala", "scala") ++ code("c", "c", "h") ++
      code("cpp", "cpp", "cc", "cxx", "hpp", "hxx") ++ code("csharp", "cs") ++
      code("fsharp", "fs", "fsx", "fsi") ++ code("vb", "vb") ++
      code("ruby", "rb", "erb") ++ code("php", "php", "phtml") ++
      code("swift", "swift") ++ code("objc", "m", "mm") ++
      code("shell", "sh", "bash", "zsh", "fish") ++
      code("powershell", "ps1", "psm1", "psd1") ++ code("sql", "sql", "ddl", "dml") ++
      code("r", "r") ++ code("julia", "jl") ++ code("haskell", "hs", "lhs") ++
      code("erlang", "erl", "hrl") ++ code("elixir", "ex", "exs") ++
      code("clojure", "clj", "cljs", "cljc") ++ code("ocaml", "ml", "mli") ++
      code("lua", "lua") ++ code("d", "d") ++ code("vim", "vim") ++
      code("elisp", "el") ++ code("zig", "zig") ++ code("nim", "nim") ++
      code("dart", "dart") ++ code("perl", "pl", "pm") ++ code("protobuf", "proto") ++
      code("graphql", "graphql", "gql") ++ code("nix", "nix") ++ code("lean", "lean") ++
      code("v", "v") ++ code("odin", "odin") ++ code("fortran", "f90", "f95") ++
      code("pascal", "pas") ++ code("cobol", "cob", "cbl") ++
      code("vue", "vue") ++ code("svelte", "svelte") ++ code("astro", "astro")
    val texts = Seq("txt" -> "text", "text" -> "text", "md" -> "markdown",
      "markdown" -> "markdown", "rst" -> "text", "rest" -> "text", "adoc" -> "text",
      "asciidoc" -> "text", "org" -> "text", "tex" -> "text", "latex" -> "text")
      .map { case (e, dt) => (e, None, "text", Some(dt)) }
    val docs = Seq("pdf", "epub", "mobi", "chm", "docx", "doc", "odt", "rtf", "pages")
      .map(e => (e, None, "docs", Some(e)))
    val web = Seq("html" -> "html", "htm" -> "html", "xhtml" -> "html",
      "css" -> "css", "scss" -> "css", "sass" -> "css", "less" -> "css",
      "xml" -> "xml", "xsl" -> "xml", "xslt" -> "xml", "svg" -> "xml")
      .map { case (e, l) => (e, Some(l), "web", None) }
    val slides = Seq("pptx", "ppt", "key", "odp").map(e => (e, None, "slides", Some(e)))
    val config =
      Seq("yaml" -> "yaml", "yml" -> "yaml", "json" -> "json", "jsonc" -> "json",
        "json5" -> "json", "toml" -> "toml", "ini" -> "ini", "conf" -> "ini",
        "cfg" -> "ini", "config" -> "ini", "env" -> "env")
        .map { case (e, l) => (e, Some(l), "config", None) } ++
      Seq("properties", "plist", "editorconfig", "gitconfig", "gitignore",
        "gitattributes").map(e => (e, None, "config", None))
    val data =
      Seq("csv" -> "csv", "tsv" -> "csv", "xlsx" -> "xlsx", "xls" -> "xls",
        "ods" -> "ods", "numbers" -> "numbers", "ipynb" -> "jupyter")
        .map { case (e, dt) => (e, None, "data", Some(dt)) } ++
      Seq("parquet", "jsonl", "ndjson", "arrow", "feather", "hdf5", "h5", "db",
        "sqlite", "sqlite3", "pkl", "pickle", "npy", "npz", "mat", "rds",
        "rdata").map(e => (e, None, "data", None))
    val build =
      Seq("whl", "zip", "jar", "war", "ear", "so", "dylib", "dll", "a", "lib",
        "o", "obj", "exe", "app", "deb", "rpm", "dmg", "iso", "mk", "sbt",
        "gradle", "bat", "cmd", "awk", "sed").map(e => (e, None, "build", None)) ++
      Seq("dockerfile" -> "dockerfile", "makefile" -> "makefile", "cmake" -> "cmake")
        .map { case (e, l) => (e, Some(l), "build", None) }
    codes ++ texts ++ docs ++ web ++ slides ++ config ++ data ++ build
  }

  /** Configuration dotfiles without extensions (YAML config_filenames). */
  val configFilenames: Seq[String] = Seq(".env", ".env.local", ".env.example",
    ".editorconfig", ".gitconfig", ".gitignore", ".gitattributes", ".npmrc",
    ".dockerignore")

  /** Path fragments that route a `.json` to config (config_path_indicators). */
  val configPathIndicators: Seq[String] =
    Seq("/config/", "/conf/", "/settings/", "/.github/", "/.vscode/", "/etc/")

  /** Test directory names (YAML test_directories). */
  val testDirectories: Seq[String] = Seq("tests", "test", "__tests__", "__test__",
    "spec", "specs", "__spec__", "__specs__", "integration", "e2e", "unit",
    "functional", "acceptance")

  /** Compound tarball suffixes → build (YAML tarball_suffixes). */
  val tarballSuffixes: Seq[String] =
    Seq(".tar.gz", ".tar.bz2", ".tar.xz", ".tgz", ".tbz2", ".txz")

  /** Lowercased filename from a path column. */
  def fileName(path: Column): Column = lower(element_at(split(path, "/"), -1))

  /** get_extension (classify.rs:75) in storage form (no leading dot):
    * the `.d.ts/.d.mts/.d.cts` compounds first, else the suffix past
    * the LAST dot — null when the filename has no dot or starts with
    * its only dot (Rust `Path::extension` semantics: `.env` → none,
    * `.env.local` → `local`, `archive.tar.gz` → `gz`).
    */
  def extensionOf(fname: Column): Column =
    when(fname.endsWith(".d.ts"), "d.ts")
      .when(fname.endsWith(".d.mts"), "d.mts")
      .when(fname.endsWith(".d.cts"), "d.cts")
      .when(fname.rlike("^.+\\.[^.]+$"), regexp_extract(fname, "\\.([^.]+)$", 1))

  /** The generic classifier over a (doc_id, file_path) frame: adds
    * `extension` (storage form), `language`, `file_type`, `is_test`
    * (0/1). One broadcast extension-table join + projections.
    */
  def classifyOf(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val ruleTable = extensionTable
      .map { case (e, l, ft, dt) => (e, l.orNull, ft, dt.orNull) }
      .toDF("ext_key", "tbl_language", "tbl_file_type", "tbl_document_type")
    val path = col("file_path")
    val fname = fileName(path)
    val keyed = files
      .withColumn("fname", fname)
      .withColumn("extension", extensionOf(col("fname")))
      .join(broadcast(ruleTable), col("extension") === col("ext_key"), "left")
    val lowerPath = lower(path)
    val isConfigName = col("fname").isInCollection(configFilenames)
    val isConfigPath = configPathIndicators.map(lowerPath.contains(_)).reduce(_ || _)
    val isTarball = tarballSuffixes.map(lowerPath.endsWith(_)).reduce(_ || _)
    val fileType = when(isConfigName, "config")
      .when(col("extension") === "json" && col("tbl_file_type").isNotNull,
        when(isConfigPath, "config").otherwise("data"))
      .when(col("tbl_file_type").isNotNull, col("tbl_file_type"))
      .when(isTarball, "build")
      .otherwise("other")
    // name_without_ext strips past the LAST dot (test_detection.rs:65);
    // a dotless filename passes through unchanged, `.env` empties.
    val nwe = regexp_replace(col("fname"), "\\.[^.]*$", "")
    // null-safe: a non-table extension (null lookup) must yield is_test
    // 0, not null, even under a test directory (null AND true = null)
    val isCode = col("tbl_file_type") <=> "code"
    val namePattern = col("fname").startsWith("test_") ||
      nwe.endsWith("_test") ||
      col("fname").contains(".test.") || col("fname").contains(".spec.") ||
      nwe.endsWith(".test") || nwe.endsWith(".spec") ||
      nwe.isin("conftest", "test", "tests")
    val inTestDir = exists(split(lowerPath, "/"), s => s.isInCollection(testDirectories))
    keyed
      .withColumn("file_type", fileType)
      .withColumn("is_test", (isCode && (namePattern || inTestDir)).cast("int"))
      .select(col("doc_id"), col("file_path"), col("extension"),
        col("tbl_language").as("language"), col("file_type"), col("is_test"))
  }

  /** The synthetic path corpus shared by the file_classify and
    * metadata_enrich queries: the corpus has no path column, so each
    * doc gets a deterministic `/proj/<source>/<dir>/<name>` spanning
    * the router's branches — code/text/docs/web/slides/config/data/
    * build extensions, a compound `.d.ts`, a config dotfile, a
    * no-extension file, a tarball, `test_`/`.test.` names, test and
    * config directories. 17 names × 5 dirs are coprime cycles, so
    * every combination occurs.
    */
  /** The path expression itself (over `doc_id` + `source` columns) so
    * queries needing extra document columns derive the path on the SAME
    * scan instead of self-joining documents. */
  def syntheticPathCol: Column = {
    val names = Seq("main.py", "lib.rs", "util.ts", "types.d.ts", "README.md",
      "guide.pdf", "index.html", "deck.pptx", "app.yaml", "data.json",
      "table.csv", "dist.whl", "bundle.tar.gz", ".gitignore", "LICENSE",
      "test_core.py", "app.test.ts")
    val dirs = Seq("src", "tests", "lib", "config", "e2e")
    val nameCol = element_at(
      array(names.map(lit): _*), (pmod(col("doc_id"), lit(17)) + 1).cast("int"))
    val dirCol = element_at(
      array(dirs.map(lit): _*), (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
    concat(lit("/proj/"), col("source"), lit("/"), dirCol, lit("/"), nameCol)
  }

  def syntheticFiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), syntheticPathCol.as("file_path"))

  /** file_classify query: the ingest router over the synthetic path
    * corpus. */
  def fileClassify(spark: SparkSession, dir: String): DataFrame =
    classifyOf(syntheticFiles(spark, dir)).orderBy(col("doc_id"))

  // ── Content-based language detection (patterns/comprehensive.rs) ──

  /** Shebang → language signatures (assets/internal_configuration.yaml
    * content_signatures.shebangs), in a FIXED alphabetical order — the
    * reference iterates a HashMap (order nondeterministic), but its
    * four entries are mutually exclusive on any single line, so the
    * fixed order is observationally identical. */
  val shebangSignatures: Seq[(String, String)] = Seq(
    "#!/bin/bash" -> "bash",
    "#!/bin/sh" -> "sh",
    "#!/usr/bin/env node" -> "javascript",
    "#!/usr/bin/env python" -> "python")

  /** Keyword → language signatures (content_signatures.keyword_patterns). */
  val keywordSignatures: Seq[(String, Seq[String])] = Seq(
    "javascript" -> Seq("function ", "const ", "let ", "var "),
    "python" -> Seq("def ", "class ", "import "),
    "rust" -> Seq("fn ", "struct ", "impl ", "trait "))

  /** detect_language_from_shebang (comprehensive.rs:231): the first
    * `#!` line among the first three that CONTAINS a signature. */
  def shebangLanguage(content: Column): Column = {
    def ofLine(l: Column): Column = when(l.startsWith("#!"),
      shebangSignatures.foldLeft(lit(null).cast("string")) { case (acc, (sig, lang)) =>
        coalesce(acc, when(l.contains(sig), lang))
      })
    val lines = split(content, "\n")
    // try_element_at: a one-line document has no lines 2-3 (ANSI mode
    // throws on out-of-bounds element_at)
    coalesce((1 to 3).map(i => ofLine(try_element_at(lines, lit(i)))): _*)
  }

  /** detect_language_from_keywords (comprehensive.rs:245): one point
    * per contained keyword, highest total wins; zero scores yield null.
    * Ties break alphabetically (the reference's HashMap max_by_key tie
    * order is nondeterministic — a documented determinization). */
  def keywordLanguage(content: Column): Column = {
    val scores = keywordSignatures.map { case (lang, kws) =>
      lang -> kws.map(k => when(content.contains(k), 1).otherwise(0)).reduce(_ + _)
    }
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, s)) =>
      coalesce(acc, when(s === maxScore, lang))
    }
    when(maxScore > 0, chain)
  }

  /** lang_detect query: content-based detection over the corpus with a
    * deterministic shebang/code-snippet prologue exercising all four
    * shebangs, the keyword fallback on a synthetic snippet, and plain
    * prose (whatever keywords English text happens to contain —
    * deterministic either way).
    */
  def langDetect(spark: SparkSession, dir: String): DataFrame = {
    val sel = pmod(col("doc_id"), lit(6))
    val content = when(sel === 0, concat(lit("#!/usr/bin/env python3\n"), col("text")))
      .when(sel === 1, concat(lit("#!/bin/bash\nset -e\n"), col("text")))
      .when(sel === 2, concat(lit("#!/usr/bin/env node\n"), col("text")))
      .when(sel === 3, concat(lit("#!/bin/sh\n"), col("text")))
      .when(sel === 4, lit("fn main() { }\nstruct Point;\nimpl Point { }\n"))
      .otherwise(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), content.as("content"))
      .select(col("doc_id"),
        shebangLanguage(col("content")).as("shebang_lang"),
        keywordLanguage(col("content")).as("keyword_lang"))
      .withColumn("language", coalesce(col("shebang_lang"), col("keyword_lang")))
      .orderBy(col("doc_id"))
  }
}
