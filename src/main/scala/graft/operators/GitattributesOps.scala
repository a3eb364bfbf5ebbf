package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `.gitattributes` linguist overrides (daemon/core/src/patterns/
  * gitattributes.rs) — the parser, the fnmatch-style glob matcher, and
  * the last-match-wins file classification feeding language detection
  * and the vendored/generated/documentation skip gates.
  *
  * Parsing is driver-side (the file is config-sized project state,
  * exactly like the gitignore compiler in [[IgnoreRules]]); matching
  * compiles to codegen'd `rlike` columns over the corpus paths:
  *
  *  - `*` and `?` never cross `/` (the matcher's backtrack guard) →
  *    `[^/]*` / `[^/]`;
  *  - `**` consumes an optional following `/` and then tries EVERY
  *    suffix — it matches across ANY boundary, so double-star-slash-b
  *    also matches `ab`, not just `x/b` (gitattributes.rs:204
  *    glob_match_inner, quirk kept) → `.*`;
  *  - a pattern with no `/` (ignoring a trailing one) matches the
  *    FILENAME component only (:183);
  *  - rules apply in file order with last-match-wins (:138), language
  *    values lowercased at parse (:92), bare and `=true` attribute
  *    forms both accepted, lines without attributes skipped.
  */
object GitattributesOps {

  sealed trait Action { def value: String }
  final case class LanguageOverride(lang: String) extends Action {
    val value = s"language:$lang"
  }
  case object Vendored extends Action { val value = "skip:vendored" }
  case object Generated extends Action { val value = "skip:generated" }
  case object Documentation extends Action { val value = "skip:documentation" }

  final case class Rule(pattern: String, action: Action) {
    /** Filename-only when the pattern has no directory component. */
    val filenameOnly: Boolean = !pattern.stripSuffix("/").contains('/')
    val regex: String = globToRegex(pattern)
  }

  /** gitattributes fnmatch glob → anchored regex (semantics above). */
  def globToRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      if (pattern.startsWith("**", i)) {
        sb.append(".*")
        i += 2
        if (i < pattern.length && pattern.charAt(i) == '/') i += 1
      } else {
        pattern.charAt(i) match {
          case '*' => sb.append("[^/]*"); i += 1
          case '?' => sb.append("[^/]"); i += 1
          case c if "\\.^$+{}()|[]".indexOf(c) >= 0 =>
            sb.append("\\").append(c); i += 1
          case c => sb.append(c); i += 1
        }
      }
    }
    sb.append("$").toString
  }

  /** GitattributesOverrides::parse (gitattributes.rs:65). */
  def parse(content: String): Seq[Rule] =
    content.linesIterator.flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) Seq.empty
      else {
        val firstWs = line.indexWhere(_.isWhitespace)
        if (firstWs < 0) Seq.empty // pattern with no attributes
        else {
          val pattern = line.substring(0, firstWs)
          val attrs = line.substring(firstWs).trim.split("\\s+").toSeq
          attrs.flatMap {
            case a if a.startsWith("linguist-language=") =>
              Some(Rule(pattern,
                LanguageOverride(a.stripPrefix("linguist-language=")
                  .toLowerCase(java.util.Locale.ROOT))))
            case "linguist-vendored" | "linguist-vendored=true" =>
              Some(Rule(pattern, Vendored))
            case "linguist-generated" | "linguist-generated=true" =>
              Some(Rule(pattern, Generated))
            case "linguist-documentation" | "linguist-documentation=true" =>
              Some(Rule(pattern, Documentation))
            case _ => None
          }
        }
      }
    }.toSeq

  /** The corpus `.gitattributes` — every attribute form, basename and
    * path patterns, `*`/`**`/`?` arms, a multi-attribute line, and
    * overlapping rules so last-match-wins is observable. */
  val CorpusContent: String =
    """# linguist overrides for the synthetic corpus
      |*.md linguist-documentation
      |docs/** linguist-vendored
      |*.ts linguist-language=TSX
      |tests/* linguist-generated=true
      |src/f1*.rs linguist-language=Rust-Beta
      |*.rs linguist-language=rust2018
      |lib/f?.md linguist-vendored=true
      |orphanpattern
      |src/f10.rs linguist-documentation linguist-language=RS10
      |""".stripMargin

  /** check() (gitattributes.rs:138) compiled to one expression: rules
    * fold in file order, each later match overwriting the result. */
  def checkColumn(rules: Seq[Rule], path: Column): Column = {
    val basename = coalesce(
      try_element_at(filter(split(path, "/"), c => c =!= ""), lit(-1)), path)
    rules.foldLeft(lit("no_match"): Column) { (acc, r) =>
      val target = if (r.filenameOnly) basename else path
      when(target.rlike(r.regex), lit(r.action.value)).otherwise(acc)
    }
  }

  /** §3 `*Of` form: per file — the raw check result plus the
    * language_override / should_skip convenience projections. */
  def gitattrOverridesOf(files: DataFrame, rules: Seq[Rule]): DataFrame = {
    val res = checkColumn(rules, col("relative_path"))
    files.select(col("watch_folder_id"), col("relative_path"))
      .withColumn("result", res)
      .withColumn("language_override",
        when(col("result").startsWith("language:"),
          expr("substring(result, 10)")))
      .withColumn("should_skip", col("result").startsWith("skip:"))
      .orderBy(col("watch_folder_id"), col("relative_path"))
  }

  def gitattrOverrides(spark: SparkSession, dir: String): DataFrame =
    gitattrOverridesOf(TrackedFilesQueries.tracked(spark, dir),
      parse(CorpusContent))

  /** The oracle twin, generated from the SAME parsed rule list so the
    * compiled regexes can never drift from the Spark plan. */
  def oracleSqlFor(rules: Seq[Rule]): String = {
    val idx = "(doc_id // 20)"
    val ext = s"['rs','md','py','ts','go'][($idx % 5) + 1]"
    val chain = rules.foldLeft("'no_match'") { (acc, r) =>
      val target = if (r.filenameOnly) "basename" else "relative_path"
      s"CASE WHEN regexp_matches($target, '${r.regex}') " +
        s"THEN '${r.action.value}' ELSE $acc END"
    }
    "WITH ga AS (\n" +
      "  SELECT 'w-' || CAST(substring(source, 4) AS INT) AS watch_folder_id,\n" +
      s"    ['src','lib','docs','tests'][($idx % 4) + 1] || '/f' || $idx\n" +
      s"      || '.' || $ext AS relative_path\n" +
      "  FROM documents),\n" +
      "gb AS (\n" +
      "  SELECT *, coalesce(list_filter(string_split(relative_path, '/'),\n" +
      "    x -> x <> '')[-1], relative_path) AS basename\n" +
      "  FROM ga),\n" +
      "gr AS (\n" +
      s"  SELECT watch_folder_id, relative_path, $chain AS result FROM gb)\n" +
      "SELECT watch_folder_id, relative_path, result,\n" +
      "  CASE WHEN starts_with(result, 'language:')\n" +
      "    THEN substring(result, 10) END AS language_override,\n" +
      "  starts_with(result, 'skip:') AS should_skip\n" +
      "FROM gr ORDER BY watch_folder_id, relative_path"
  }
}
