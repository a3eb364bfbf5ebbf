package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact/phrase substring search with pattern escaping — the grep
  * tool's literal mode (text_search/exact_search/search.rs:24
  * `search_exact` + text_search/escaping.rs): the pattern is escaped,
  * candidates selected by index, and matches verified as exact
  * substrings with a case-mode switch (case_insensitive lowercases both
  * sides, search.rs:109).
  *
  * Relational re-expression: the FTS5 trigram pre-filter + INSTR
  * verify collapses into ONE pushed-down scan predicate — a LIKE over
  * the escaped pattern (candidate selection) whose exact-substring
  * semantics the escaping guarantees — followed by a literal occurrence
  * count via length arithmetic (no regex engine, so metacharacters in
  * the pattern are inert by construction). Map-only at any scale; the
  * glob utilities below are the path-scoping half of the same tool
  * (escaping.rs:40-104), used as driver-side pre-filter builders.
  */
object ExactSearch {

  /** escape_like_pattern (escaping.rs:25): `\`, `%`, `_` escaped for an
    * exact-substring LIKE. */
  def escapeLikePattern(pattern: String): String =
    pattern.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")

  /** escape_fts5_pattern (escaping.rs:16): double-quote wrap with `""`
    * escaping; None under the 3-char trigram minimum. */
  def escapeFts5Pattern(pattern: String): Option[String] =
    if (pattern.length < 3) None
    else Some("\"" + pattern.replace("\"", "\"\"") + "\"")

  /** expand_braces (escaping.rs:65): one level of `{a,b,c}` expansion. */
  def expandBraces(glob: String): Seq[String] = {
    val open = glob.indexOf('{')
    if (open < 0) return Seq(glob)
    val close = glob.indexOf('}', open)
    if (close < 0) return Seq(glob)
    val prefix = glob.substring(0, open)
    val suffix = glob.substring(close + 1)
    glob.substring(open + 1, close).split(",", -1).toSeq
      .map(alt => s"$prefix${alt.trim}$suffix")
  }

  /** extract_glob_prefix (escaping.rs:40): longest literal prefix before
    * a glob metacharacter, for index pre-filtering. */
  def extractGlobPrefix(glob: String): Option[String] = {
    val pos = glob.indexWhere(c => c == '*' || c == '?' || c == '[')
    if (pos < 0) Some(glob).filter(_.nonEmpty) // no metacharacters: exact path
    else if (pos == 0) None
    else Some(glob.substring(0, pos)).filter(_.nonEmpty)
  }

  /** resolve_path_filter (escaping.rs:110): relative globs anchor with
    * `**` / `**` so they match indexed absolute paths (#94); the
    * literal prefix (if any) pre-filters before the full glob match. */
  def resolvePathFilter(glob: String): (String, Option[String]) = {
    val normalized =
      if (glob.startsWith("/") || glob.startsWith("**")) glob else s"**/$glob"
    (normalized, extractGlobPrefix(normalized))
  }

  /** Glob → anchored regex under the reference's match options
    * (escaping.rs:95: case-sensitive, separators NOT literal — `*`
    * crosses `/`): `**` / `*` → `.*` with a leading `**` slash group
    * optional (so `**` matches "lib.rs"), `?` → `.`, `[!..]`/`[..]`
    * classes pass through, everything else is quoted.
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' if glob.startsWith("**/", i) => sb.append("(.*/)?"); i += 3
        case '*' if glob.startsWith("**", i) => sb.append(".*"); i += 2
        case '*' => sb.append(".*"); i += 1
        case '?' => sb.append("."); i += 1
        case '[' =>
          val close = glob.indexOf(']', i + 1)
          if (close < 0) { sb.append("\\["); i += 1 }
          else {
            val body = glob.substring(i + 1, close)
            sb.append('[').append(if (body.startsWith("!")) "^" + body.drop(1) else body)
              .append(']')
            i = close + 1
          }
        case c =>
          if ("\\.[]{}()+-^$|".indexOf(c) >= 0) sb.append('\\')
          sb.append(c); i += 1
      }
    }
    sb.append('$').toString
  }

  /** The generic operator: exact occurrences of `pattern` per document
    * over a (doc_id, text) frame. `caseInsensitive` routes both sides
    * through lower() (search.rs:109's instr_pattern). Occurrences are
    * counted with replace-length arithmetic — a literal count, immune
    * to pattern metacharacters; the LIKE candidate filter runs on the
    * escaped pattern so `%`/`_` in the query are matched literally.
    */
  def exactSearchOf(docs: DataFrame, pattern: String,
                    caseInsensitive: Boolean = false): DataFrame = {
    require(pattern.nonEmpty, "empty pattern returns no matches (search.rs:31)")
    // Locale.ROOT matches Spark's locale-independent lower(); the JVM
    // default locale would diverge (Turkish dotted/dotless I) between
    // the pattern side and the haystack side.
    val pat = if (caseInsensitive) pattern.toLowerCase(java.util.Locale.ROOT) else pattern
    val hay = if (caseInsensitive) lower(col("text")) else col("text")
    docs
      .filter(hay.like("%" + escapeLikePattern(pat) + "%"))
      .select(col("doc_id"),
        ((length(hay) - length(replace(hay, lit(pat), lit("")))) / pat.length)
          .cast("int").as("n_matches"))
      .orderBy(col("doc_id"))
  }

  /** exact_search query: literal phrase count over the corpus. */
  def exactSearch(spark: SparkSession, dir: String,
                  pattern: String = "hash join",
                  caseInsensitive: Boolean = false): DataFrame =
    exactSearchOf(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      pattern, caseInsensitive)

  /** glob_search query: exact search scoped by a path glob — the full
    * tool flow (search.rs:41 resolve → prefix pre-filter → glob verify
    * → substring match). The corpus path identity is the same derived
    * absolute path structural_tags uses; the prefix lands as a
    * pushed-down StartsWith on the scan, the expanded globs verify as
    * anchored regexes, then the literal count runs on the survivors.
    */
  def globSearch(spark: SparkSession, dir: String,
                 pattern: String = "hash join",
                 glob: String = "/corpus/src1*/doc*.txt"): DataFrame = {
    val (normalized, prefix) = resolvePathFilter(glob)
    val regexes = expandBraces(normalized).map(globToRegex)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit("/corpus/"), col("source"), lit("/doc"),
          col("doc_id").cast("string"), lit(".txt")).as("file_path"),
        col("text"))
    val preFiltered = prefix.fold(docs)(p => docs.filter(col("file_path").startsWith(p)))
    val scoped = preFiltered
      .filter(regexes.map(r => col("file_path").rlike(r)).reduce(_ || _))
    scoped
      .filter(col("text").like("%" + escapeLikePattern(pattern) + "%"))
      .select(col("doc_id"), col("file_path"),
        ((length(col("text")) - length(replace(col("text"), lit(pattern), lit("")))) / pattern.length)
          .cast("int").as("n_matches"))
      .orderBy(col("doc_id"))
  }
}
