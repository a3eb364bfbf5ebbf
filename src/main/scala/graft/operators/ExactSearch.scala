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
    val pat = if (caseInsensitive) pattern.toLowerCase else pattern
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
}
