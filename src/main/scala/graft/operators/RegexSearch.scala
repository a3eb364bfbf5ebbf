package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Literal-prefilter regex search — the reference's two-phase FTS plan
  * (text_search/regex_search/mod.rs:1-13: extract literal substrings
  * from the regex, prefilter candidates by literal containment, verify
  * with the real regex).
  *
  * The extractor (regex_parser/parser.rs) is ported DRIVER-SIDE, like
  * the gitignore pattern compiler: it walks the pattern once at plan
  * time and emits codegen'd `contains` predicates ahead of the rlike
  * verify. Mandatory literals AND together; alternation-group literals
  * OR internally. At 100 TB the cheap `contains` columns prune rows
  * before the expensive regex runs — and because they are plain
  * StringContains predicates, they push into the parquet scan
  * (PlanSpec locks this), where the regex itself never could.
  *
  * Soundness follows the reference exactly: extraction produces
  * NECESSARY conditions (a row matching the regex must contain every
  * mandatory literal and one literal of each alternation group); when a
  * top-level branch has no usable literal the whole prefilter is
  * abandoned — full scan, never a false negative
  * (parser.rs extract_top_level_alternation soundness guard, #90).
  */
object RegexSearch {

  /** Structured literals extracted from a regex (types.rs
    * RegexLiterals): mandatory runs AND'd, alternation groups OR'd
    * internally. */
  case class RegexLiterals(mandatory: Vector[String], alternations: Vector[Vector[String]])

  private val MetaClasses = "dDwWsSbBAzZG".toSet
  private val RunEnders = Set('.', '*', '+', '?', ']', ')', '{', '}', '^', '$')

  /** extract_literals_from_regex (regex_parser/mod.rs:22): top-level
    * alternations route through the single-OR-group path (#90);
    * everything else through the recursive char walk. */
  def extractLiterals(pattern: String): RegexLiterals = {
    val b = new Builder
    if (splitAlternation(pattern).lengthCompare(1) > 0) extractTopLevel(pattern, b)
    else extractRecursive(pattern, b)
    RegexLiterals(b.mandatory.toVector, b.alternations.map(_.toVector).toVector)
  }

  private class Builder {
    val mandatory = ArrayBuffer[String]()
    val alternations = ArrayBuffer[Vector[String]]()
  }

  private def flush(current: StringBuilder, mandatory: ArrayBuffer[String]): Unit = {
    if (current.length >= 3) mandatory += current.toString
    current.setLength(0)
  }

  /** parser.rs:6 extract_literals_recursive — the char walk. */
  private def extractRecursive(pattern: String, result: Builder): Unit = {
    val current = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      pattern(i) match {
        case '\\' =>
          if (i + 1 < pattern.length) {
            val next = pattern(i + 1)
            if (MetaClasses(next)) flush(current, result.mandatory)
            else current.append(next)
            i += 2
          } else i += 1
        case '[' =>
          flush(current, result.mandatory)
          i += 1
          var open = true
          while (i < pattern.length && open) {
            if (pattern(i) == '\\') i += 2
            else if (pattern(i) == ']') { i += 1; open = false }
            else i += 1
          }
        case '(' =>
          val prefix = current.toString; current.setLength(0)
          if (prefix.length >= 3) result.mandatory += prefix
          val (content, afterGroup) = groupContent(pattern, i + 1)
          val (suffix, afterSuffix) = literalSuffix(pattern, afterGroup)
          processGroupWithAffixes(prefix, suffix, content, result)
          if (suffix.length >= 3) result.mandatory += suffix
          i = afterSuffix
        case '|' =>
          // top level of a recursive call (group branch content):
          // remaining pattern becomes the alternate branch
          flush(current, result.mandatory)
          val rest = pattern.substring(i + 1)
          val leftLits = result.mandatory.toVector
          result.mandatory.clear()
          val right = new Builder
          extractRecursive(rest, right)
          result.alternations ++= right.alternations
          val group = leftLits ++ right.mandatory
          if (group.nonEmpty) result.alternations += group
          return
        case c if RunEnders(c) =>
          flush(current, result.mandatory)
          i += 1
        case c =>
          current.append(c)
          i += 1
      }
    }
    flush(current, result.mandatory)
  }

  /** parser.rs:95 extract_group_content — nested-paren and escape aware;
    * returns (content, index after the closing paren). */
  private def groupContent(pattern: String, start: Int): (String, Int) = {
    val content = new StringBuilder
    var depth = 1
    var i = start
    while (i < pattern.length && depth > 0) {
      pattern(i) match {
        case '(' => depth += 1; content.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) content.append(')')
          i += 1
        case '\\' =>
          content.append('\\')
          if (i + 1 < pattern.length) content.append(pattern(i + 1))
          i += 2
        case c => content.append(c); i += 1
      }
    }
    (content.toString, i)
  }

  /** parser.rs:122 collect_literal_suffix — literal chars immediately
    * after a group close; escaped metacharacter classes end it. */
  private def literalSuffix(pattern: String, start: Int): (String, Int) = {
    val suffix = new StringBuilder
    var i = start
    var done = false
    while (i < pattern.length && !done) {
      pattern(i) match {
        case '\\' =>
          if (i + 1 < pattern.length && !MetaClasses(pattern(i + 1))) {
            suffix.append(pattern(i + 1)); i += 2
          } else done = true
        case c if c == '.' || c == '*' || c == '+' || c == '?' || c == '[' ||
          c == ']' || c == '(' || c == ')' || c == '{' || c == '}' ||
          c == '|' || c == '^' || c == '$' => done = true
        case c => suffix.append(c); i += 1
      }
    }
    (suffix.toString, i)
  }

  /** parser.rs:153 process_group_with_affixes. */
  private def processGroupWithAffixes(prefix: String, suffix: String,
                                      content: String, result: Builder): Unit = {
    val branches = splitAlternation(content)
    if (branches.lengthCompare(1) <= 0) extractRecursive(content, result)
    else {
      val altGroup = ArrayBuffer[String]()
      branches.foreach { branch =>
        val br = new Builder
        extractRecursive(branch, br)
        if (br.mandatory.isEmpty) {
          val combined = prefix + branch + suffix
          if (combined.length >= 3 && isAllLiteral(branch)) altGroup += combined
        } else {
          br.mandatory.foreach { lit =>
            val combined = prefix + lit + suffix
            if (combined.length >= 3) altGroup += combined
            else if (lit.length >= 3) altGroup += lit
          }
        }
        result.alternations ++= br.alternations
      }
      if (altGroup.nonEmpty) result.alternations += altGroup.toVector
    }
  }

  /** parser.rs:213 extract_top_level_alternation — all branches OR into
    * ONE group; an unrepresentable branch abandons the whole prefilter
    * (soundness guard). */
  private def extractTopLevel(pattern: String, result: Builder): Unit = {
    val altGroup = ArrayBuffer[String]()
    splitAlternation(pattern).foreach { branch =>
      val br = new Builder
      extractRecursive(branch, br)
      val terms = ArrayBuffer[String]()
      terms ++= br.mandatory.filter(_.length >= 3)
      br.alternations.foreach(g => terms ++= g.filter(_.length >= 3))
      if (terms.isEmpty && isAllLiteral(branch) && branch.length >= 3)
        terms += branch
      if (terms.isEmpty) {
        result.mandatory.clear()
        result.alternations.clear()
        return
      }
      altGroup ++= terms
    }
    if (altGroup.nonEmpty) result.alternations += altGroup.toVector
  }

  /** parser.rs:263 split_alternation — top-level `|` split respecting
    * nested parens and escapes. */
  private def splitAlternation(content: String): Vector[String] = {
    val branches = ArrayBuffer[String]()
    val current = new StringBuilder
    var depth = 0
    var i = 0
    while (i < content.length) {
      content(i) match {
        case '(' => depth += 1; current.append('('); i += 1
        case ')' => depth -= 1; current.append(')'); i += 1
        case '\\' =>
          current.append('\\')
          if (i + 1 < content.length) current.append(content(i + 1))
          i += 2
        case '|' if depth == 0 =>
          branches += current.toString; current.setLength(0); i += 1
        case c => current.append(c); i += 1
      }
    }
    branches += current.toString
    branches.toVector
  }

  /** parser.rs:295 is_all_literal. */
  private def isAllLiteral(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\\' =>
          if (i + 1 < s.length && MetaClasses(s(i + 1))) return false
          i += 2
        case c if c == '.' || c == '*' || c == '+' || c == '?' || c == '[' ||
          c == ']' || c == '(' || c == ')' || c == '{' || c == '}' ||
          c == '|' || c == '^' || c == '$' => return false
        case _ => i += 1
      }
    }
    true
  }

  /** escape_fts5_pattern (escaping.rs:16): under-3-char literals are
    * unusable; quotes double inside the quoted term. */
  def escapeFts5(pattern: String): Option[String] =
    if (pattern.length < 3) None
    else Some("\"" + pattern.replace("\"", "\"\"") + "\"")

  /** build_fts5_query (query_builder.rs:12) — kept as the reference's
    * exact string form so its unit vectors port verbatim; the Column
    * prefilter below mirrors this structure 1:1. */
  def buildFts5Query(lits: RegexLiterals): Option[String] = {
    val altClauses: Vector[(String, Vector[String])] = lits.alternations.flatMap { g =>
      val terms = g.flatMap(escapeFts5)
      if (terms.size == 1) Some((terms.head, g))
      else if (terms.size > 1) Some((terms.mkString("(", " OR ", ")"), g))
      else None
    }
    val clauses = ArrayBuffer[String]()
    lits.mandatory.foreach { lit =>
      val subsumed = altClauses.exists { case (_, raw) =>
        raw.size >= 2 && raw.forall(_.startsWith(lit))
      }
      if (!subsumed) escapeFts5(lit).foreach(clauses += _)
    }
    altClauses.foreach { case (clause, _) => clauses += clause }
    if (clauses.isEmpty) None else Some(clauses.mkString(" AND "))
  }

  /** The Spark prefilter: one codegen'd `contains` predicate per usable
    * literal, AND/OR-composed exactly like buildFts5Query. None means
    * no usable literals — the caller falls back to the bare regex scan.
    */
  def prefilterFor(lits: RegexLiterals, text: Column): Option[Column] = {
    val altClauses: Vector[(Column, Vector[String])] = lits.alternations.flatMap { g =>
      val terms = g.filter(_.length >= 3)
      if (terms.nonEmpty) Some((terms.map(text.contains(_): Column).reduce(_ || _), g))
      else None
    }
    val clauses = ArrayBuffer[Column]()
    lits.mandatory.foreach { lit =>
      val subsumed = altClauses.exists { case (_, raw) =>
        raw.size >= 2 && raw.forall(_.startsWith(lit))
      }
      if (!subsumed && lit.length >= 3) clauses += text.contains(lit)
    }
    altClauses.foreach { case (clause, _) => clauses += clause }
    clauses.reduceOption(_ && _)
  }

  /** Two-phase regex search over a (doc_id, text) frame: literal
    * `contains` prefilter (when extractable) ahead of the regex verify,
    * per-doc match counts like grep_search. Result-identical to the
    * bare-regex scan by the necessary-condition property.
    */
  def regexSearchOf(docs: DataFrame, pattern: String): DataFrame = {
    val prefiltered = prefilterFor(extractLiterals(pattern), col("text"))
      .map(docs.filter).getOrElse(docs)
    prefiltered
      .select(col("doc_id"), regexp_count(col("text"), lit(pattern)).as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** regex_search query: a pattern with a mandatory literal AND a group
    * alternation over the corpus vocabulary, so both prefilter shapes
    * prune before the verify. */
  def regexSearch(spark: SparkSession, dir: String,
                  pattern: String = "(batch|stream) window"): DataFrame =
    regexSearchOf(Tables.documents(spark, dir).select(col("doc_id"), col("text")), pattern)
      .orderBy(col("doc_id"))
}
