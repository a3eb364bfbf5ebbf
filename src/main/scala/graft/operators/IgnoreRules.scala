package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Gate-0 ignore filtering — the per-project `.gitignore` +
  * `.wqmignore` matcher every scanned path passes before any other
  * exclusion rule (patterns/gitignore.rs `ProjectIgnoreMatcher`).
  *
  * Semantics mirrored from the reference (whose matching is the
  * `ignore` crate):
  *   - gitignore pattern syntax: `#` comments and blanks skipped,
  *     trailing `/` = directory-only, a `/` at the start or middle
  *     anchors the pattern to the root, otherwise it matches at any
  *     depth; `*` never crosses `/`, `?` is one non-slash char, `**`
  *     crosses directories (leading `STARSTAR/`, trailing `/STARSTAR`,
  *     middle).
  *   - `.wqmignore` exclusions UNION with `.gitignore`
  *     (gitignore.rs:77: both files feed one exclusion matcher);
  *     its `!pattern` / legacy `- pattern` lines build a SEPARATE
  *     re-inclusion matcher that overrides any exclusion
  *     (gitignore.rs:128 is_ignored).
  *   - descendants of ignored directories are ignored
  *     (matched_path_or_any_parents, gitignore.rs:152 / #105): a path
  *     is tested against itself and every ancestor (ancestors as
  *     directories), deepest decided target wins; within one target the
  *     LAST matching pattern line wins (gitignore's in-file negation
  *     order).
  *
  * Relational shape: patterns compile driver-side into a literal
  * (order, regex, dir_only, negation) table, paths explode into their
  * ancestor chains, and matching is one BROADCAST join + two windowed
  * resolutions — shuffle ∝ matched (target, pattern) pairs, never the
  * corpus times the full pattern table.
  */
object IgnoreRules {

  /** One compiled ignore pattern. `regex` matches a FULL root-relative
    * target path (no leading slash). */
  final case class CompiledPattern(order: Int, regex: String, dirOnly: Boolean,
                                   negation: Boolean)

  /** Compile one gitignore line; None for blanks/comments. `negation`
    * is the in-file `!` prefix (gitignore whitelist semantics). */
  def compileLine(line: String, order: Int): Option[CompiledPattern] = {
    var p = line.trim
    if (p.isEmpty || p.startsWith("#")) return None
    val negation = p.startsWith("!")
    if (negation) p = p.substring(1).trim
    if (p.isEmpty) return None
    val dirOnly = p.endsWith("/")
    if (dirOnly) p = p.dropRight(1)
    val anchored = p.startsWith("/") || p.dropRight(1).contains("/")
    if (p.startsWith("/")) p = p.substring(1)
    if (p.isEmpty) return None

    def segRegex(seg: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < seg.length) {
        seg.charAt(i) match {
          case '*' => sb.append("[^/]*")
          case '?' => sb.append("[^/]")
          case '[' =>
            // fnmatch bracket class (the reference's `ignore` crate
            // semantics): `[!...]` and `[^...]` both negate, and a
            // negated class NEVER matches '/' — copied verbatim, a
            // regex `[^ab]` would happily cross a segment boundary
            // (caught by PatternTranslatorPropSpec's random patterns;
            // positive classes are slash-safe by construction since
            // segments are split on '/').
            val close = seg.indexOf(']', i + 1)
            if (close > i) {
              val body = seg.substring(i + 1, close)
              val neg = body.startsWith("!") || body.startsWith("^")
              // Re-tokenize the fnmatch body (ranges a-b, else literal
              // chars) and emit each token ESCAPED — copying the body
              // verbatim let regex-class metacharacters through: a
              // backslash or '&&' mistranslates or throws
              // PatternSyntaxException, and a reversed range like
              // [c-a] (never-matching in fnmatch's lo<=c<=hi scan) is
              // a Java regex compile error. Tokenization mirrors the
              // fnmatch semantics exactly (a '-' without both
              // endpoints is a literal).
              val raw = if (neg) body.substring(1) else body
              val esc = new StringBuilder
              def lit(c: Char): Unit = {
                if ("\\&[]^-".indexOf(c) >= 0) esc.append('\\')
                esc.append(c)
              }
              var j = 0
              var malformed = raw.isEmpty
              while (j < raw.length) {
                if (j + 2 < raw.length && raw.charAt(j + 1) == '-') {
                  val (lo, hi) = (raw.charAt(j), raw.charAt(j + 2))
                  if (lo <= hi) { lit(lo); esc.append('-'); lit(hi) }
                  // reversed range: the reference's ignore engine (the
                  // Rust `ignore` crate → globset) rejects it as a glob
                  // parse error, which drops the whole LINE — mark the
                  // class malformed rather than silently narrowing it
                  else malformed = true
                  j += 3
                } else { lit(raw.charAt(j)); j += 1 }
              }
              // Malformed classes — empty (`[]`, `[!]`: globset treats
              // the `]` as a would-be first member and errors on the
              // then-unclosed class) or containing a reversed range
              // (`[c-a]`, `[ac-a]`: globset ErrorKind::InvalidRange) —
              // make the reference engine drop the entire ignore line.
              // `(?!)` never matches, so emitting it anywhere in the
              // compiled regex renders the line inert, which is exactly
              // that behavior. (POSIX fnmatch differs — it would treat
              // `[!]` literally — but the reference's engine is globset,
              // and PatternTranslatorPropSpec pins this contract.)
              if (malformed) sb.append("(?!)")
              else if (neg) sb.append("[^/").append(esc).append("]")
              else sb.append("[").append(esc).append("]")
              i = close
            }
            else sb.append("\\[")
          case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb.append("\\").append(c)
          case c => sb.append(c)
        }
        i += 1
      }
      sb.toString
    }

    val segs = p.split("/", -1).toSeq
    val body = segs.zipWithIndex.map { case (seg, i) =>
      val part =
        if (seg == "**")
          if (i == segs.length - 1) ".*"     // trailing /** — everything inside
          else "(?:[^/]+/)*"                  // leading or middle ** — any depth
        else segRegex(seg)
      part + (if (seg != "**" && i < segs.length - 1) "/" else "")
    }.mkString
    // an unanchored pattern may match at any depth (implicit **/ prefix)
    val full = (if (anchored) "^" else "^(?:[^/]*/)*") + body + "$"
    Some(CompiledPattern(order, full, dirOnly, negation))
  }

  /** Compile a pattern file's lines with increasing order. */
  def compileLines(lines: Seq[String], startOrder: Int = 0): Seq[CompiledPattern] =
    lines.zipWithIndex.flatMap { case (l, i) => compileLine(l, startOrder + i) }

  /** Split `.wqmignore` lines into (exclusion lines, re-inclusion
    * patterns) — `!pattern` and the legacy `- pattern` alias both
    * re-include (gitignore.rs:189 parse_wqmignore_into). */
  def splitWqmignore(lines: Seq[String]): (Seq[String], Seq[String]) = {
    val cleaned = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
    val (reinc, excl) = cleaned.partition(l => l.startsWith("- ") || l.startsWith("!"))
    (excl, reinc.map(l => if (l.startsWith("- ")) l.substring(2).trim
                          else l.substring(1).trim).filter(_.nonEmpty))
  }

  /** Apply the Gate-0 matcher to a (doc_id, rel_path, is_dir) frame:
    * adds `ignored` (0/1). Paths are root-relative without a leading
    * slash. */
  def ignoreFilterOf(files: DataFrame, gitignoreLines: Seq[String],
                     wqmignoreLines: Seq[String]): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val (wqmExcl, wqmReinc) = splitWqmignore(wqmignoreLines)
    val exclusions = compileLines(gitignoreLines) ++
      compileLines(wqmExcl, startOrder = gitignoreLines.length)
    val reinclusions = compileLines(wqmReinc)

    // explode each path into its target chain: the path itself (the
    // file's own is_dir) plus every ancestor (always a directory);
    // depth orders deepest-first resolution.
    val targets = files
      .withColumn("parts", split(col("rel_path"), "/"))
      .select(col("doc_id"), col("rel_path"), col("is_dir"),
        posexplode(transform(sequence(lit(1), size(col("parts"))),
          n => concat_ws("/", slice(col("parts"), lit(1), n)))))
      .withColumnRenamed("col", "target")
      .withColumn("depth", col("pos") + 1)
      .withColumn("t_is_dir",
        when(col("target") === col("rel_path"), col("is_dir")).otherwise(lit(true)))

    // the pattern axis is config-sized (an ignore file), so matches are
    // INLINED as codegen'd rlike columns — no join at all
    def matches(ps: Seq[CompiledPattern]): Column = explode(filter(
      array(ps.map(p => struct(
        lit(p.order).as("ord"), lit(p.negation).as("neg"),
        (col("target").rlike(p.regex) &&
          (lit(!p.dirOnly) || col("t_is_dir"))).as("m"))): _*),
      pm => pm.getField("m")))

    // exclusion verdicts: last matching line per target, deepest
    // decided target per path (matched_path_or_any_parents order)
    val exclHits = targets
      .select(col("doc_id"), col("depth"), matches(exclusions).as("pm"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"), col("depth"))
          .orderBy(col("pm.ord").desc)))
      .filter(col("rn") === 1)
      .withColumn("dn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("depth").desc)))
      .filter(col("dn") === 1)
      .select(col("doc_id"), (!col("pm.neg")).cast("int").as("excluded"))

    val reincHits =
      if (reinclusions.isEmpty)
        files.select(col("doc_id")).limit(0).withColumn("reincluded", lit(1))
      else targets
        .select(col("doc_id"), matches(reinclusions).as("pm"))
        .select(col("doc_id")).distinct()
        .withColumn("reincluded", lit(1))

    files
      .join(exclHits, Seq("doc_id"), "left")
      .join(reincHits, Seq("doc_id"), "left")
      .withColumn("ignored",
        when(col("reincluded") === 1, 0)
          .otherwise(coalesce(col("excluded"), lit(0))))
      .select(col("doc_id"), col("rel_path"), col("is_dir"), col("ignored"))
  }

  /** ignore_filter query: the Gate-0 pass over a synthetic project
    * tree with a fixed `.gitignore` (dir-only, glob, root-anchored,
    * and recursive-glob patterns) and `.wqmignore` (an extra exclusion
    * plus canonical `!` and legacy `- ` re-inclusions) — every rule
    * class lands on at least one path.
    */
  def ignoreFilter(spark: SparkSession, dir: String): DataFrame = {
    val paths = Seq(
      "src/main.rs",            // kept
      "target/debug/app.o",     // target/ (dir-only, ancestor)
      "logs/app.log",           // *.log at any depth
      "logs/keep.log",          // *.log but !keep.log re-includes
      "dist/bundle.js",         // /dist anchored at root
      "subdir/dist/x.js",       // /dist does NOT match nested dist
      "docs/internal/readme.md",// docs/** recursive glob
      "tmp/cache.bin",          // .wqmignore exclusion tmp/
      "packages/web/index.ts",  // `- packages/web` legacy re-inclusion
      "notes.txt")              // kept
    val gitignore = Seq("# build artefacts", "target/", "*.log", "/dist", "docs/**")
    val wqmignore = Seq("tmp/", "", "# keep these", "!keep.log", "- packages/web")
    val files = Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(paths.map(lit): _*),
          (pmod(col("doc_id"), lit(paths.length)) + 1).cast("int")).as("rel_path"),
        lit(false).as("is_dir"))
    ignoreFilterOf(files, gitignore, wqmignore).orderBy(col("doc_id"))
  }
}
