package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized-config property specs for the two PATTERN TRANSLATORS
  * behind generated oracles (round-10 board: the generated oracles pin
  * their arms on fixed config axes by construction, so a latent
  * translator bug — glob→regex, rlike chains — could hide behind the
  * fixed scenario lists; these specs drive the translators with seeded
  * RANDOM patterns and paths against independent reference matchers).
  *
  * The references implement the documented semantics directly
  * (recursive descent over the pattern), sharing no code with the
  * regex compilers they check. Comparison uses java.util.regex `find`
  * — exactly what Spark's rlike executes.
  */
class PatternTranslatorPropSpec extends SparkSpec {

  // ---- gitattributes fnmatch (GitattributesOps.globToRegex) ----
  // Semantics: '*'/'?' never cross '/'; '**' matches ANY chars (and
  // consumes one following '/'); everything else literal.
  private def gaMatch(p: String, s: String): Boolean =
    if (p.startsWith("**")) {
      val rest0 = p.drop(2)
      val rest = if (rest0.startsWith("/")) rest0.drop(1) else rest0
      (0 to s.length).exists(i => gaMatch(rest, s.drop(i)))
    } else if (p.isEmpty) s.isEmpty
    else p.head match {
      case '*' =>
        (0 to s.length).exists(i =>
          !s.take(i).contains('/') && gaMatch(p.tail, s.drop(i)))
      case '?' => s.nonEmpty && s.head != '/' && gaMatch(p.tail, s.tail)
      case c => s.nonEmpty && s.head == c && gaMatch(p.tail, s.tail)
    }

  private def randomGaPattern(rng: scala.util.Random): String = {
    // atom count capped at 4: the reference matchers are deliberately
    // naive recursions, exponential in the number of wildcards
    val atoms = Seq("a", "b", "c", ".", "/", "*", "?", "**", "f1", ".rs",
      "(", ")", "+", "$", "{", "|")
    (1 to (1 + rng.nextInt(4))).map(_ => atoms(rng.nextInt(atoms.length))).mkString
  }

  private def randomPath(rng: scala.util.Random): String = {
    val segs = Seq("a", "b", "c", "ab", "f1", "f10.rs", "x.md", ".", "aa")
    (1 to (1 + rng.nextInt(3))).map(_ => segs(rng.nextInt(segs.length)))
      .mkString("/")
  }

  test("gitattributes glob→regex equals the reference matcher on random patterns") {
    var checked = 0
    for (seed <- 0 until 5) {
      val rng = new scala.util.Random(seed)
      for (_ <- 0 until 400) {
        val pat = randomGaPattern(rng)
        val path = randomPath(rng)
        val regex = GitattributesOps.globToRegex(pat)
        val got = Pattern.compile(regex).matcher(path).find()
        val want = gaMatch(pat, path)
        assert(got == want,
          s"pattern '$pat' (regex $regex) vs path '$path': regex=$got reference=$want")
        checked += 1
      }
    }
    assert(checked == 2000)
  }

  test("gitattributes last-match-wins fold: Spark checkColumn equals the driver fold") {
    import GitattributesOps._
    import spark.implicits._
    for (seed <- 0 until 3) {
      val rng = new scala.util.Random(100 + seed)
      val actions: Seq[Action] =
        Seq(Vendored, Generated, Documentation, LanguageOverride("l" + seed))
      val rules = (1 to 6).map(_ =>
        Rule(randomGaPattern(rng), actions(rng.nextInt(actions.length))))
      val paths = (1 to 40).map(_ => randomPath(rng)).distinct
      def refCheck(path: String): String = {
        val basename = path.split("/").filter(_.nonEmpty).lastOption.getOrElse(path)
        rules.foldLeft("no_match") { (acc, r) =>
          val target = if (r.filenameOnly) basename else path
          if (Pattern.compile(r.regex).matcher(target).find()) r.action.value else acc
        }
      }
      val got = paths.toDF("p")
        .select(col("p"), checkColumn(rules, col("p")).as("r"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      for (p <- paths)
        assert(got(p) == refCheck(p), s"seed $seed path '$p' rules $rules")
    }
  }

  // ---- gitignore compiler (IgnoreRules.compileLine) ----
  // Reference: segment-wise recursive matcher. '**' trailing = strictly
  // inside (≥1 more segment); leading/middle '**' = zero or more whole
  // segments; '*'/'?' within a segment; '[..]' fnmatch classes ('^' and
  // '!' both negate, and a class never matches '/' — segment-wise
  // matching gives that for free here; the regex compiler has to guard
  // negated classes explicitly, which this spec caught it not doing);
  // unanchored patterns float to any depth.
  // Returns None for a MALFORMED class — empty body or any reversed
  // range — which the reference engine (ignore crate → globset) rejects
  // at glob-parse time, dropping the whole line; the matcher mirrors
  // that as "this segment (and hence the line) can never match".
  private def classMatch(cls: String, c: Char): Option[Boolean] = {
    // cls excludes the brackets
    val (neg, body) =
      if (cls.startsWith("^") || cls.startsWith("!")) (true, cls.drop(1))
      else (false, cls)
    var i = 0; var hit = false; var malformed = body.isEmpty
    while (i < body.length) {
      if (i + 2 < body.length && body.charAt(i + 1) == '-') {
        if (body.charAt(i) > body.charAt(i + 2)) malformed = true
        else if (body.charAt(i) <= c && c <= body.charAt(i + 2)) hit = true
        i += 3
      } else {
        if (body.charAt(i) == c) hit = true
        i += 1
      }
    }
    if (malformed) None else Some(hit != neg)
  }

  private def segMatch(pat: String, s: String): Boolean =
    if (pat.isEmpty) s.isEmpty
    else pat.head match {
      case '*' => (0 to s.length).exists(i => segMatch(pat.tail, s.drop(i)))
      case '?' => s.nonEmpty && segMatch(pat.tail, s.tail)
      case '[' =>
        val close = pat.indexOf(']', 1)
        if (close > 0)
          s.nonEmpty &&
            classMatch(pat.substring(1, close), s.head).contains(true) &&
            segMatch(pat.substring(close + 1), s.tail)
        else s.nonEmpty && s.head == '[' && segMatch(pat.tail, s.tail)
      case c => s.nonEmpty && s.head == c && segMatch(pat.tail, s.tail)
    }

  private def matchSegs(ps: List[String], ss: List[String]): Boolean = ps match {
    case Nil => ss.isEmpty
    case "**" :: Nil => ss.nonEmpty
    case "**" :: rest =>
      (0 to ss.length).exists(k => matchSegs(rest, ss.drop(k)))
    case pseg :: rest =>
      ss.nonEmpty && segMatch(pseg, ss.head) && matchSegs(rest, ss.tail)
  }

  private def ignoreRefMatch(line: String, target: String): Option[Boolean] =
    IgnoreRules.compileLine(line, 0).map { _ =>
      var p = line.trim
      if (p.startsWith("!")) p = p.substring(1).trim
      if (p.endsWith("/")) p = p.dropRight(1)
      val anchored = p.startsWith("/") || p.dropRight(1).contains("/")
      if (p.startsWith("/")) p = p.substring(1)
      val segs = p.split("/", -1).toList
      val tsegs = target.split("/", -1).toList
      if (anchored) matchSegs(segs, tsegs)
      else (0 to tsegs.length - 1).exists(k => matchSegs(segs, tsegs.drop(k)))
    }

  private def randomIgnoreLine(rng: scala.util.Random): String = {
    val atoms = Seq("a", "b", "c", ".", "/", "*", "?", "**", "f1", ".rs",
      "[abc]", "[a-c]", "[^ab]", "[!ab]", "+", "(", "$",
      // regex-metacharacter class bodies (round-11 escaping fix): '&'
      // and '\' literal members, empty/empty-negated classes, reversed
      // (never-matching) ranges, trailing literal '-'
      "[a&]", "[\\]", "[]", "[!]", "[c-a]", "[!c-a]", "[a-]")
    val core = (1 to (1 + rng.nextInt(5)))
      .map(_ => atoms(rng.nextInt(atoms.length))).mkString
    val pre = if (rng.nextInt(5) == 0) "!" else if (rng.nextInt(5) == 0) "/" else ""
    val post = if (rng.nextInt(6) == 0) "/" else ""
    pre + core + post
  }

  test("gitignore pattern compiler equals the reference matcher on random patterns") {
    var checked = 0
    for (seed <- 0 until 5) {
      val rng = new scala.util.Random(seed)
      for (_ <- 0 until 400) {
        val line = randomIgnoreLine(rng)
        val target = randomPath(rng)
        IgnoreRules.compileLine(line, 0).foreach { cp =>
          val got = Pattern.compile(cp.regex).matcher(target).find()
          val want = ignoreRefMatch(line, target).get
          assert(got == want,
            s"line '$line' (regex ${cp.regex}) vs target '$target': " +
              s"regex=$got reference=$want")
          checked += 1
        }
      }
    }
    assert(checked > 1500, s"degenerate generator: only $checked live checks")
  }
}
