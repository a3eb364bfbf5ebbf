package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The daemon's global ExclusionEngine (patterns/exclusion/{engine,
  * helpers,mod}.rs) — the Gate-1 static exclusion every filesystem
  * walk and scan consults.
  *
  * The engine's construction has a consequential quirk chain, all
  * kept: classify_and_store_pattern (helpers.rs:8) receives the
  * exact-match set as an UNUSED parameter, so plain patterns (no `*`
  * or `/`) all land in the CONTAINS bucket and the engine's two
  * "exact match" arms can never fire (dead, faithful); the default
  * config's four lists (.git/.hg/.svn, target/build/dist/out,
  * .cache/__pycache__/node_modules, .idea/.vscode/.vs) and the 18
  * critical patterns are ALL plain, so the prefix/suffix buckets are
  * empty too. The live cascade is therefore: `.github` whitelist
  * (engine.rs:295 — prefix/infix/exact forms) → hidden dotted
  * component at any depth (:304, `.github` skipped) → substring
  * containment in registration order. Containment means `retargeting
  * .rs` is excluded by `target` and `digit.gitignore` by `.git` —
  * real behavior, pinned in the spec.
  *
  * should_exclude_file_in_root (mod.rs:83, #97): the watch-root
  * prefix is stripped on a component boundary so dotted components
  * ABOVE the registered root never exclude; the root itself is never
  * excluded; non-descendants fall back to the full path.
  * should_exclude_directory (mod.rs:104): `.github` whitelisted, any
  * other dotted name excluded, else the engine probed with
  * `<name>/placeholder.txt`.
  */
object ExclusionEngineOps {

  /** The engine's registered (pattern, reason) list in registration
    * order — the four config categories then the critical set. */
  val Patterns: Seq[(String, String)] =
    Seq(".git", ".hg", ".svn").map(_ -> "Version control metadata") ++
      Seq("target", "build", "dist", "out")
        .map(_ -> "Build artifacts and generated files") ++
      Seq(".cache", "__pycache__", "node_modules")
        .map(_ -> "Cache and temporary files") ++
      Seq(".idea", ".vscode", ".vs")
        .map(_ -> "IDE and editor configuration") ++
      Seq("Thumbs.db" -> "Windows thumbnail cache",
        ".DS_Store" -> "macOS folder metadata",
        "desktop.ini" -> "Windows folder settings",
        "~$" -> "Office temporary files",
        ".tmp" -> "Temporary files", ".temp" -> "Temporary files",
        ".swp" -> "Vim swap files", ".swo" -> "Vim swap files",
        ".orig" -> "Merge conflict backup",
        ".env" -> "Environment variables (potentially sensitive)",
        ".env.local" -> "Local environment variables",
        "id_rsa" -> "SSH private key", "id_dsa" -> "SSH private key",
        "id_ecdsa" -> "SSH private key", "id_ed25519" -> "SSH private key",
        ".dmg" -> "macOS disk image", ".iso" -> "Disk image",
        ".img" -> "Disk image", ".vmdk" -> "Virtual machine disk")

  /** is_github_path (engine.rs:295); the backslash forms are Windows
    * separators, kept for fidelity. */
  def isGithubPath(p: Column): Column =
    p.startsWith(".github/") || p.startsWith(".github\\") ||
      p.contains("/.github/") || p.contains("\\.github\\") ||
      p === ".github"

  /** First dotted non-`.github` component, NULL when none (:304). */
  def hiddenComponent(p: Column): Column =
    try_element_at(filter(split(p, "/"),
      c => c =!= "" && c =!= ".github" && c.startsWith(".")), lit(1))

  /** The reason string should_exclude reports, NULL = not excluded.
    * `patterns` defaults to the engine's registered list; OracleProps
    * drives it with seeded random lists against the generated oracle. */
  def exclusionReason(p: Column,
                      patterns: Seq[(String, String)] = Patterns): Column = {
    val contains = patterns.foldRight(lit(null).cast("string"): Column) {
      case ((pat, _), acc) =>
        when(p.contains(pat), lit(s"Contains pattern match: $pat"))
          .otherwise(acc)
    }
    when(isGithubPath(p), lit(null).cast("string"))
      .when(hiddenComponent(p).isNotNull,
        concat(lit("Hidden path component: "), hiddenComponent(p)))
      .otherwise(contains)
  }

  def shouldExclude(p: Column): Column = exclusionReason(p).isNotNull

  /** should_exclude_file_in_root (mod.rs:83). */
  def shouldExcludeInRoot(absPath: Column, watchRoot: Column): Column = {
    val root = rtrim(watchRoot, "/")
    val rest = absPath.substr(length(root) + 1, lit(1 << 20))
    val rel = when(absPath === root, lit(null).cast("string"))
      .when(absPath.startsWith(root) && rest.startsWith("/"),
        regexp_replace(rest, "^/+", ""))
      .when(absPath.startsWith(root) && rest === "", lit(null).cast("string"))
      .otherwise(absPath)
    when(rel.isNull || rel === "", lit(false)).otherwise(shouldExclude(rel))
  }

  /** should_exclude_directory (mod.rs:104). */
  def shouldExcludeDirectory(name: Column): Column =
    when(name === ".github", lit(false))
      .when(name.startsWith("."), lit(true))
      .otherwise(shouldExclude(concat(name, lit("/placeholder.txt"))))

  /** The probe axis: every cascade arm plus the containment quirks. */
  def probeRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ".github/workflows/ci.yml", ".github",
      "src/.hidden/x.rs", "deep/.env",
      "a/node_modules/b.js" /* hidden? no — contains */,
      "retargeting.rs", "src/digit.gitignore", "rebuild.rs",
      "Thumbs.db", "docs/~$report.docx", "x.tmp.bak",
      "src/main.rs", "clean/path.md", "outline.md",
      "cargo/dist/pkg.whl", "id_rsa", "notes/id_ed25519.pub")
      .toDF("path")
  }

  /** §3 `*Of` form: per path — excluded + the reported reason. */
  def exclusionCheckOf(paths: DataFrame,
                       patterns: Seq[(String, String)] = Patterns): DataFrame =
    paths.select(col("path"),
        exclusionReason(col("path"), patterns).as("reason"))
      .withColumn("excluded", col("reason").isNotNull)
      .orderBy(col("path"))

  /** The probe axis unioned with the corpus tracked paths (all clean
    * of engine patterns by construction — the pass-through bulk). */
  def exclusionCheck(spark: SparkSession, dir: String): DataFrame = {
    val corpus = TrackedFilesQueries.tracked(spark, dir)
      .filter(col("watch_folder_id") === "w-3")
      .select(col("relative_path").as("path"))
    exclusionCheckOf(probeRows(spark).unionByName(corpus))
  }

  /** The oracle twin, generated from the SAME pattern list. */
  def oracleSql: String = oracleSqlFor(Patterns)

  /** Pattern-parametrized form for the randomized-config property run
    * (OracleProps): same template, any (pattern, reason) list. */
  def oracleSqlFor(patterns: Seq[(String, String)]): String = {
    val chain = patterns.foldRight("NULL") { case ((pat, _), acc) =>
      val lit = pat.replace("'", "''")
      s"CASE WHEN contains(path, '$lit') " +
        s"THEN 'Contains pattern match: $lit' ELSE $acc END"
    }
    """WITH probe(path) AS (VALUES
      |  ('.github/workflows/ci.yml'), ('.github'),
      |  ('src/.hidden/x.rs'), ('deep/.env'),
      |  ('a/node_modules/b.js'),
      |  ('retargeting.rs'), ('src/digit.gitignore'), ('rebuild.rs'),
      |  ('Thumbs.db'), ('docs/~$report.docx'), ('x.tmp.bak'),
      |  ('src/main.rs'), ('clean/path.md'), ('outline.md'),
      |  ('cargo/dist/pkg.whl'), ('id_rsa'), ('notes/id_ed25519.pub')),
      |corpus AS (
      |  SELECT ['src','lib','docs','tests'][((doc_id // 20) % 4) + 1]
      |    || '/f' || (doc_id // 20) || '.'
      |    || ['rs','md','py','ts','go'][((doc_id // 20) % 5) + 1] AS path
      |  FROM documents WHERE source = 'src3'),
      |allp AS (SELECT path FROM probe UNION ALL SELECT path FROM corpus),
      |res AS (
      |  SELECT path,
      |    CASE
      |      WHEN starts_with(path, '.github/') OR starts_with(path, '.github\')
      |        OR contains(path, '/.github/') OR contains(path, '\.github\')
      |        OR path = '.github' THEN NULL
      |      WHEN len(list_filter(string_split(path, '/'),
      |          x -> x <> '' AND x <> '.github'
      |            AND starts_with(x, '.'))) > 0
      |        THEN 'Hidden path component: ' ||
      |          list_filter(string_split(path, '/'),
      |            x -> x <> '' AND x <> '.github'
      |              AND starts_with(x, '.'))[1]
      |      ELSE REASON_CHAIN END AS reason
      |  FROM allp)
      |SELECT path, reason, reason IS NOT NULL AS excluded
      |FROM res ORDER BY path""".stripMargin
      .replace("REASON_CHAIN", chain)
  }
}
