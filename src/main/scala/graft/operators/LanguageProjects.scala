package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** `wqm language projects` (cli/commands/language/projects.rs) — per
  * (project, language) file counts over each project's tree:
  *
  *  - The walk prunes directories by the shared CLI exclusion rules
  *    (common/src/exclusion.rs:44 should_exclude_directory): `.github`
  *    is explicitly whitelisted, any other hidden directory is
  *    skipped, and the critical build/dependency set (:21 — target,
  *    node_modules, __pycache__, dist, build, vendor) is skipped. In
  *    the column domain that is a forall over the path's DIRECTORY
  *    components (projects.rs:199 walks directories; file names are
  *    only consulted by the extension map).
  *  - Files count under the registry-derived extension → language map
  *    (helpers.rs:40 build_extension_map — lowercased, first-wins;
  *    here the shared content-classification registry table,
  *    [[FileClassification.extensionTable]], restricted to its
  *    language-bearing rows). Unmapped extensions don't count
  *    (projects.rs:224).
  *  - Project display (projects.rs:232 abbreviate_project): the
  *    project name when non-empty, else the root's last path
  *    component.
  *
  * The reference scans the filesystem per project (environment I/O);
  * the batch twin runs the same rules over the tracked path corpus —
  * map-side classify + one groupBy, shuffle ∝ (project, language).
  */
object LanguageProjects {

  private val criticalDirs =
    Seq("target", "node_modules", "__pycache__", "dist", "build", "vendor")

  /** should_exclude_directory (exclusion.rs:44) in the column domain. */
  def dirExcluded(d: Column): Column =
    when(d === ".github", lit(false))
      .when(d.startsWith("."), lit(true))
      .otherwise(d.isInCollection(criticalDirs))

  /** §3 `*Of` form over (project_name, root, rel_path) file rows. */
  def languageProjectsOf(files: DataFrame): DataFrame = {
    val extLang = FileClassification.extensionTable
      .collect { case (ext, Some(lang), _, _) => (ext, lang) }
    val langMap = map(extLang.flatMap { case (e, l) => Seq(lit(e), lit(l)) }: _*)
    val comps = split(col("rel_path"), "/")
    val dirs = slice(comps, lit(1), size(comps) - 1)
    val fname = lower(element_at(comps, -1))
    // Compound d.ts-family keys first, like the classifier.
    val ext = when(fname.endsWith(".d.ts"), lit("d.ts"))
      .when(fname.endsWith(".d.mts"), lit("d.mts"))
      .when(fname.endsWith(".d.cts"), lit("d.cts"))
      .otherwise(regexp_extract(fname, "\\.([^.]+)$", 1))
    files
      .filter(!exists(dirs, dirExcluded))
      .withColumn("language", element_at(langMap, ext))
      .filter(col("language").isNotNull)
      .groupBy(
        when(col("project_name") =!= "", col("project_name"))
          .otherwise(element_at(filter(reverse(split(col("root"), "/")),
            s => s =!= ""), 1)).as("project"),
        col("language"))
      .agg(count(lit(1)).as("file_count"))
      .orderBy(col("project"), col("language"))
  }

  /** language projects over a synthetic per-tenant tree: directories
    * cycle the exclusion arms (src / lib / node_modules / .git /
    * .github / target), file names cycle mapped and unmapped
    * extensions, and every third project has an empty display name
    * (abbreviation fallback). Residues ride the per-tenant file index
    * (doc_id div 20 — doc_id itself is constant mod 20 per tenant). */
  def languageProjects(spark: SparkSession, dir: String): DataFrame = {
    val idx = floor(col("doc_id") / 20).cast("long")
    val dirNames = Seq("src", "lib", "node_modules", ".git", ".github", "target")
    val fileNames = Seq("main.rs", "util.py", "index.ts", "app.js",
      "notes.md", "data.json", "README", "mod.rs")
    val wn = expr("CAST(substring(source, 4) AS INT)")
    val files = Tables.documents(spark, dir).select(
      when(pmod(wn, lit(3)) === 0, lit(""))
        .otherwise(concat(lit("proj"), wn)).as("project_name"),
      concat(lit("/work/proj-"), wn).as("root"),
      concat(
        element_at(array(dirNames.map(lit): _*), (pmod(idx, lit(6)) + 1).cast("int")),
        lit("/"),
        element_at(array(fileNames.map(lit): _*), (pmod(idx, lit(8)) + 1).cast("int")))
        .as("rel_path"))
    languageProjectsOf(files)
  }
}
