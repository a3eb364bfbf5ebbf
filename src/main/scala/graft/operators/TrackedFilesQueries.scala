package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The MCP server's tracked-files / submodule / project-registry read
  * surface (mcp-server/src/sqlite/tracked_files/{queries,filters}.rs +
  * project_queries.rs — SQL verbatim from the TS originals per their
  * own headers):
  *
  *  - `list_tracked_files` + `count_tracked_files` with the FULL
  *    buildFilterClause option set (filters.rs:64): watch id, path
  *    prefix LIKE, file_type/language/extension equality, the
  *    include_tests=false gate, branch membership (the json_each
  *    EXISTS as array_contains), SQLite GLOB with the `**`→`*`
  *    translation quirk (:102 — GLOB `*` crosses `/`, so the
  *    translation makes `**` and `*` equivalent), component base-path
  *    OR prefixes, and the keyset `after_path` cursor.
  *  - `list_submodules` + `extract_repo_name` (queries.rs:59): the
  *    `.git`/trailing-slash trim, last `/` segment, scp-style last
  *    `:` part, empty → submodule-path-basename fallback; plus
  *    `list_project_components` as the second section of the same
  *    frame.
  *  - `list_registered_projects` + `format_available_projects_hint`
  *    (project_queries.rs:196/:73): every registered project (the #111
  *    rule — is_active NOT filtered, so a freshly-registered project
  *    is still offered) ordered last_activity_at DESC NULLS LAST with
  *    the created_at DESC tiebreak (SQLite DESC puts NULLs last; both
  *    engines pin it explicitly), container_folder = last non-empty
  *    path segment, and the retry hint naming the first 15 + `(+N
  *    more)`.
  *
  * Scale: tracked_search is one scan × a config-sized broadcast
  * scenario axis with per-scenario rank windows (shuffle ∝ matching
  * rows); the registry/submodule axes are config-sized.
  */
object TrackedFilesQueries {

  // ------------------------------------------------------------------
  // tracked_search — list_tracked_files / count_tracked_files
  // ------------------------------------------------------------------

  /** One filter-option set (ListTrackedFilesOptions). `globRe` is the
    * anchored regex both engines run, produced by [[globToRegex]] from
    * the already-`**`→`*`-translated SQLite GLOB. */
  final case class SearchScenario(
      name: String, watch: String, path: Option[String] = None,
      fileType: Option[String] = None, language: Option[String] = None,
      extension: Option[String] = None, includeTests: Boolean = true,
      branch: Option[String] = None, glob: Option[String] = None,
      componentBasePaths: Seq[String] = Nil, afterPath: Option[String] = None,
      limit: Int = 500)

  /** SQLite GLOB → anchored regex: `*` any run (INCLUDING `/` — GLOB
    * has no path semantics), `?` one char, `[...]`/`[!...]` classes
    * kept, everything else literal. Applied AFTER the TS layer's
    * `**`→`*` rewrite. */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '[' =>
          val end = glob.indexOf(']', i + 1)
          if (end < 0) { sb.append("\\["); }
          else {
            val body0 = glob.substring(i + 1, end)
            val body = if (body0.startsWith("!")) "^" + body0.drop(1) else body0
            sb.append("[").append(body).append("]")
            i = end
          }
        case c if "\\.^$+{}()|".indexOf(c) >= 0 => sb.append("\\").append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append("$").toString
  }

  /** The reference scenario set — every buildFilterClause arm live. */
  val Scenarios: Seq[SearchScenario] = Seq(
    SearchScenario("bare", "w-3"),
    SearchScenario("path_no_tests", "w-3", path = Some("src"),
      includeTests = false),
    SearchScenario("lang_ext", "w-4", language = Some("rust"),
      extension = Some("rs")),
    SearchScenario("branch", "w-3", branch = Some("dev")),
    SearchScenario("glob", "w-3", glob = Some("**/f1*.rs")),
    SearchScenario("glob_q", "w-3", glob = Some("src/f?.rs")),
    SearchScenario("glob_class", "w-3", glob = Some("tests/f[0-9].py")),
    SearchScenario("glob_neg", "w-3", glob = Some("lib/f[!2-9].md")),
    SearchScenario("components_cursor", "w-3",
      componentBasePaths = Seq("src", "lib"), afterPath = Some("lib/f3"),
      limit = 20),
    SearchScenario("file_type", "w-6", fileType = Some("docs")))

  /** The tracked_files synthesis: the TuiViews relative-path/branch
    * conventions plus the classification columns the MCP filters read
    * (file_type/language/extension from the path's extension, is_test
    * from the tests/ directory). */
  def tracked(spark: SparkSession, dir: String): DataFrame = {
    val idx = floor(col("doc_id") / 20).cast("long")
    val ext = element_at(array(lit("rs"), lit("md"), lit("py"), lit("ts"),
      lit("go")), (pmod(idx, lit(5)) + 1).cast("int"))
    Tables.documents(spark, dir).select(
      concat(lit("w-"), expr("CAST(substring(source, 4) AS INT)"))
        .as("watch_folder_id"),
      col("doc_id").as("file_id"),
      concat(
        element_at(array(lit("src"), lit("lib"), lit("docs"), lit("tests")),
          (pmod(idx, lit(4)) + 1).cast("int")),
        lit("/f"), idx, lit("."), ext).as("relative_path"),
      when(ext === "md", lit("docs")).otherwise(lit("code")).as("file_type"),
      element_at(array(lit("rust"), lit("markdown"), lit("python"),
        lit("typescript"), lit("go")), (pmod(idx, lit(5)) + 1).cast("int"))
        .as("language"),
      ext.as("extension"),
      (pmod(idx, lit(4)) === 3).as("is_test"),
      when(pmod(idx, lit(13)) === 0, array().cast("array<string>"))
        .otherwise(concat(
          array(when(pmod(idx, lit(10)) < 6, lit("main"))
            .otherwise(concat(lit("b"), pmod(idx, lit(4))))),
          when(pmod(idx, lit(5)) === 0, array(lit("dev")))
            .otherwise(array().cast("array<string>"))))
        .as("branches"))
  }

  /** §3 `*Of` form: every scenario's list (rank ≤ limit by
    * relative_path ASC) and count (the pre-limit `total`) in one plan. */
  def trackedSearchOf(tracked: DataFrame,
                      scenarios: Seq[SearchScenario]): DataFrame = {
    val frames = scenarios.map { s =>
      var f = tracked.filter(col("watch_folder_id") === s.watch)
      s.path.foreach(p => f = f.filter(col("relative_path").like(p + "/%")))
      s.fileType.foreach(t => f = f.filter(col("file_type") === t))
      s.language.foreach(l => f = f.filter(col("language") === l))
      s.extension.foreach(e => f = f.filter(col("extension") === e))
      if (!s.includeTests) f = f.filter(!col("is_test"))
      s.branch.foreach(b => f = f.filter(array_contains(col("branches"), b)))
      s.glob.foreach(g =>
        f = f.filter(col("relative_path").rlike(globToRegex(g.replace("**", "*")))))
      if (s.componentBasePaths.nonEmpty) {
        val arms = s.componentBasePaths.map(bp =>
          col("relative_path") === bp || col("relative_path").like(bp + "/%"))
        f = f.filter(arms.reduce(_ || _))
      }
      s.afterPath.foreach(a => f = f.filter(col("relative_path") > a))
      f.select(lit(s.name).as("scenario"), col("relative_path"),
          col("file_type"), col("language"), col("extension"), col("is_test"))
        .withColumn("total", count(lit(1)).over(
          Window.partitionBy(lit(s.name))))
        .withColumn("rk", row_number().over(
          Window.partitionBy(lit(s.name)).orderBy(col("relative_path"))))
        .filter(col("rk") <= s.limit)
    }
    frames.reduce(_ unionByName _)
      .orderBy(col("scenario"), col("relative_path"))
  }

  def trackedSearch(spark: SparkSession, dir: String): DataFrame =
    trackedSearchOf(tracked(spark, dir), Scenarios)

  // ------------------------------------------------------------------
  // submodule_repos — list_submodules + list_project_components
  // ------------------------------------------------------------------

  /** extract_repo_name (queries.rs:59) in the column domain. */
  def repoName(url: Column, submodulePath: Column): Column = {
    // trim_end_matches strips ALL trailing repetitions of its pattern.
    val cleaned = regexp_replace(regexp_replace(url, "/+$", ""),
      "(\\.git)+$", "")
    val lastSeg = element_at(split(cleaned, "/"), -1)
    val colonPart = element_at(split(lastSeg, ":"), -1)
    val fromUrl = when(url.isNotNull && colonPart =!= "", colonPart)
    coalesce(fromUrl,
      coalesce(try_element_at(filter(split(submodulePath, "/"),
        c => c =!= ""), lit(-1)), submodulePath))
  }

  /** The submodule + component registry rows (watch_folders rows with
    * parent_watch_id set, and the project_components table). Config-
    * sized daemon state — a literal axis, with URL variants covering
    * every extract_repo_name branch. */
  def submoduleRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("w-3", "vendor/lib-a", "https://github.com/acme/lib-a.git"),
      ("w-3", "vendor/lib-b", "git@github.com:acme/lib-b.git"),
      ("w-3", "vendor/lib-c", "https://host/group/sub/lib-c/"),
      ("w-3", "deps/fallback", null),
      ("w-4", "x/y", "git@host:lib-d"),
      ("w-4", "tools/helper", "https://h/u/r.git.git"),
      ("w-4", "odd", "x:"))
      .toDF("parent_watch_id", "submodule_path", "git_remote_url")
  }

  def componentRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("w-3", "core", "src/core", "cargo"),
      ("w-3", "cli", "src/cli", "cargo"),
      ("w-4", "web", "packages/web", "npm"),
      ("w-4", "api", "services/api", "directory"))
      .toDF("watch_folder_id", "component_name", "base_path", "source")
  }

  /** §3 `*Of` form: submodules (ORDER BY submodule_path per parent,
    * repo names resolved) and components (ORDER BY component_name) as
    * one two-section frame. */
  def submoduleReposOf(submodules: DataFrame,
                       components: DataFrame): DataFrame = {
    val subs = submodules.select(
      lit("submodule").as("section"),
      col("parent_watch_id").as("watch_id"),
      repoName(col("git_remote_url"), col("submodule_path")).as("name"),
      col("submodule_path").as("path"),
      lit(null).cast("string").as("source"))
    val comps = components.select(
      lit("component").as("section"),
      col("watch_folder_id").as("watch_id"),
      col("component_name").as("name"),
      col("base_path").as("path"),
      col("source"))
    subs.unionByName(comps)
      .orderBy(col("section"), col("watch_id"), col("path"), col("name"))
  }

  def submoduleRepos(spark: SparkSession, dir: String): DataFrame =
    submoduleReposOf(submoduleRows(spark), componentRows(spark))

  // ------------------------------------------------------------------
  // project_registry — list_registered_projects + the #111 hint
  // ------------------------------------------------------------------

  /** The registry extended with the activity timestamps the project
    * queries order by (ISO date strings, as SQLite stores TEXT — the
    * lexicographic order IS the chronological order). */
  def registeredProjects(spark: SparkSession, dir: String): DataFrame = {
    val wn = expr("CAST(substring(tenant_id, 4) AS INT)")
    TuiViews.registry(spark, dir)
      .filter(col("collection") === "projects")
      .select(col("tenant_id").as("project_id"), col("path"),
        col("is_active"),
        concat(lit("2024-01-"), lpad((pmod(wn, lit(28)) + 1).cast("string"),
          2, "0")).as("created_at"),
        when(pmod(wn, lit(4)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("2024-02-"),
            lpad((pmod(wn * 3, lit(28)) + 1).cast("string"), 2, "0")))
          .as("last_activity_at"))
  }

  /** §3 `*Of` form: the registered rows (rk = the SQL order
    * last_activity_at DESC NULLS LAST, created_at DESC — pinned with a
    * project_id tiebreak since the synthesis reuses dates) plus the
    * single `hint` row (format_available_projects_hint — first MAX=15
    * in the same order, `(+N more)` past it, or the empty-registry
    * register guidance). */
  def projectRegistryOf(projects: DataFrame): DataFrame = {
    val ord = Window.orderBy(col("last_activity_at").desc_nulls_last,
      col("created_at").desc, col("project_id"))
    val rows = projects
      .withColumn("rk", row_number().over(ord))
      .select(lit("project").as("section"), col("rk"),
        col("project_id"), col("path").as("project_path"),
        coalesce(try_element_at(filter(split(col("path"), "/"),
          c => c =!= ""), lit(-1)), col("path")).as("container_folder"),
        col("is_active"), col("created_at"), col("last_activity_at"),
        lit(null).cast("string").as("hint"))
    val hint = rows.agg(
        count(lit(1)).as("n"),
        concat_ws(", ", slice(transform(
          array_sort(collect_list(struct(col("rk"),
            concat(col("container_folder"), lit(" (projectId: "),
              col("project_id"), lit(")")).as("s")))),
          x => x.getField("s")), 1, 15)).as("shown"))
      .select(lit("hint").as("section"), lit(0).as("rk"),
        lit(null).cast("string").as("project_id"),
        lit(null).cast("string").as("project_path"),
        lit(null).cast("string").as("container_folder"),
        // false, not NULL: a NULL boolean round-trips as NaN through
        // pandas and breaks the gate's equality on a non-value row.
        lit(false).as("is_active"),
        lit(null).cast("string").as("created_at"),
        lit(null).cast("string").as("last_activity_at"),
        when(col("n") === 0,
          lit(" No projects are registered yet — register one with the " +
            "'store' tool (type:\"project\")."))
          .otherwise(concat(
            lit(" Available projects — retry with projectId=<id>: "),
            col("shown"),
            when(col("n") > 15, concat(lit(" (+"), col("n") - 15,
              lit(" more)"))).otherwise(lit("")))).as("hint"))
    rows.unionByName(hint).orderBy(col("section"), col("rk"))
  }

  def projectRegistry(spark: SparkSession, dir: String): DataFrame =
    projectRegistryOf(registeredProjects(spark, dir))
}
