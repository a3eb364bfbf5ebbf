package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

import graft.Tables

/** Monorepo component detection — workspace-manifest parsing plus
  * longest-prefix file assignment (component_detection/detection.rs:14
  * `detect_components`, `:100 parse_cargo_members`, `:161
  * detect_npm_workspace`, `:266 detect_from_directories`, `:325
  * `assign_component`).
  *
  * Precedence (detection.rs:14): Cargo workspace members first, npm
  * workspaces inserted only for ids Cargo didn't claim, top-level
  * directory fallback only when neither manifest yielded components.
  *
  * The reference resolves npm glob members (a `packages` dir wildcard)
  * and the directory
  * fallback with fs::read_dir; the batch twin derives "subdirectory of
  * X" from the corpus paths themselves — a segment is a directory iff
  * some file lies deeper than it. Manifest CONTENT is parsed with real
  * column expressions (locate/substring chains mirroring the Rust
  * scanner), not pre-parsed fixtures.
  *
  * Relational shape: manifests and the component table are tenant-axis
  * tiny; the only corpus-sized work is the final assignment join —
  * components BROADCAST, one scan, rank-1 window per file keyed by
  * (doc), so shuffle ∝ matched (file, component) pairs.
  */
object ComponentDetection {

  /** Directories the fallback skips (detection.rs:250 IGNORED_DIRS). */
  val ignoredDirs: Seq[String] = Seq(".git", ".github", ".vscode", ".idea",
    "node_modules", "target", "dist", "build", ".taskmaster", ".claude",
    ".serena", "tmp")

  /** path_to_component_id (detection.rs:304): trim '/' both ends, then
    * '/' → '.' (`daemon/core` → `daemon.core`). */
  def pathToComponentId(p: Column): Column =
    regexp_replace(regexp_replace(p, "^/+|/+$", ""), "/", ".")

  /** parse_cargo_members (detection.rs:100) as a column pipeline over a
    * frame holding `content`: scan to `[workspace]`, then `members`,
    * take the first `[...]` span, strip `#` line comments, extract
    * quoted strings. The reference toggles one quote state across both
    * quote kinds; this twin extracts double-quoted then single-quoted
    * matches (manifests mix kinds only pathologically — the reference's
    * own fixtures and real Cargo.tomls use one kind per array).
    */
  def withCargoMembers(manifests: DataFrame, out: String = "members"): DataFrame =
    manifests
      .withColumn("ws_pos", locate("[workspace]", col("content")))
      .withColumn("after_ws",
        expr("CASE WHEN ws_pos > 0 THEN substring(content, ws_pos) ELSE '' END"))
      .withColumn("mem_pos", locate("members", col("after_ws")))
      .withColumn("after_mem",
        expr("CASE WHEN mem_pos > 0 THEN substring(after_ws, mem_pos) ELSE '' END"))
      .withColumn("b_start", locate("[", col("after_mem")))
      .withColumn("b_tail", expr("substring(after_mem, b_start + 1)"))
      .withColumn("b_end", locate("]", col("b_tail")))
      .withColumn("arr_body",
        expr("CASE WHEN b_start > 0 AND b_end > 0 THEN substring(b_tail, 1, b_end - 1) ELSE '' END"))
      .withColumn("cleaned", array_join(
        transform(split(col("arr_body"), "\n"), l => substring_index(l, "#", 1)), "\n"))
      .withColumn(out, filter(
        concat(regexp_extract_all(col("cleaned"), lit("\"([^\"]*)\""), lit(1)),
          regexp_extract_all(col("cleaned"), lit("'([^']*)'"), lit(1))),
        m => m =!= ""))
      .drop("ws_pos", "after_ws", "mem_pos", "after_mem", "b_start", "b_tail",
        "b_end", "arr_body", "cleaned")

  /** extract_npm_workspace_paths (detection.rs:229): `workspaces` as an
    * array, else `workspaces.packages`. */
  def npmWorkspacePaths(content: Column): Column = {
    val arr = from_json(get_json_object(content, "$.workspaces"), ArrayType(StringType))
    val pkg = from_json(get_json_object(content, "$.workspaces.packages"), ArrayType(StringType))
    coalesce(arr, pkg, array())
  }

  /** detect_components over (tenant_id, filename, content) manifests and
    * (tenant_id, rel_path) files: returns (tenant_id, component_id,
    * base_path, source) with the reference's cargo > npm > directory
    * precedence.
    */
  def detectComponentsOf(manifests: DataFrame, files: DataFrame): DataFrame = {
    val cargo = withCargoMembers(manifests.filter(col("filename") === "Cargo.toml"))
      .select(col("tenant_id"), explode(col("members")).as("base_path"))
      .select(col("tenant_id"), pathToComponentId(col("base_path")).as("component_id"),
        col("base_path"), lit("cargo").as("source"))

    val npmMembers = manifests.filter(col("filename") === "package.json")
      .select(col("tenant_id"), explode(npmWorkspacePaths(col("content"))).as("member"))
    val npmLiteral = npmMembers.filter(!col("member").contains("*"))
      .select(col("tenant_id"), col("member").as("base_path"))
    // glob resolution: base/<seg> is a component iff a file lies deeper
    // (the path-world twin of read_dir's is_dir check)
    val npmGlobBase = npmMembers.filter(col("member").contains("*"))
      .select(col("tenant_id"),
        regexp_replace(substring_index(col("member"), "*", 1), "/+$", "").as("base"))
    val npmGlob = npmGlobBase.join(files, Seq("tenant_id"))
      .withColumn("tail", when(col("base") === "", col("rel_path"))
        .otherwise(when(col("rel_path").startsWith(concat(col("base"), lit("/"))),
          expr("substring(rel_path, length(base) + 2)"))))
      .filter(col("tail").isNotNull && size(split(col("tail"), "/")) >= 2)
      .select(col("tenant_id"),
        when(col("base") === "", element_at(split(col("tail"), "/"), 1))
          .otherwise(concat(col("base"), lit("/"), element_at(split(col("tail"), "/"), 1)))
          .as("base_path"))
      .distinct()
    val npm = npmLiteral.union(npmGlob)
      .select(col("tenant_id"), pathToComponentId(col("base_path")).as("component_id"),
        col("base_path"), lit("npm").as("source"))
      // or_insert semantics: npm only fills ids Cargo didn't claim
      .join(cargo.select(col("tenant_id"), col("component_id")),
        Seq("tenant_id", "component_id"), "left_anti")

    val manifested = cargo.select(col("tenant_id"))
      .union(npm.select(col("tenant_id"))).distinct()
    val fallback = files
      .join(manifested, Seq("tenant_id"), "left_anti")
      .filter(size(split(col("rel_path"), "/")) >= 2)
      .select(col("tenant_id"), element_at(split(col("rel_path"), "/"), 1).as("base_path"))
      .filter(!col("base_path").startsWith(".") && !col("base_path").isInCollection(ignoredDirs))
      .distinct()
      .select(col("tenant_id"), col("base_path").as("component_id"),
        col("base_path"), lit("directory").as("source"))

    cargo.unionByName(npm).unionByName(fallback)
  }

  /** assign_component (detection.rs:325): the longest matching
    * base_path wins (ties to the lexicographically smallest); files
    * matching no component keep a null id. Components are workspace
    * members — config-sized per tenant — so they ride as ONE broadcast
    * array per tenant and the longest-match pick runs map-side inside
    * the file scan (filter + sort_array HOFs), with no per-file
    * join-explosion, no window shuffle, and no second join. */
  def assignComponents(files: DataFrame, components: DataFrame): DataFrame = {
    val perTenant = components.groupBy(col("tenant_id"))
      .agg(collect_list(struct(col("base_path"), col("component_id"),
        col("source"))).as("comps"))
    files.join(broadcast(perTenant), Seq("tenant_id"), "left")
      .withColumn("best",
        try_element_at(
          sort_array(transform(
            filter(coalesce(col("comps"),
              expr("CAST(array() AS array<struct<base_path:string,component_id:string,source:string>>)")),
              c => col("rel_path") === c("base_path") ||
                col("rel_path").startsWith(concat(c("base_path"), lit("/")))),
            c => struct((-length(c("base_path"))).as("k"),
              c("base_path").as("bp"), c("component_id").as("component_id"),
              c("source").as("source")))),
          lit(1)))
      .select(col("doc_id"), col("tenant_id"), col("rel_path"),
        col("best.component_id").as("component_id"),
        col("best.source").as("source"))
  }

  /** component_detect query: tenants (= `source`, `src<n>`) cycle
    * through the three detection routes by n%3 — a Cargo workspace
    * manifest (with a commented-out member, the parser fixture's
    * shape), a package.json with a `packages` wildcard glob plus a literal
    * member (array form, or the `workspaces.packages` object form for
    * every other npm tenant), and no manifest at all (directory
    * fallback, with `dist/` exercising the ignore list). File paths
    * cycle doc_id%7 over the monorepo layout.
    */
  def componentDetect(spark: SparkSession, dir: String): DataFrame = {
    val n = expr("CAST(substring(tenant_id, 4) AS INT)")
    val paths = Seq("daemon/core/src/lib.rs", "daemon/grpc/src/server.rs",
      "cli/src/main.rs", "packages/app/index.ts", "packages/web/index.ts",
      "tools/site/build.ts", "dist/bundle.js")
    val files = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("tenant_id"))
      .withColumn("rel_path", element_at(
        array(paths.map(lit): _*), (pmod(col("doc_id"), lit(7)) + 1).cast("int")))
      .localCheckpoint()
    val cargoToml = "[workspace]\nresolver = \"2\"\nmembers = [\n" +
      "    \"daemon/core\",\n    # \"commented-out\",\n    \"daemon/grpc\",\n    \"cli\",\n]\n"
    val npmArray = """{"name": "app", "workspaces": ["packages/*", "tools/site"]}"""
    val npmObject = """{"name": "app", "workspaces": {"packages": ["packages/*", "tools/site"]}}"""
    val manifests = files.select(col("tenant_id")).distinct()
      .withColumn("nn", n)
      .withColumn("filename",
        when(pmod(col("nn"), lit(3)) === 0, "Cargo.toml")
          .when(pmod(col("nn"), lit(3)) === 1, "package.json"))
      .withColumn("content",
        when(pmod(col("nn"), lit(3)) === 0, cargoToml)
          .when(pmod(col("nn"), lit(3)) === 1,
            when(pmod(floor(col("nn") / 3).cast("int"), lit(2)) === 0, npmArray)
              .otherwise(npmObject)))
      .filter(col("filename").isNotNull)
      .select(col("tenant_id"), col("filename"), col("content"))
    // Pinned (round 16): the component table is tenant-axis tiny
    // (workspace members per project), but its DERIVATION — the
    // withColumn manifest-parser chains — collapses into a deeply
    // nested expression tree that Catalyst re-walks on every optimizer
    // pass and every AQE stage re-optimization (measured: 1.4-1.8 s of
    // pure driver `optimization` phase per execution, 0.67 s of it in
    // PruneFilters with ZERO effective rewrites, on 0.5 task-seconds
    // of actual cluster work). Checkpointing the ~400-row table
    // optimizes the parser once and leaves the final plan a
    // files ⋈ broadcast(ExistingRDD) join.
    val comps = detectComponentsOf(manifests, files).localCheckpoint()
    assignComponents(files, comps).orderBy(col("doc_id"))
  }
}
