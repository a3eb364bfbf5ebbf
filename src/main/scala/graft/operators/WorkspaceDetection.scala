package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Workspace detection — the grouping module's Cargo / npm / Go
  * workspace discovery (grouping/workspace/detection.rs:
  * detect_cargo_workspace / detect_npm_workspace / detect_go_workspace
  * + resolve_workspace_members + generate_workspace_id).
  *
  * The reference walks the filesystem up from a project dir and
  * resolves member patterns with glob + is_dir checks; the batch twin
  * takes the manifest frame as input (the walk-up is environment I/O)
  * and resolves members against the corpus paths — a member directory
  * exists iff some file lies deeper than it, the same convention
  * component detection uses. Workspace ids are the reference's
  * `ws:<sha256(root)[..12]>` (detection.rs:249).
  *
  * Relational shape: manifests are tenant-axis tiny; resolution is one
  * join of the exploded pattern list against the file frame keyed by
  * tenant — shuffle ∝ matched (pattern, file) prefixes.
  */
object WorkspaceDetection {

  /** generate_workspace_id (detection.rs:249): `ws:` + 12 hex of
    * sha256(root path). */
  def workspaceId(root: Column): Column =
    concat(lit("ws:"), substring(sha2(root, 256), 1, 12))

  /** parse_go_workspace (detection.rs:141): members of `use ( ... )`
    * blocks (skipping `//` comments) plus single-line `use <path>`
    * directives outside blocks. */
  def goWorkMembers(manifests: DataFrame): DataFrame = {
    val w = Window.partitionBy("tenant_id", "filename").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lines = manifests
      .select(col("tenant_id"), col("root"), col("filename"),
        posexplode(split(col("content"), "\n")))
      .withColumn("t", DependencyGrouping.wsTrim(col("col")))
      .withColumn("marker",
        when(col("t") === "use (", 1).when(col("t") === ")", 0))
      .withColumn("state", last(col("marker"), ignoreNulls = true).over(w))
    val block = lines
      .filter(col("state") === 1 && col("marker").isNull &&
        col("t") =!= "" && !col("t").startsWith("//"))
      .select(col("tenant_id"), col("root"), col("t").as("pattern"))
    val single = lines
      .filter((col("state").isNull || col("state") =!= 1) && col("marker").isNull &&
        col("t").startsWith("use "))
      .withColumn("pattern",
        DependencyGrouping.wsTrim(expr("substring(t, length('use ') + 1)")))
      .filter(col("pattern") =!= "")
      .select(col("tenant_id"), col("root"), col("pattern"))
    block.unionByName(single)
  }

  /** Detect workspaces over (tenant_id, root, filename, content)
    * manifests and (tenant_id, rel_path) files: one row per resolved
    * member, with the reference's workspace id and type labels.
    */
  def detectWorkspacesOf(manifests: DataFrame, files: DataFrame): DataFrame = {
    val cargo = ComponentDetection
      .withCargoMembers(manifests.filter(col("filename") === "Cargo.toml"))
      .select(col("tenant_id"), col("root"), explode(col("members")).as("pattern"))
      .withColumn("workspace_type", lit("cargo"))
    val npm = manifests.filter(col("filename") === "package.json")
      .select(col("tenant_id"), col("root"),
        explode(ComponentDetection.npmWorkspacePaths(col("content"))).as("pattern"))
      .withColumn("workspace_type", lit("npm"))
    val go = goWorkMembers(manifests.filter(col("filename") === "go.work"))
      .withColumn("workspace_type", lit("go"))
    val patterns = cargo.unionByName(npm).unionByName(go)
      .withColumn("pattern", regexp_replace(col("pattern"), "^\\./", ""))

    // glob members resolve to subdirectories that really hold files
    val glob = patterns.filter(col("pattern").contains("*"))
      .withColumn("base",
        regexp_replace(substring_index(col("pattern"), "*", 1), "/+$", ""))
      .join(files, Seq("tenant_id"))
      .withColumn("tail", when(col("base") === "", col("rel_path"))
        .otherwise(when(col("rel_path").startsWith(concat(col("base"), lit("/"))),
          expr("substring(rel_path, length(base) + 2)"))))
      .filter(col("tail").isNotNull && size(split(col("tail"), "/")) >= 2)
      .select(col("tenant_id"), col("root"), col("workspace_type"),
        when(col("base") === "", element_at(split(col("tail"), "/"), 1))
          .otherwise(concat(col("base"), lit("/"), element_at(split(col("tail"), "/"), 1)))
          .as("member"))
      .distinct()
    // literal members survive only when the directory exists (a file
    // lies deeper — resolve_workspace_members' is_dir check)
    val exact = patterns.filter(!col("pattern").contains("*"))
      .join(files, Seq("tenant_id"))
      .filter(col("rel_path").startsWith(concat(col("pattern"), lit("/"))))
      .select(col("tenant_id"), col("root"), col("workspace_type"),
        col("pattern").as("member"))
      .distinct()

    glob.unionByName(exact)
      .select(col("tenant_id"), workspaceId(col("root")).as("workspace_id"),
        col("workspace_type"),
        concat(col("root"), lit("/"), col("member")).as("member_path"))
      .orderBy(col("tenant_id"), col("member_path"))
  }

  /** workspace_detect query: tenants cycle the three workspace kinds by
    * n%3 — a Cargo workspace with a GLOB member (`daemon/STAR` — the
    * workspace parser's glob resolution) plus a literal, a package.json
    * (array / `workspaces.packages` object alternating), and a go.work
    * with a use-block (comment line skipped) plus a single-line use —
    * over the monorepo path corpus.
    */
  def workspaceDetect(spark: SparkSession, dir: String): DataFrame = {
    val n = expr("CAST(substring(tenant_id, 4) AS INT)")
    val paths = Seq("daemon/core/src/lib.rs", "daemon/grpc/src/server.rs",
      "cli/src/main.rs", "packages/app/index.ts", "packages/web/index.ts",
      "tools/site/build.ts", "dist/bundle.js")
    val files = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("tenant_id"))
      .withColumn("rel_path", element_at(
        array(paths.map(lit): _*), (pmod(col("doc_id"), lit(7)) + 1).cast("int")))
      .select(col("tenant_id"), col("rel_path"))
      .localCheckpoint()
    val cargoToml = "[workspace]\nresolver = \"2\"\nmembers = [\n" +
      "    \"daemon/*\",\n    # \"commented-out\",\n    \"cli\",\n]\n"
    val npmArray = """{"name": "app", "workspaces": ["packages/*", "tools/site"]}"""
    val npmObject = """{"name": "app", "workspaces": {"packages": ["packages/*", "tools/site"]}}"""
    val goWork = "go 1.21\n\nuse (\n\t./daemon/core\n\t// ./ignored\n\t./daemon/grpc\n)\n\nuse ./cli\n"
    val kind = pmod(n, lit(3))
    val manifests = files.select(col("tenant_id")).distinct()
      .withColumn("root", concat(lit("/proj/"), col("tenant_id")))
      .withColumn("filename",
        when(kind === 0, "Cargo.toml")
          .when(kind === 1, "package.json")
          .otherwise("go.work"))
      .withColumn("content",
        when(kind === 0, cargoToml)
          .when(kind === 1,
            when(pmod(floor(n / lit(3)).cast("int"), lit(2)) === 0, npmArray)
              .otherwise(npmObject))
          .otherwise(goWork))
    detectWorkspacesOf(manifests, files)
  }
}
