package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

import graft.Tables

/** Dependency-manifest grouping — projects grouped by shared
  * dependencies (grouping/dependency.rs: `:59 parse_dependencies` over
  * Cargo.toml / package.json / pyproject.toml / requirements.txt /
  * go.mod, `:264 jaccard_similarity`, `:335
  * compute_dependency_groups`). Unlike tag_affinity's transitive
  * components, the reference creates one group PER QUALIFYING PAIR
  * with the deterministic id `dep:<min>+<max>` and confidence = the
  * pair's similarity.
  *
  * The manifest parsers are real column pipelines over the manifest
  * text (posexplode + a last-seen-section-header window for the
  * line-oriented TOML/go.mod formats, from_json for package.json) —
  * not pre-parsed fixtures. The manifest axis is one row per project,
  * so all parsing is tenant-axis tiny; the only corpus-shaped work is
  * |A∩B|: ONE dependency-name-keyed self-join (shuffle ∝ shared-dep
  * pairs, never tenants²·|deps|), with Jaccard as exact integer
  * rationals like tag_affinity.
  */
object DependencyGrouping {

  /** The manifest filenames the reference recognizes (dependency.rs:21). */
  val dependencyFiles: Seq[String] =
    Seq("Cargo.toml", "package.json", "pyproject.toml", "requirements.txt", "go.mod")

  /** Rust str::trim twin: Spark's trim() strips only 0x20 spaces, but
    * manifest lines are tab-indented (go.mod's require block) — strip
    * all whitespace like the reference does. */
  def wsTrim(c: Column): Column = regexp_replace(c, "^\\s+|\\s+$", "")

  /** normalize_python_dep (dependency.rs:220): cut at the first
    * version-spec/extras char, trim, lowercase, underscores→hyphens;
    * empty → null.
    */
  def normalizePythonDep(dep: Column): Column = {
    val name = replace(lower(trim(regexp_extract(dep, "^([^><=~!\\[;]*)", 1))),
      lit("_"), lit("-"))
    when(name =!= "", name)
  }

  /** Per-line frame with the reference's scanner state: `t` the trimmed
    * line and `section` the last seen `[...]` header at or above it. */
  private def tomlLines(manifests: DataFrame): DataFrame = {
    val w = Window.partitionBy("tenant_id", "filename").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifests
      .select(col("tenant_id"), col("filename"),
        posexplode(split(col("content"), "\n")))
      .withColumn("t", wsTrim(col("col")))
      .withColumn("section",
        last(when(col("t").startsWith("["), col("t")), ignoreNulls = true).over(w))
  }

  /** parse_cargo_toml (dependency.rs:71): `name = ...` lines inside
    * [dependencies]/[dev-dependencies]/[build-dependencies] (and their
    * dotted-table forms). */
  def parseCargoToml(manifests: DataFrame): DataFrame = {
    val inDeps = col("section").isin("[dependencies]", "[dev-dependencies]",
        "[build-dependencies]") ||
      col("section").startsWith("[dependencies.") ||
      col("section").startsWith("[dev-dependencies.") ||
      col("section").startsWith("[build-dependencies.")
    tomlLines(manifests)
      .filter(!col("t").startsWith("[") && inDeps && col("t").contains("="))
      .withColumn("dep",
        regexp_replace(trim(substring_index(col("t"), "=", 1)), "^\"+|\"+$", ""))
      .filter(col("dep") =!= "" && !col("dep").contains(" "))
      .select(col("tenant_id"), col("dep").as("dependency_name"),
        lit("rust").as("ecosystem"))
  }

  /** parse_package_json (dependency.rs:106): keys of dependencies /
    * devDependencies / peerDependencies. */
  def parsePackageJson(manifests: DataFrame): DataFrame = {
    def keysOf(sec: String) = coalesce(map_keys(
      from_json(get_json_object(col("content"), s"$$.$sec"),
        MapType(StringType, StringType))), array())
    manifests
      .select(col("tenant_id"),
        explode(concat(keysOf("dependencies"), keysOf("devDependencies"),
          keysOf("peerDependencies"))).as("dependency_name"))
      .withColumn("ecosystem", lit("npm"))
  }

  /** parse_pyproject_toml (dependency.rs:126): the `dependencies = [`
    * list — lines between the opener and `]` cleaned of
    * commas/quotes, plus inline quoted strings on the opener line
    * itself — normalized. */
  def parsePyprojectToml(manifests: DataFrame): DataFrame = {
    val w = Window.partitionBy("tenant_id", "filename").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lines = manifests
      .select(col("tenant_id"), col("filename"),
        posexplode(split(col("content"), "\n")))
      .withColumn("t", wsTrim(col("col")))
      .withColumn("marker",
        when(col("t").startsWith("dependencies = ["), 1)
          .when(col("t") === "]", 0))
      .withColumn("state", last(col("marker"), ignoreNulls = true).over(w))
    val multiline = lines
      .filter(col("state") === 1 && col("marker").isNull)
      .withColumn("cleaned", trim(regexp_replace(regexp_replace(
        regexp_replace(col("t"), "^,+|,+$", ""), "^\"+|\"+$", ""), "^'+|'+$", "")))
      .select(col("tenant_id"), normalizePythonDep(col("cleaned")).as("dependency_name"))
    val inline = lines
      .filter(col("marker") === 1)
      .withColumn("rest", expr("substring(t, length('dependencies = [') + 1)"))
      .select(col("tenant_id"), explode(concat(
        regexp_extract_all(col("rest"), lit("\"([^\"]*)\""), lit(1)),
        regexp_extract_all(col("rest"), lit("'([^']*)'"), lit(1)))).as("raw"))
      .select(col("tenant_id"), normalizePythonDep(col("raw")).as("dependency_name"))
    multiline.union(inline)
      .filter(col("dependency_name").isNotNull)
      .withColumn("ecosystem", lit("python"))
  }

  /** parse_requirements_txt (dependency.rs:166): every line that is not
    * empty / a comment / an option flag, normalized. */
  def parseRequirementsTxt(manifests: DataFrame): DataFrame =
    manifests
      .select(col("tenant_id"), explode(split(col("content"), "\n")).as("line"))
      .withColumn("t", wsTrim(col("line")))
      .filter(col("t") =!= "" && !col("t").startsWith("#") && !col("t").startsWith("-"))
      .select(col("tenant_id"), normalizePythonDep(col("t")).as("dependency_name"))
      .filter(col("dependency_name").isNotNull)
      .withColumn("ecosystem", lit("python"))

  /** parse_go_mod (dependency.rs:183): first token of lines inside a
    * `require ( ... )` block (module paths containing `/`, not `//`
    * comments), plus single-line `require mod vX` outside blocks. */
  def parseGoMod(manifests: DataFrame): DataFrame = {
    val w = Window.partitionBy("tenant_id", "filename").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lines = manifests
      .select(col("tenant_id"), col("filename"),
        posexplode(split(col("content"), "\n")))
      .withColumn("t", wsTrim(col("col")))
      .withColumn("marker",
        when(col("t") === "require (", 1).when(col("t") === ")", 0))
      .withColumn("state", last(col("marker"), ignoreNulls = true).over(w))
    val block = lines
      .filter(col("state") === 1 && col("marker").isNull)
      .withColumn("mod", element_at(split(col("t"), "\\s+"), 1))
      .filter(col("mod").contains("/") && !col("mod").startsWith("//"))
    val single = lines
      .filter((col("state").isNull || col("state") =!= 1) && col("marker").isNull &&
        col("t").startsWith("require "))
      .withColumn("mod",
        element_at(split(expr("substring(t, length('require ') + 1)"), "\\s+"), 1))
      .filter(col("mod").contains("/"))
    block.unionByName(single)
      .select(col("tenant_id"), col("mod").as("dependency_name"),
        lit("go").as("ecosystem"))
  }

  /** parse_dependencies (dependency.rs:59): dispatch on the manifest
    * filename; unrecognized filenames contribute nothing. */
  def parseDependenciesOf(manifests: DataFrame): DataFrame = {
    def named(n: String) = manifests.filter(col("filename") === n)
    parseCargoToml(named("Cargo.toml"))
      .unionByName(parsePackageJson(named("package.json")))
      .unionByName(parsePyprojectToml(named("pyproject.toml")))
      .unionByName(parseRequirementsTxt(named("requirements.txt")))
      .unionByName(parseGoMod(named("go.mod")))
  }

  /** compute_dependency_groups (dependency.rs:335) over a (tenant_id,
    * dependency_name) frame: exact-rational Jaccard over distinct dep
    * sets, one `dep:<min>+<max>` group per pair at or above the
    * threshold, both members listed with the pair's similarity
    * (rounded to 6 for cross-engine hashing).
    */
  def dependencyGroupsOf(deps: DataFrame, threshold: Double = 0.3): DataFrame = {
    val prof = deps.select(col("tenant_id"), col("dependency_name")).distinct()
      .localCheckpoint()
    val sizes = prof.groupBy(col("tenant_id")).agg(count(lit(1)).as("sz"))
    val pairs = prof.as("x").join(prof.as("y"),
        col("x.dependency_name") === col("y.dependency_name") &&
          col("x.tenant_id") < col("y.tenant_id"))
      .groupBy(col("x.tenant_id").as("a"), col("y.tenant_id").as("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("tenant_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("tenant_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("sim",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("sim") >= threshold)
      .select(concat(lit("dep:"), col("a"), lit("+"), col("b")).as("group_id"),
        col("a"), col("b"), round(col("sim"), 6).as("similarity"))
    pairs.select(col("group_id"), col("a").as("tenant_id"), col("similarity"))
      .union(pairs.select(col("group_id"), col("b").as("tenant_id"), col("similarity")))
      .orderBy(col("group_id"), col("tenant_id"))
  }

  /** dependency_groups query: each tenant (= `source`, `src<n>`) gets a
    * deterministic synthetic manifest in one of the five formats by
    * n%4 (python alternates pyproject/requirements): a shared
    * per-ecosystem dependency core plus one varying extra, so
    * same-ecosystem pairs clear the 0.3 threshold and cross-ecosystem
    * pairs never group (dependency_tests.rs's no-false-grouping). The
    * manifests exercise inline tables, dev-dependency sections, extras
    * (`pandas[sql]`), case/underscore normalization, and go.mod's
    * block + single-line require forms.
    */
  def dependencyGroups(spark: SparkSession, dir: String): DataFrame =
    dependencyGroupsOf(parseDependenciesOf(syntheticManifests(spark, dir)))

  /** The deterministic per-tenant manifest corpus described above —
    * exposed so tier-1 concept tagging reuses the same manifests. */
  def syntheticManifests(spark: SparkSession, dir: String): DataFrame = {
    val n = expr("CAST(substring(tenant_id, 4) AS INT)")
    val kind = pmod(n, lit(4))
    val variant = pmod(floor(n / lit(4)).cast("int"), lit(4))
    val extraRust = element_at(
      array(lit("anyhow"), lit("reqwest"), lit("tracing"), lit("clap")), variant + 1)
    val extraNpm = element_at(
      array(lit("lodash"), lit("express"), lit("axios"), lit("vite")), variant + 1)
    val extraPy = element_at(
      array(lit("pandas[sql]>=1.5"), lit("numpy~=1.24"), lit("Django>=4.0"),
        lit("my_package")), variant + 1)
    val extraGo = element_at(
      array(lit("github.com/spf13/cobra"), lit("github.com/gorilla/mux")),
      pmod(variant, lit(2)) + 1)
    val cargo = concat(
      lit("[package]\nname = \"proj\"\n\n[dependencies]\nserde = \"1.0\"\n" +
        "tokio = { version = \"1.35\", features = [\"full\"] }\n"),
      extraRust, lit(" = \"1.0\"\n\n[dev-dependencies]\ntempfile = \"3.8\"\n"))
    val npm = concat(
      lit("""{"name": "app", "dependencies": {"react": "^18", "next": "^14", """"),
      extraNpm, lit("""": "^1"}, "devDependencies": {"jest": "^29.0"}}"""))
    val pyproject = concat(
      lit("[project]\nname = \"proj\"\ndependencies = [\n    \"flask>=2.0\",\n    \"requests\",\n    \""),
      extraPy, lit("\",\n]\n"))
    val requirements = concat(
      lit("# Core deps\nflask>=2.0\nrequests==2.31.0\n"), extraPy, lit("\n"))
    val gomod = concat(
      lit("module github.com/example/proj\n\ngo 1.21\n\nrequire (\n" +
        "\tgithub.com/gin-gonic/gin v1.9.1\n\tgithub.com/go-sql-driver/mysql v1.7.1\n\t"),
      extraGo,
      lit(" v1.0.0\n)\n\nrequire github.com/stretchr/testify v1.8.4\n"))
    val manifests = Tables.documents(spark, dir)
      .select(col("source").as("tenant_id")).distinct()
      .withColumn("filename",
        when(kind === 0, "Cargo.toml")
          .when(kind === 1, "package.json")
          .when(kind === 2,
            when(pmod(variant, lit(2)) === 0, "pyproject.toml")
              .otherwise("requirements.txt"))
          .otherwise("go.mod"))
      .withColumn("content",
        when(kind === 0, cargo).when(kind === 1, npm)
          .when(kind === 2,
            when(pmod(variant, lit(2)) === 0, pyproject).otherwise(requirements))
          .otherwise(gomod))
    manifests
  }
}
