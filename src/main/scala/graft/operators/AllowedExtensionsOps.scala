package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Allowed-extensions ingest gate — the two-tier allowlist + collection
  * router every watched file passes before ingestion
  * (allowed_extensions/extensions.rs: `is_allowed`, `route_file`;
  * types.rs `FileRoute`).
  *
  * The library allowlist is a strict superset of the project allowlist
  * (reference material may embed code examples); binary document
  * formats found inside PROJECT watch folders are re-routed to the
  * library collection carrying `source_project_id` so the entry traces
  * back to its origin project; extension-less files are always
  * rejected. Unlike the classifier, routing uses PLAIN
  * `Path::extension` semantics — no compound `.d.ts` handling
  * (`types.d.ts` routes on `.ts`).
  *
  * Relational shape: three literal `isin` sets compiled into the scan
  * projection — map-only, no join at all.
  */
object AllowedExtensionsOps {

  /** PROJECT_EXTENSION_LIST (extensions.rs:19), lowercased dotted forms
    * (the reference lists `.r`/`.R` separately only to document its
    * case-insensitive lookup). */
  val projectExtensions: Seq[String] = Seq(
    "rs", "py", "js", "ts", "tsx", "jsx", "mjs", "cjs", "mts", "cts", "go",
    "java", "kt", "scala", "groovy", "clj", "cljs", "c", "cpp", "h", "hpp",
    "swift", "rb", "lua", "sh", "bash", "zsh", "fish", "toml", "yaml", "yml",
    "json", "xml", "csv", "tsv", "ipynb", "html", "css", "scss", "less",
    "vue", "svelte", "astro", "sql", "graphql", "proto", "md", "txt", "rst",
    "tex", "ex", "exs", "erl", "hrl", "hs", "ml", "mli", "elm", "r", "dart",
    "cs", "fs", "vb", "pl", "pm", "php", "nix", "lean", "zig", "nim", "v",
    "odin", "d", "f90", "f95", "pas", "cob", "cbl", "dockerfile", "makefile",
    "cmake", "mk", "ps1", "bat", "cmd", "awk", "sed", "sbt", "gradle", "pom"
  ).map("." + _)

  /** LIBRARY_ONLY_EXTENSION_LIST (extensions.rs:148): document formats
    * added only to the library allowlist. */
  val libraryOnlyExtensions: Seq[String] = Seq(
    "pdf", "epub", "docx", "doc", "rtf", "odt", "mobi", "chm", "pptx", "ppt",
    "pages", "key", "odp", "xlsx", "xls", "ods", "numbers", "parquet", "htm"
  ).map("." + _)

  /** library_extensions = project ∪ library-only (superset invariant). */
  val libraryExtensions: Seq[String] =
    (projectExtensions ++ libraryOnlyExtensions).distinct

  /** LIBRARY_ROUTED_EXTENSIONS (extensions.rs:13): binary/reference
    * formats that leave PROJECT watch folders for the library
    * collection (note: `.htm` is library-ONLY but not library-ROUTED). */
  val libraryRoutedExtensions: Seq[String] = Seq(
    "pdf", "epub", "docx", "doc", "rtf", "odt", "mobi", "chm", "pptx", "ppt",
    "pages", "key", "odp", "xlsx", "xls", "ods", "numbers", "parquet"
  ).map("." + _)

  /** Plain `Path::extension` in dotted lowercase form; null for
    * extension-less files (always rejected). */
  def dottedExtension(path: Column): Column = {
    val fname = lower(element_at(split(path, "/"), -1))
    when(fname.rlike("^.+\\.[^.]+$"),
      concat(lit("."), regexp_extract(fname, "\\.([^.]+)$", 1)))
  }

  /** is_allowed (extensions.rs:202): the library set for the
    * `libraries` collection, the project set for everything else. */
  def isAllowed(path: Column, collection: Column): Column = {
    val ext = dottedExtension(path)
    when(collection === "libraries", ext.isInCollection(libraryExtensions))
      .otherwise(ext.isInCollection(projectExtensions))
  }

  /** route_file (extensions.rs:240) as two columns: `route` in
    * (project, library, excluded) and `source_project_id` (set only
    * when a library-format file inside a project watch re-routes). */
  def routeColumns(path: Column, watchCollection: Column, tenantId: Column)
      : (Column, Column) = {
    val ext = dottedExtension(path)
    val route = when(watchCollection === "libraries",
        when(ext.isInCollection(libraryExtensions), "library").otherwise("excluded"))
      .otherwise(
        when(ext.isInCollection(libraryRoutedExtensions), "library")
          .when(ext.isInCollection(projectExtensions), "project")
          .otherwise("excluded"))
    val source = when(watchCollection =!= "libraries" &&
      ext.isInCollection(libraryRoutedExtensions), tenantId)
    (route, source)
  }

  /** Route a (doc_id, file_path, watch_collection, tenant_id) frame. */
  def routeFilesOf(files: DataFrame): DataFrame = {
    val (route, source) = routeColumns(col("file_path"),
      col("watch_collection"), col("tenant_id"))
    files.select(col("doc_id"), col("file_path"), col("watch_collection"),
      route.as("route"), source.as("source_project_id"))
  }

  /** Format-routing default library extensions (format_routing.rs:33
    * RoutingConfig::default) — nearly the allowed-extensions
    * LIBRARY_ROUTED set but WITHOUT `.chm` (a documented divergence
    * between the two reference modules). */
  val routingLibraryExtensions: Seq[String] = Seq(
    "pdf", "epub", "docx", "doc", "rtf", "odt", "mobi", "pptx", "ppt",
    "pages", "key", "odp", "xlsx", "xls", "ods", "numbers", "parquet"
  ).map("." + _)

  /** should_route_to_library (format_routing.rs:63): the configurable
    * docx/doc and pptx/ppt overrides take precedence over the list. */
  def shouldRouteToLibrary(ext: Column, routeDocxTo: String = "libraries",
                           routePptxTo: String = "libraries"): Column =
    when(ext.isin(".docx", ".doc"), lit(routeDocxTo == "libraries"))
      .when(ext.isin(".pptx", ".ppt"), lit(routePptxTo == "libraries"))
      .otherwise(ext.isInCollection(routingLibraryExtensions))

  /** route_project_file (format_routing.rs:143) + the routing metadata
    * (:98 generate_library_name, :103 build_routing_metadata) over a
    * (doc_id, file_path, tenant_id) frame of PROJECT watch files:
    * extension-less files are Excluded, library-format files route to
    * the originating project's `<tenant>-refs` library partition with
    * `format_based` traceability, everything else stays in projects
    * (allowlist exclusion is handled upstream by file_routes).
    */
  def routeProjectFilesOf(files: DataFrame, routeDocxTo: String = "libraries",
                          routePptxTo: String = "libraries"): DataFrame = {
    val ext = dottedExtension(col("file_path"))
    val decision = when(ext.isNull, "excluded")
      .when(shouldRouteToLibrary(ext, routeDocxTo, routePptxTo), "libraries")
      .otherwise("projects")
    files.select(col("doc_id"), col("file_path"), decision.as("decision"),
      when(decision === "libraries", col("tenant_id")).as("source_project_id"),
      when(decision === "libraries", concat(col("tenant_id"), lit("-refs")))
        .as("library_name"),
      when(decision === "libraries", lit("format_based")).as("routing_reason"))
  }

  /** format_route query: the format-routing decision layer over the
    * synthetic path corpus as project-watch files. */
  def formatRoute(spark: SparkSession, dir: String): DataFrame =
    routeProjectFilesOf(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("tenant_id"),
        FileClassification.syntheticPathCol.as("file_path")))
      .orderBy(col("doc_id"))

  /** file_routes query: the router over the shared synthetic path
    * corpus, with every third tenant-doc on a `libraries` watch folder
    * — exercising both watch kinds, the library re-route with
    * source_project_id, project acceptance, and exclusion (archives,
    * dotfiles, extension-less files).
    */
  def fileRoutes(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        FileClassification.syntheticPathCol.as("file_path"))
      .withColumn("watch_collection",
        when(pmod(col("doc_id"), lit(3)) === 0, "libraries").otherwise("projects"))
      .withColumn("tenant_id", col("source"))
    routeFilesOf(files).orderBy(col("doc_id"))
  }
}
