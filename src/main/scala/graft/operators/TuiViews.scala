package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The TUI data layer (cli/src/tui/views/{projects,libraries,service,
  * dashboard}_data*.rs) — the SQLite read queries behind the terminal
  * dashboard, re-expressed as DataFrames over the shared registry /
  * tracked-files / queue syntheses.
  *
  * The reference splits each view into a render half and a data half
  * precisely so the data half is testable; only the data half has
  * analytics content, and that is what these operators reproduce. The
  * live-daemon probes (service_data.rs:253 probe_live — HTTP) and the
  * on-disk db file sizes (:161 fetch_storage) are environment I/O and
  * out of scope; everything read FROM the database is here.
  *
  * Scale posture: each view is one scan of the big frame (tracked files
  * or queue) aggregated per tenant/watch (shuffle ∝ distinct tenants),
  * joined onto the config-sized registry via broadcast. Nothing here
  * materializes per-row output except the capped error tail, which is
  * a rank-window top-50.
  */
object TuiViews {

  /** home_to_tilde's home prefix (output/style.rs) — environment in the
    * reference, a fixed axis here so the substitution arm is live. */
  val Home = "/home/user"

  /** The watch_folders registry synthesis shared by the TUI views —
    * the LibraryList/QueueStatus residue conventions (libraries at
    * wn%9==8, rules at wn%9==5) extended with the columns the TUI
    * reads: watch ids, parentage (w-17 is a library nested under the
    * w-3 project; w-13 a project sub-watch under w-4 — both excluded
    * from top-level listings), activity/enablement flags, and paths
    * chosen so both home-prefixed and bare arms of home_to_tilde and
    * both arms of the library display-name disambiguation (the two
    * libraries share the base folder name `docs`) are exercised. The
    * w-11 project also uses base `docs`, so the queue browser's
    * TOP-LEVEL name-collision suffix (queue_data.rs:253 — two
    * top-level folders named `docs`) is live as well. */
  def registry(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("source")).distinct()
      .select(col("source").as("tenant_id"),
        expr("CAST(substring(source, 4) AS INT)").as("wn"))
      .select(
        concat(lit("w-"), col("wn")).as("watch_id"),
        col("tenant_id"),
        when(pmod(col("wn"), lit(9)) === 8, lit("libraries"))
          .when(pmod(col("wn"), lit(9)) === 5, lit("rules"))
          .otherwise(lit("projects")).as("collection"),
        when(col("wn") === 17, lit("w-3"))
          .when(col("wn") === 13, lit("w-4"))
          .otherwise(lit(null).cast("string")).as("parent_watch_id"),
        when(col("wn") === 8, lit(s"$Home/lib/docs"))
          .when(col("wn") === 17, lit("/srv/vendor/docs"))
          .when(col("wn") === 11, lit("/srv/alt/docs"))
          .when(pmod(col("wn"), lit(9)) === 5,
            concat(lit("/etc/rules-"), col("wn")))
          .when(pmod(col("wn"), lit(3)) === 0,
            concat(lit(s"$Home/work/proj-"), col("wn")))
          .otherwise(concat(lit("/srv/data/proj-"), col("wn"))).as("path"),
        (pmod(col("wn"), lit(4)) =!= 2).as("is_active"),
        (pmod(col("wn"), lit(5)) =!= 1).as("enabled"),
        when(pmod(col("wn"), lit(2)) === 0, lit("sync"))
          .otherwise(lit(null).cast("string")).as("library_mode"),
        (pmod(col("wn"), lit(7)) === 0).as("is_paused"),
        (pmod(col("wn"), lit(11)) === 0).as("is_archived"))

  /** tracked_files synthesis on the documents axis: per-tenant file
    * index residues (doc_id div 20 — doc_id itself is constant mod 20
    * within a tenant), the projectBranches primary_branch convention,
    * a chunk_count axis for the service view's SUM, plus the columns
    * the file-list popup reads (file_list_data.rs) — a unique-per-watch
    * relative_path and a nullable size_bytes (the NULL arm is the
    * older-schema/deleted-file case the popup keeps as `size: None`). */
  def tracked(spark: SparkSession, dir: String): DataFrame = {
    val idx = floor(col("doc_id") / 20).cast("long")
    Tables.documents(spark, dir).select(
      concat(lit("w-"), expr("CAST(substring(source, 4) AS INT)"))
        .as("watch_folder_id"),
      col("doc_id").as("file_id"),
      when(pmod(idx, lit(13)) === 0, lit(null).cast("string"))
        .when(pmod(idx, lit(10)) < 6, lit("main"))
        .otherwise(concat(lit("b"), pmod(idx, lit(4)))).as("primary_branch"),
      (pmod(idx, lit(7)) + 1).as("chunk_count"),
      concat(
        element_at(array(lit("src"), lit("lib"), lit("docs"), lit("tests")),
          (pmod(idx, lit(4)) + 1).cast("int")),
        lit("/f"), idx,
        element_at(array(lit(".rs"), lit(".md"), lit(".py"), lit(".ts"),
          lit(".go")), (pmod(idx, lit(5)) + 1).cast("int")))
        .as("relative_path"),
      when(pmod(idx, lit(6)) === 0, lit(null).cast("long"))
        .otherwise(pmod(idx, lit(5000)) + 64).as("size_bytes"))
  }

  /** The unified_queue synthesis (QueueStatus residue conventions) plus
    * the columns the dashboard's error tail reads: updated_at and an
    * error_message carried by most failed rows (a NULL arm keeps the
    * `error_message IS NOT NULL` filter live). The event residue is
    * recovered from the `q-<event_id>` queue id. */
  def queue(spark: SparkSession, dir: String): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    QueueStatus.queue(spark, dir)
      .withColumn("updated_at", col("created_at"))
      .withColumn("error_message",
        when(col("status") === "failed" && pmod(eid, lit(5)) =!= 0,
          concat(lit("io error #"), pmod(eid, lit(23)))))
  }

  /** Last non-empty path component (projects_data.rs:114 — rsplit('/')
    * .find(!is_empty)), with a fallback when the path has none. */
  private def lastComponent(path: Column, fallback: Column): Column =
    coalesce(try_element_at(filter(split(path, "/"), c => c =!= ""), lit(-1)),
      fallback)

  /** home_to_tilde (output/style.rs): the home prefix → `~`. */
  private def homeToTilde(path: Column): Column =
    when(path.startsWith(Home),
      concat(lit("~"), substring(path, Home.length + 1, 1 << 20)))
      .otherwise(path)

  // ------------------------------------------------------------------
  // tui_projects — projects_data.rs:80 fetch_project_rows
  // ------------------------------------------------------------------

  /** §3 `*Of` form over (registry, tracked, queue). Top-level folders
    * (parent NULL) in the reference's SQL order (is_active DESC, path
    * ASC, LIMIT 200), each joined with: queue_count (pending +
    * in_progress per tenant, :192), doc_count (tracked_files joined to
    * the OWNING folder's tenant, :216 — tracked files, not completed
    * queue rows, which are garbage-collected), and the current branch
    * (:239 — the tenant's most-indexed primary_branch; count ties break
    * by branch name here, where the reference's HashMap iteration order
    * is unspecified — a superset contract). */
  def tuiProjectsOf(registry: DataFrame, tracked: DataFrame,
                    queue: DataFrame): DataFrame = {
    val owners = registry.select(col("watch_id"),
      col("tenant_id").as("owner_tenant"))
    val withTenant = tracked.join(broadcast(owners),
      tracked("watch_folder_id") === owners("watch_id"))
    val docCounts = withTenant.groupBy(col("owner_tenant"))
      .agg(count(lit(1)).as("doc_count"))
    val rank1 = Window.partitionBy(col("owner_tenant"))
      .orderBy(col("n").desc, col("primary_branch").asc)
    val branches = withTenant
      .filter(col("primary_branch").isNotNull && col("primary_branch") =!= "")
      .groupBy(col("owner_tenant"), col("primary_branch"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(rank1)).filter(col("rk") === 1)
      .select(col("owner_tenant"), col("primary_branch").as("branch0"))
    val queueCounts = queue
      .filter(col("status").isin("pending", "in_progress"))
      .groupBy(col("tenant_id").as("q_tenant"))
      .agg(count(lit(1)).as("queue_count"))

    registry.filter(col("parent_watch_id").isNull)
      .orderBy(col("is_active").desc, col("path").asc).limit(200)
      .join(broadcast(docCounts), col("tenant_id") === col("owner_tenant"), "left")
      .drop("owner_tenant")
      .join(broadcast(branches), col("tenant_id") === col("owner_tenant"), "left")
      .join(broadcast(queueCounts), col("tenant_id") === col("q_tenant"), "left")
      .select(
        col("watch_id"),
        lastComponent(col("path"), col("watch_id")).as("name"),
        homeToTilde(col("path")).as("display_path"),
        col("is_active"), col("enabled"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"),
        coalesce(col("queue_count"), lit(0L)).as("queue_count"),
        coalesce(col("branch0"), lit("")).as("branch"))
      .orderBy(col("is_active").desc, col("display_path").asc)
  }

  def tuiProjects(spark: SparkSession, dir: String): DataFrame =
    tuiProjectsOf(registry(spark, dir), tracked(spark, dir), queue(spark, dir))

  // ------------------------------------------------------------------
  // tui_libraries — libraries_data.rs:57 fetch_library_rows
  // ------------------------------------------------------------------

  /** §3 `*Of` form: library-collection folders ordered by tag, with
    * per-WATCH tracked counts (:72 — all tracked rows under the watch,
    * unlike library_list's per-collection rollup), the parent join for
    * the `P:<project>` nesting marker (:131 project_source — only a
    * NON-library parent is marked), the display-name disambiguation
    * (:161 library_display_names — `parent/base` when ≥2 library paths
    * share a base folder name), and the status label (:243). */
  def tuiLibrariesOf(registry: DataFrame, tracked: DataFrame): DataFrame = {
    val comps = filter(split(col("path"), "/"), c => c =!= "")
    val docCounts = tracked.groupBy(col("watch_folder_id"))
      .agg(count(lit(1)).as("cnt"))
    val parents = registry.select(col("watch_id").as("p_id"),
      col("path").as("parent_path"),
      col("collection").as("parent_collection"))
    val libs = registry.filter(col("collection") === "libraries")
      .join(broadcast(docCounts),
        col("watch_id") === col("watch_folder_id"), "left")
      .join(broadcast(parents), col("parent_watch_id") === col("p_id"), "left")
      .withColumn("base", try_element_at(comps, lit(-1)))
      .withColumn("parent_comp", try_element_at(comps, lit(-2)))
    val dups = Window.partitionBy(col("base"))
    libs
      .withColumn("n_base", count(lit(1)).over(dups))
      .select(
        col("watch_id"), col("tenant_id").as("tag"),
        when(col("n_base") > 1 && col("parent_comp").isNotNull,
          concat(col("parent_comp"), lit("/"), col("base")))
          .otherwise(col("base")).as("name"),
        homeToTilde(col("path")).as("display_path"),
        col("enabled"), col("is_active"),
        coalesce(col("library_mode"), lit("incremental")).as("mode"),
        coalesce(col("cnt"), lit(0L)).as("doc_count"),
        when(col("parent_path").isNotNull &&
          col("parent_collection") =!= "libraries",
          concat(lit("P:"),
            lastComponent(col("parent_path"), col("parent_path"))))
          .as("source"),
        when(!col("enabled"), lit("disabled"))
          .when(col("is_active"), lit("watching"))
          .otherwise(lit("stopped")).as("status"))
      .orderBy(col("tag"))
  }

  def tuiLibraries(spark: SparkSession, dir: String): DataFrame =
    tuiLibrariesOf(registry(spark, dir), tracked(spark, dir))

  // ------------------------------------------------------------------
  // tui_service — service_data.rs:60 fetch_service_status
  // ------------------------------------------------------------------

  /** §3 `*Of` form of the service view's database-derived status: the
    * queue status counts (:71), dead-letter depth (:89), tracked-file
    * count + chunk sum (:96), paused/total watch folders (:105), the
    * operational_state qdrant_url (:119), and MAX(schema_version)
    * (:127), as one long (metric, value) frame — heterogeneous numeric
    * and string panel cells, so values are strings. */
  def tuiServiceOf(registry: DataFrame, tracked: DataFrame, queue: DataFrame,
                   deadLetter: DataFrame, operational: DataFrame,
                   schemaVersion: DataFrame): DataFrame = {
    val statusCounts = queue.groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
      .select(concat(lit("queue_"), col("status")).as("metric"),
        col("n").cast("string").as("value"))
    val dl = deadLetter.agg(count(lit(1)).as("n"))
      .select(lit("dead_letter").as("metric"), col("n").cast("string").as("value"))
    val tf = tracked.agg(count(col("file_id")).as("files"),
        coalesce(sum(col("chunk_count")), lit(0L)).as("chunks"))
      .select(explode(map(
        lit("tracked_files"), col("files").cast("string"),
        lit("total_chunks"), col("chunks").cast("string"))))
      .toDF("metric", "value")
    val wf = registry.agg(
        sum(when(col("is_paused"), 1L).otherwise(0L)).as("paused"),
        count(lit(1)).as("total"))
      .select(explode(map(
        lit("paused_folders"), col("paused").cast("string"),
        lit("total_folders"), col("total").cast("string"))))
      .toDF("metric", "value")
    val url = operational.filter(col("key") === "qdrant_url")
      .select(lit("qdrant_url").as("metric"), col("value"))
    val ver = schemaVersion.agg(max(col("version")).as("v"))
      .select(lit("schema_version").as("metric"), col("v").cast("string").as("value"))
    statusCounts.unionByName(dl).unionByName(tf).unionByName(wf)
      .unionByName(url).unionByName(ver)
      .orderBy(col("metric"))
  }

  /** Service status over the syntheses: the dead-letter queue is the
    * sparse event_id%97 slice; operational_state and schema_version are
    * the reference's single-row/config tables as literal frames. */
  def tuiService(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val deadLetter = Tables.events(spark, dir)
      .filter(pmod(col("event_id"), lit(97)) === 0)
      .select(col("event_id"))
    val operational = Seq(("qdrant_url", "http://localhost:6333"))
      .toDF("key", "value")
    val schemaVersion = Tables.events(spark, dir)
      .select((pmod(col("event_id"), lit(12)) + 1).as("version")).distinct()
    tuiServiceOf(registry(spark, dir), tracked(spark, dir),
      queue(spark, dir), deadLetter, operational, schemaVersion)
  }

  // ------------------------------------------------------------------
  // tui_dashboard — dashboard_fetch.rs:16 fetch_dashboard_data
  // ------------------------------------------------------------------

  /** §3 `*Of` form of the dashboard fetch: its seven sections as one
    * long frame (section, id, name, tracked_files, queue_pending,
    * queue_in_progress, queue_failed, extra) — heterogeneous panels,
    * so the per-section surplus column rides `extra` as a string
    * (branch_count for projects, sync-mode for libraries, the current
    * branch for active projects, `<letter>:<message>` for errors).
    *
    *  - summary (:35): the three queue totals the header shows.
    *  - projects (:55): top-level project folders by path, branch
    *    count + tracked files + per-status queue counts per tenant,
    *    all three maps filtered to collection='projects'.
    *  - libraries (:95): library folders by tag; name IS the tag
    *    (:127 — unlike the library browser's path-derived name).
    *  - scratchpad/rules (:140/:164): tenants present in that
    *    collection's queue slice, displayed via the top-level name
    *    map (:374 — path basename, raw id when unknown).
    *  - active_projects (:188): the is_active slice with the branch
    *    mode (`—` when nothing indexed).
    *  - errors (:229): failed rows carrying a message, newest 50 (the
    *    reference's ORDER BY updated_at DESC LIMIT 50 totalized by a
    *    queue_id tiebreak), tagged with the collection letter (:412).
    */
  def tuiDashboardOf(registry: DataFrame, tracked: DataFrame,
                     queue: DataFrame): DataFrame = {
    val owners = registry.select(col("watch_id"),
      col("tenant_id").as("owner_tenant"),
      col("collection").as("owner_collection"))
    val withTenant = tracked.join(broadcast(owners),
      tracked("watch_folder_id") === owners("watch_id"))

    // tracked_file_counts(collection) / branch_info_by_tenant(collection)
    // for projects (:335/:298): count + mode per tenant on that slice.
    val projTracked = withTenant.filter(col("owner_collection") === "projects")
    val tfCounts = projTracked.groupBy(col("owner_tenant"))
      .agg(count(col("file_id")).as("tracked_files"))
    val rank1 = Window.partitionBy(col("owner_tenant"))
      .orderBy(col("n").desc, col("primary_branch").asc)
    val branchInfo = projTracked
      .filter(col("primary_branch").isNotNull && col("primary_branch") =!= "")
      .groupBy(col("owner_tenant"), col("primary_branch"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total_branches",
        count(lit(1)).over(Window.partitionBy(col("owner_tenant"))))
      .withColumn("rk", row_number().over(rank1)).filter(col("rk") === 1)
      .select(col("owner_tenant"), col("primary_branch").as("primary"),
        col("total_branches").as("branch_count"))

    // queue_counts_by_tenant(collection) (:347): per-status pivots. The
    // status filter also bounds MEMBERSHIP — a tenant whose only rows
    // are 'done' is absent from the map, and so absent from the
    // scratchpad/rules sections (which list the map's keys).
    def qCounts(collection: String): DataFrame = queue
      .filter(col("collection") === collection &&
        col("status").isin("pending", "in_progress", "failed"))
      .groupBy(col("tenant_id").as("q_tenant"))
      .agg(
        sum(when(col("status") === "pending", 1L).otherwise(0L)).as("qp"),
        sum(when(col("status") === "in_progress", 1L).otherwise(0L)).as("qi"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("qf"))

    // resolve_tenant_names (:374): top-level folders only.
    val names = registry.filter(col("parent_watch_id").isNull)
      .select(col("tenant_id").as("n_tenant"),
        lastComponent(col("path"), col("path")).as("display"))

    val out = (section: String, id: Column, name: Column, tf: Column,
               extra: Column) => Seq(
      lit(section).as("section"), id.as("id"), name.as("name"),
      coalesce(tf, lit(0L)).as("tracked_files"),
      coalesce(col("qp"), lit(0L)).as("queue_pending"),
      coalesce(col("qi"), lit(0L)).as("queue_in_progress"),
      coalesce(col("qf"), lit(0L)).as("queue_failed"),
      extra.as("extra"))

    val summary = queue.agg(
        sum(when(col("status") === "pending", 1L).otherwise(0L)).as("qp"),
        sum(when(col("status") === "in_progress", 1L).otherwise(0L)).as("qi"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("qf"))
      .select(out("summary", lit("queue"), lit(""), lit(0L),
        lit(null).cast("string")): _*)

    val projBase = registry
      .filter(col("parent_watch_id").isNull && col("collection") === "projects")
      .join(broadcast(qCounts("projects")),
        col("tenant_id") === col("q_tenant"), "left")
      .join(broadcast(tfCounts), col("tenant_id") === col("owner_tenant"), "left")
      .join(broadcast(branchInfo.withColumnRenamed("owner_tenant", "b_tenant")),
        col("tenant_id") === col("b_tenant"), "left")
    val projects = projBase.select(out("projects", col("tenant_id"),
      lastComponent(col("path"), col("path")), col("tracked_files"),
      coalesce(col("branch_count"), lit(0L)).cast("string")): _*)

    val libraries = registry.filter(col("collection") === "libraries")
      .join(broadcast(qCounts("libraries")),
        col("tenant_id") === col("q_tenant"), "left")
      .join(broadcast(withTenant.filter(col("owner_collection") === "libraries")
        .groupBy(col("owner_tenant"))
        .agg(count(col("file_id")).as("tracked_files"))),
        col("tenant_id") === col("owner_tenant"), "left")
      .select(out("libraries", col("tenant_id"), col("tenant_id"),
        col("tracked_files"),
        when(coalesce(col("library_mode"), lit("incremental")) === "incremental",
          lit("inc"))
          .otherwise(coalesce(col("library_mode"), lit("incremental")))): _*)

    def queueSection(section: String, collection: String): DataFrame =
      qCounts(collection)
        .join(broadcast(names), col("q_tenant") === col("n_tenant"), "left")
        .select(out(section, col("q_tenant"),
          coalesce(col("display"), col("q_tenant")), lit(0L),
          lit(null).cast("string")): _*)

    val active = registry
      .filter(col("is_active") && col("collection") === "projects" &&
        col("parent_watch_id").isNull)
      .join(broadcast(qCounts("projects")),
        col("tenant_id") === col("q_tenant"), "left")
      .join(broadcast(tfCounts), col("tenant_id") === col("owner_tenant"), "left")
      .join(broadcast(branchInfo.withColumnRenamed("owner_tenant", "b_tenant")),
        col("tenant_id") === col("b_tenant"), "left")
      .select(out("active_projects", col("tenant_id"),
        lastComponent(col("path"), col("path")), col("tracked_files"),
        coalesce(col("primary"), lit("—"))): _*)

    val errRank = Window.orderBy(col("updated_at").desc, col("queue_id"))
    val letter = when(col("collection") === "projects", lit("P"))
      .when(col("collection") === "libraries", lit("L"))
      .when(col("collection") === "rules", lit("R"))
      .when(col("collection") === "scratchpad", lit("S"))
      .otherwise(lit("?"))
    val errors = queue
      .filter(col("status") === "failed" && col("error_message").isNotNull)
      .withColumn("rk", row_number().over(errRank)).filter(col("rk") <= 50)
      .join(broadcast(names), col("tenant_id") === col("n_tenant"), "left")
      .select(lit("errors").as("section"), col("queue_id").as("id"),
        coalesce(col("display"), col("tenant_id")).as("name"),
        lit(0L).as("tracked_files"), lit(0L).as("queue_pending"),
        lit(0L).as("queue_in_progress"), lit(0L).as("queue_failed"),
        concat(letter, lit(":"), col("error_message")).as("extra"))

    summary.unionByName(projects).unionByName(libraries)
      .unionByName(queueSection("scratchpad", "scratchpad"))
      .unionByName(queueSection("rules", "rules"))
      .unionByName(active).unionByName(errors)
      .orderBy(col("section"), col("id"))
  }

  def tuiDashboard(spark: SparkSession, dir: String): DataFrame =
    tuiDashboardOf(registry(spark, dir), tracked(spark, dir), queue(spark, dir))
}
