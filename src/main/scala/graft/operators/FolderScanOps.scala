package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The progressive single-level folder scan (strategies/processing/
  * folder/scan.rs) — the decision cascade that turns one directory's
  * entries into queue items, composed from the already-landed gates:
  *
  *  - directories: Gate-0 project ignore (counted in files_excluded —
  *    yes, DIRECTORIES increment the FILE counter, scan.rs:84) →
  *    should_exclude_directory (dropped SILENTLY, no counter — the
  *    :164 `return 0` quirk) → a `.git` marker makes it a submodule
  *    (Tenant, Add) with its own tenant id → else (Folder, Scan) with
  *    last_scan propagated for downstream pruning.
  *  - files: Gate-0 ignore → the root-anchored static exclusion (#97,
  *    [[ExclusionEngineOps.shouldExcludeInRoot]]) → the allowed-
  *    extensions gate ([[AllowedExtensionsOps.isAllowed]]) → mtime ≤
  *    last_scan pruning (parse failure scans everything) → the 100 MB
  *    cap → else (File, Add) carrying classify_file_type + size.
  *
  * Symlinks are skipped before any gate. The axis is one scanned
  * directory per scenario (config-sized, literal): a normal project
  * subdirectory and a watch root nested under a DOTTED home directory
  * (the #97 arm — hidden components above the root must not exclude).
  *
  * Scale: map-only CASE cascade per entry + one config-sized ignore
  * rule set; on a cluster this is the per-directory work of the scan
  * queue, shuffle-free.
  */
object FolderScanOps {

  /** Gate-0 rules for the scan axis (a compact .gitignore: a dir-only
    * rule and a glob), compiled with the IgnoreRules compiler. */
  val IgnoreLines: Seq[String] = Seq("secret/", "*.log")

  /** Scan-axis rows: (root, entry_name, is_dir, has_git_marker,
    * is_symlink, mtime_age_hours, size_bytes). last_scan baseline =
    * 24 h ago; files older than that prune. Shared with the generated
    * oracle so the axes can never drift. */
  val scanEntriesSeq: Seq[(String, String, Boolean, Boolean, Boolean, Double, Long)] = Seq(
      // Normal project root: /w/proj-3, scanning its `sub` level.
      ("/w/proj-3", "vendor", true, false, false, 1.0, 0L),
      ("/w/proj-3", ".hidden", true, false, false, 1.0, 0L),
      ("/w/proj-3", ".github", true, false, false, 1.0, 0L),
      ("/w/proj-3", "node_modules", true, false, false, 1.0, 0L),
      ("/w/proj-3", "submod", true, true, false, 1.0, 0L),
      ("/w/proj-3", "secret", true, false, false, 1.0, 0L),
      ("/w/proj-3", "target", true, false, false, 1.0, 0L),
      ("/w/proj-3", "main.rs", false, false, false, 2.0, 4096L),
      ("/w/proj-3", "notes.md", false, false, false, 0.5, 1024L),
      ("/w/proj-3", "app.log", false, false, false, 2.0, 512L),
      ("/w/proj-3", "old.rs", false, false, false, 48.0, 2048L),
      ("/w/proj-3", "huge.py", false, false, false, 2.0, 200L * 1024 * 1024),
      ("/w/proj-3", "x.tmp.rs", false, false, false, 2.0, 64L),
      ("/w/proj-3", "README", false, false, false, 2.0, 10L),
      ("/w/proj-3", "link.rs", false, false, true, 2.0, 1L),
      // Watch root under a dotted home dir (#97): inner files pass.
      ("/home/u/.config/app", "ok.rs", false, false, false, 2.0, 100L),
      ("/home/u/.config/app", ".env", false, false, false, 2.0, 9L))

  def scanEntries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    scanEntriesSeq.toDF("root", "name", "is_dir", "has_git", "is_symlink",
      "mtime_age_hours", "size_bytes")
  }

  /** Gate-0: does the compiled ignore set match this entry? Single-
    * level scan — the entry itself is the decided target (ancestors
    * are the scanned dir, by construction not ignored). */
  private def gate0Match(name: Column, isDir: Column,
                         ignoreLines: Seq[String]): Column = {
    val compiled = IgnoreRules.compileLines(ignoreLines)
    compiled.map { p =>
      val m = name.rlike(p.regex)
      if (p.dirOnly) m && isDir else m
    }.foldLeft(lit(false))(_ || _)
  }

  /** §3 `*Of` form: the verdict per entry + per-root counters.
    * `ignoreLines` defaults to the registered fixture set; OracleProps
    * drives it with seeded random rule sets against the generated
    * oracle (SparkEntry.folderScanOracleFor). */
  def folderScanOf(entries: DataFrame, baselineHours: Double,
                   maxFileSize: Long,
                   ignoreLines: Seq[String] = IgnoreLines): DataFrame = {
    def gate0(name: Column, isDir: Column): Column =
      gate0Match(name, isDir, ignoreLines)
    val absPath = concat(col("root"), lit("/"), col("name"))
    val verdict =
      when(col("is_symlink"), lit("skipped_symlink"))
        .when(col("is_dir"),
          when(gate0(col("name"), col("is_dir")), lit("excluded_ignore"))
            .when(ExclusionEngineOps.shouldExcludeDirectory(col("name")),
              lit("skipped_dir"))
            .when(col("has_git"), lit("enqueue_tenant_add"))
            .otherwise(lit("enqueue_folder_scan")))
        .otherwise(
          when(gate0(col("name"), col("is_dir")), lit("excluded_ignore"))
            .when(ExclusionEngineOps.shouldExcludeInRoot(absPath, col("root")),
              lit("excluded_static"))
            // coalesce: an extension-less file yields a NULL isAllowed
            // probe; the reference rejects it (always excluded).
            .when(!coalesce(AllowedExtensionsOps.isAllowed(absPath,
              lit("projects")), lit(false)), lit("excluded_extension"))
            .when(col("mtime_age_hours") >= baselineHours, lit("pruned_mtime"))
            .when(col("size_bytes") > maxFileSize, lit("excluded_large"))
            .otherwise(lit("enqueue_file_add")))
    // classify only the enqueued files (scan.rs:396) — via a broadcast
    // join back from the classifier's file_path projection.
    val classified = FileClassification.classifyOf(
      entries.select(concat(col("root"), lit("/"), col("name"))
        .as("file_path"), lit(0L).as("doc_id")))
      .select(col("file_path"), col("file_type").as("ft"))
    val out = entries.withColumn("verdict", verdict)
      .withColumn("abs_path", absPath)
      .join(broadcast(classified), col("abs_path") === col("file_path"), "left")
      .select(col("root"), col("name"), col("is_dir"),
        col("verdict"),
        when(col("verdict") === "enqueue_file_add", col("ft"))
          .as("file_type"),
        when(col("verdict") === "enqueue_file_add", col("size_bytes"))
          .as("size_bytes"))
    val counters = out.groupBy(col("root"))
      .agg(
        sum(when(col("verdict") === "enqueue_file_add", 1L).otherwise(0L))
          .as("files_queued"),
        sum(when(col("verdict").isin("enqueue_folder_scan",
          "enqueue_tenant_add"), 1L).otherwise(0L)).as("dirs_queued"),
        sum(when(col("verdict").isin("excluded_ignore", "excluded_static",
          "excluded_extension", "pruned_mtime", "excluded_large"), 1L)
          .otherwise(0L)).as("files_excluded"))
      .select(col("root"), lit("__counters__").as("name"),
        lit(false).as("is_dir"),
        concat(lit("q="), col("files_queued"), lit(",d="), col("dirs_queued"),
          lit(",x="), col("files_excluded")).as("verdict"),
        lit(null).cast("string").as("file_type"),
        lit(null).cast("long").as("size_bytes"))
    out.unionByName(counters).orderBy(col("root"), col("name"))
  }

  def folderScan(spark: SparkSession, dir: String): DataFrame =
    folderScanOf(scanEntries(spark), baselineHours = 24.0,
      maxFileSize = 100L * 1024 * 1024)
}
