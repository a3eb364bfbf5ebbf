package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** State-reconciliation sweeps — the classification halves of the
  * reference's repair loops (the filesystem stats, queue writes, and
  * UPDATEs around them are environment I/O; the SELECT+classify is the
  * analytics):
  *
  *  - fs_reconcile (idle/tasks/filesystem_reconcile.rs): tracked files
  *    joined to their watch folder (watch_id key, :19), each classified
  *    against on-disk state — missing from disk → enqueue Delete
  *    (:198), present but indexed (`chunk_count > 0`) and now past its
  *    per-extension ingestion size limit → enqueue Update so the size
  *    gate re-records it as a 0-chunk skip (#121 self-heal, :156), else
  *    keep. The limit table is the 13-entry data/markup default
  *    (config/ingestion.rs:33, KB × 1024; absent key = unlimited), keyed
  *    by `get_extension_for_storage` (classify.rs:107 — the same rule as
  *    [[FileClassification.extensionOf]]).
  *  - recovery_reconcile (startup/recovery/reconcile.rs:32): files
  *    flagged `needs_reconcile=1` re-queued with the force_reingest
  *    metadata (:21) — watch folder missing → the flag clears with no
  *    repair (orphan, :83); file on disk → Update; gone → Delete. The
  *    F-020 deferred-clear protocol is queue-completion state, not
  *    analytics.
  *  - upgrade_select (tracked_files_schema/reconcile.rs:79
  *    get_files_needing_upgrade): the capability-upgrade selections per
  *    reason code — grammar_available (`treesitter_status IN
  *    ('none','failed','skipped')`), lsp_available (`lsp_status IN
  *    ('none','failed')`), enrichment_retry (either 'failed') — with
  *    the optional language filter arm. The reference RPC scopes one
  *    tenant per call; the batch twin sweeps every tenant in one scan.
  *
  * Shape: everything is one documents scan + broadcast config axes
  * (folder list, limits table, reason codes) + codegen'd CASEs — the
  * only shuffle is the final ORDER BY. Scale-safe at any corpus size.
  */
object Reconcile {

  /** reconcile-driven re-ingest metadata (recovery/reconcile.rs:21). */
  val ReconcileMetadata = """{"source":"needs_reconcile","force_reingest":true}"""

  /** Default per-extension ingestion size limits in KB
    * (config/ingestion.rs:33 default_extension_size_limits). */
  val ExtensionSizeLimitsKb: Seq[(String, Long)] = Seq(
    "json" -> 500L, "jsonc" -> 500L, "json5" -> 500L, "jsonl" -> 500L,
    "ndjson" -> 500L, "yaml" -> 500L, "yml" -> 500L, "toml" -> 500L,
    "xml" -> 500L, "xsl" -> 500L, "xslt" -> 500L, "csv" -> 500L,
    "tsv" -> 500L)

  /** The synthetic tracked-files frame over the shared path corpus:
    * watch_folder_id = source, relative_path below the folder root,
    * branch/chunk/status columns cycling so every classification arm
    * is reachable, on-disk size ∝ n_chars, existence by a residue
    * (doc_id % 13 == 5 rows "deleted from disk"). */
  def trackedFiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("relative_path",
        regexp_replace(FileClassification.syntheticPathCol, "^/proj/[^/]+/", ""))
      .withColumnRenamed("doc_id", "file_id")
      .withColumn("watch_folder_id", col("source"))
      .withColumn("primary_branch",
        when(pmod(col("file_id"), lit(6)) === 0, lit(null).cast("string"))
          .otherwise(lit("main")))
      .withColumn("chunk_count",
        when(pmod(col("file_id"), lit(9)) === 4, lit(0L))
          .otherwise(lit(1L) + pmod(col("file_id"), lit(7))))
      .withColumn("size_bytes", col("n_chars") * 1500L)
      .withColumn("fs_exists", pmod(col("file_id"), lit(13)) =!= 5)
      .drop("source")

  /** The watch-folder registry frame (watch_id-keyed,
    * filesystem_reconcile.rs:19): one row per corpus source. */
  def watchFolders(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source")).distinct()
      .select(col("source").as("watch_id"),
        concat(lit("/proj/"), col("source")).as("watch_path"),
        col("source").as("tenant_id"),
        concat(col("source"), lit("-code")).as("collection"))

  /** §3 `*Of` form of the filesystem reconcile classification. */
  def fsReconcileOf(tracked: DataFrame, folders: DataFrame,
                    limitsKb: Seq[(String, Long)] = ExtensionSizeLimitsKb): DataFrame = {
    val spark = tracked.sparkSession
    import spark.implicits._
    val limits = limitsKb.toDF("ext_key", "limit_kb")
    tracked
      .join(broadcast(folders),
        col("watch_folder_id") === col("watch_id"))
      .filter(length(col("relative_path")) > 0 && length(col("watch_path")) > 0)
      .withColumn("branch", coalesce(col("primary_branch"), lit("default")))
      .withColumn("extension",
        FileClassification.extensionOf(FileClassification.fileName(col("relative_path"))))
      .join(broadcast(limits), col("extension") === col("ext_key"), "left")
      .withColumn("action",
        when(!col("fs_exists"), lit("delete"))
          .when(col("chunk_count") > 0 && col("limit_kb").isNotNull &&
            col("size_bytes") > col("limit_kb") * 1024L, lit("reprocess"))
          .otherwise(lit("keep")))
      .withColumn("op",
        when(col("action") === "delete", lit("delete"))
          .when(col("action") === "reprocess", lit("update")))
      .select(col("file_id"), col("relative_path"), col("branch"),
        col("collection"), col("tenant_id"), col("chunk_count"),
        col("size_bytes"), col("extension"), col("limit_kb"),
        col("fs_exists"), col("action"), col("op"))
  }

  /** fs_reconcile query over the shared synthetic corpus. */
  def fsReconcile(spark: SparkSession, dir: String): DataFrame =
    fsReconcileOf(trackedFiles(spark, dir), watchFolders(spark, dir))
      .orderBy(col("file_id"))

  /** §3 `*Of` form of the needs_reconcile recovery classification:
    * flagged rows left-joined to the folder registry. */
  def recoveryReconcileOf(flagged: DataFrame, folders: DataFrame): DataFrame =
    flagged
      .join(broadcast(folders), col("watch_folder_id") === col("watch_id"), "left")
      .withColumn("action",
        when(col("watch_path").isNull, lit("clear_flag"))
          .when(col("fs_exists"), lit("update"))
          .otherwise(lit("delete")))
      .withColumn("metadata",
        when(col("action") =!= "clear_flag", lit(ReconcileMetadata)))
      .select(col("file_id"), col("relative_path"), col("watch_folder_id"),
        col("reconcile_reason"), col("action"), col("metadata"))

  /** recovery_reconcile query: doc_id % 7 == 2 rows carry the flag,
    * and doc_id % 21 == 2 among them point at a vanished folder so the
    * orphan clear-arm is live. */
  def recoveryReconcile(spark: SparkSession, dir: String): DataFrame = {
    val reasons = array(lit("qdrant_ok_sqlite_fail"), lit("hash_mismatch"),
      lit("partial_write"))
    val flagged = trackedFiles(spark, dir)
      .filter(pmod(col("file_id"), lit(7)) === 2)
      .withColumn("watch_folder_id",
        when(pmod(col("file_id"), lit(21)) === 2, lit("ghost"))
          .otherwise(col("watch_folder_id")))
      .withColumn("reconcile_reason",
        element_at(reasons, (pmod(col("file_id"), lit(3)) + 1).cast("int")))
    recoveryReconcileOf(flagged, watchFolders(spark, dir))
      .orderBy(col("file_id"))
  }

  /** upgrade_select query: the three capability-upgrade selections in
    * one pass — a broadcast reason axis × the tracked frame, with the
    * per-reason status predicate and the grammar reason exercising the
    * optional language filter (reconcile.rs:91). Statuses cycle over
    * the reference vocabularies so every predicate arm is live. */
  def upgradeSelect(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Language via the classifier's extension→language rule table
    // (classify.rs), a broadcast lookup on the storage extension.
    val langTable = FileClassification.extensionTable
      .collect { case (e, Some(l), _, _) => (e, l) }
      .toDF("lang_ext", "language")
    val files = trackedFiles(spark, dir)
      .withColumn("treesitter_status", element_at(
        array(lit("none"), lit("ok"), lit("failed"), lit("skipped")),
        (pmod(col("file_id"), lit(4)) + 1).cast("int")))
      .withColumn("lsp_status", element_at(
        array(lit("none"), lit("ok"), lit("failed")),
        (pmod(col("file_id"), lit(3)) + 1).cast("int")))
      .withColumn("extension",
        FileClassification.extensionOf(FileClassification.fileName(col("relative_path"))))
      .join(broadcast(langTable), col("extension") === col("lang_ext"), "left")
    val reasons = Seq(
      ("grammar_available", Some("python")),
      ("lsp_available", None),
      ("enrichment_retry", None))
      .map { case (r, l) => (r, l.orNull) }
      .toDF("reason", "lang_filter")
    files
      .join(broadcast(watchFolders(spark, dir)),
        col("watch_folder_id") === col("watch_id"))
      .crossJoin(broadcast(reasons))
      .filter(
        when(col("reason") === "grammar_available",
          col("treesitter_status").isin("none", "failed", "skipped"))
          .when(col("reason") === "lsp_available",
            col("lsp_status").isin("none", "failed"))
          .otherwise(col("lsp_status") === "failed" ||
            col("treesitter_status") === "failed"))
      .filter(col("lang_filter").isNull || col("language") <=> col("lang_filter"))
      .select(col("reason"), col("tenant_id"), col("file_id"),
        col("relative_path"),
        coalesce(col("primary_branch"), lit("default")).as("primary_branch"),
        col("collection"))
      .orderBy(col("reason"), col("file_id"))
  }

  /** Scratchpad reconciliation (grpc/services/scratchpad_rebuild.rs:83
    * reconcile_scratchpad) — the ring's one VALUE-matched reconcile:
    * a mirror entry re-ingests iff its content string equals NO store
    * point's content (`values().any(|q| q == content)`, :93 — content
    * identity, not point id). Enqueued rows carry the idempotency key
    * `sha256("text|add|<tenant>|scratchpad|<payload>")[..32]` (:122)
    * over the alphabetical {content, source_type, tags, title} JSON.
    * Shape: one left-anti (semi for the flag) join on the content
    * value against the DISTINCT store content set — shuffle ∝ entries.
    */
  def scratchpadReconcileOf(mirror: DataFrame, storeContents: DataFrame): DataFrame = {
    val sc = storeContents.select(col("content").as("q_content")).distinct()
    mirror
      .join(broadcast(sc), col("content") === col("q_content"), "left")
      .withColumn("in_qdrant", col("q_content").isNotNull)
      .withColumn("action",
        when(col("in_qdrant"), lit("present")).otherwise(lit("enqueue")))
      .withColumn("payload_json", concat(
        lit("{\"content\":\""), col("content"),
        lit("\",\"source_type\":\"scratchpad\",\"tags\":\""), col("tags"),
        lit("\",\"title\":\""), col("title"), lit("\"}")))
      .withColumn("idem_key",
        when(col("action") === "enqueue",
          substring(sha2(concat(lit("text|add|"), col("tenant_id"),
            lit("|scratchpad|"), col("payload_json")), 256), 1, 32)))
      .select(col("id"), col("title"), col("tenant_id"), col("in_qdrant"),
        col("action"), col("idem_key"))
  }

  /** scratchpad_reconcile query: store notes are a documents subset,
    * mirror contents drift on a wider cycle so both arms are live. */
  def scratchpadReconcile(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val store = docs
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(concat(lit("note-"), pmod(col("doc_id"), lit(300))).as("content"))
    val mirror = docs
      .select(pmod(col("doc_id"), lit(400)).as("m")).distinct()
      .select(
        concat(lit("sp-"), col("m")).as("id"),
        concat(lit("Note "), col("m")).as("title"),
        concat(lit("note-"), pmod(col("m"), lit(330))).as("content"),
        concat(lit("t"), pmod(col("m"), lit(5))).as("tags"),
        concat(lit("src"), pmod(col("m"), lit(20))).as("tenant_id"))
    scratchpadReconcileOf(mirror, store).orderBy(col("id"))
  }
}
