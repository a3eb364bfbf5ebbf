package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The log maintenance/diagnostics layer — the CLI debug-log reader
  * (cli/src/commands/debug/log_parsing.rs) and the daemon's log
  * pruner (daemon/core/src/log_pruner.rs).
  *
  * debug_logs (log_parsing.rs): JSONL entries parsed with the
  * timestamp/time/ts KEY CASCADE and level/severity cascade,
  * LogLevel::from_json's numeric buckets — 0-10 trace, 11-20 debug,
  * 21-30 info, 31-40 warn, else error; note these INTERVAL bounds
  * differ from the TUI log viewer's strict-decade buckets
  * (logs_data.rs maps 40..49 → warn, from_json maps 31..40), and a
  * JSON STRING "42" is NOT retried as a number here (from_json only
  * takes the numeric branch on a JSON number — unlike from_line's
  * fallback) — both divergences kept faithfully. Filters: errors_only
  * (error|warn only), since (entries WITHOUT a parseable timestamp
  * are conservatively INCLUDED — log_parsing.rs:222), session
  * substring. File scope: WITHOUT --since only the CURRENT file is
  * read (the :334 performance quirk); with --since rotated files are
  * read oldest-first and the last N survive.
  *
  * log_prune (log_pruner.rs): retention selection — active files
  * (daemon.jsonl / mcp-server.jsonl / workspace.log) never pruned,
  * rotated/compressed files older than retention deleted (dry-run
  * lists candidates without counting deletions), plus the run_if_due
  * gate (no recorded prune → run; younger than the check interval →
  * skip).
  *
  * Scale: the reader is one scan + per-(scenario, component) tail
  * rank windows; the pruner axes are config-sized.
  */
object LogOps {

  // ------------------------------------------------------------------
  // debug_logs — log_parsing.rs
  // ------------------------------------------------------------------

  private val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** The synthetic rotated JSONL logs: per event a (component,
    * file_no, line_no, line) row cycling every parser arm — the three
    * timestamp keys, string and numeric levels on both level/severity
    * keys, session ids, a missing-timestamp line, a non-JSON line,
    * an unparseable timestamp, and an unknown level. file_no 0 is the
    * current file; 1..2 are rotations (higher = older). */
  def logFiles(spark: SparkSession, dir: String): DataFrame = {
    val iso = date_format(col("ts"), IsoFmt)
    val v = pmod(col("event_id"), lit(11))
    val sess = concat(lit("sess-"), pmod(col("user_id"), lit(7)))
    Tables.events(spark, dir).select(
      when(pmod(col("user_id"), lit(2)) === 0, lit("daemon"))
        .otherwise(lit("mcp-server")).as("component"),
      pmod(col("event_id"), lit(3)).as("file_no"),
      col("event_id").as("line_no"),
      when(v === 0, concat(lit("{\"timestamp\":\""), iso,
        lit("\",\"level\":\"ERROR\",\"msg\":\"m\"}")))
        .when(v === 1, concat(lit("{\"time\":\""), iso,
          lit("\",\"level\":\"warn\",\"msg\":\"m\"}")))
        .when(v === 2, concat(lit("{\"ts\":\""), iso,
          lit("\",\"severity\":30,\"msg\":\"m\"}")))
        .when(v === 3, concat(lit("{\"timestamp\":\""), iso,
          lit("\",\"level\":15,\"msg\":\"m\"}")))
        .when(v === 4, concat(lit("{\"timestamp\":\""), iso,
          lit("\",\"level\":5,\"msg\":\"m\"}")))
        .when(v === 5, concat(lit("{\"timestamp\":\""), iso,
          lit("\",\"level\":45,\"msg\":\"m\"}")))
        .when(v === 6, concat(lit("{\"timestamp\":\""), iso,
          lit("\",\"level\":\"FATAL\",\"session_id\":\""), sess, lit("\"}")))
        .when(v === 7, concat(lit("{\"level\":\"INFO\",\"session_id\":\""),
          sess, lit("\"}")))
        .when(v === 8, lit("plain crash line"))
        .when(v === 9, lit("{\"timestamp\":\"bad-ts\",\"level\":\"DEBUG\"}"))
        .otherwise(concat(lit("{\"timestamp\":\""), iso,
          lit("\",\"level\":\"NOTICE\"}"))).as("line"))
  }

  /** Key k's value IS a JSON string (vs number): the raw line carries
    * a quote right after the colon. */
  private def stringTyped(line: Column, key: String): Column =
    line.rlike("\"" + key + "\"\\s*:\\s*\"")

  /** LogLevel::from_json over the level → severity cascade
    * (log_parsing.rs:107): strings through from_str; JSON NUMBERS
    * through the 0-10/11-20/21-30/31-40/else buckets; a string-typed
    * numeric is NOT retried and maps to NULL. */
  def levelFromJson(line: Column): Column = {
    val rawLevel = get_json_object(line, "$.level")
    val raw = coalesce(rawLevel, get_json_object(line, "$.severity"))
    val key = when(rawLevel.isNotNull, lit("level")).otherwise(lit("severity"))
    val isStr = when(key === "level", stringTyped(line, "level"))
      .otherwise(stringTyped(line, "severity"))
    val u = upper(raw)
    val n = when(raw.rlike("^[0-9]+$"), raw).cast("long")
    when(isStr,
      when(u === "TRACE", "trace").when(u === "DEBUG", "debug")
        .when(u === "INFO", "info")
        .when(u.isin("WARN", "WARNING"), "warn")
        .when(u.isin("ERROR", "ERR", "FATAL"), "error"))
      .otherwise(
        when(n.isNotNull && n <= 10, "trace")
          .when(n.isNotNull && n <= 20, "debug")
          .when(n.isNotNull && n <= 30, "info")
          .when(n.isNotNull && n <= 40, "warn")
          .when(n.isNotNull, "error"))
  }

  /** One debug-log filter (LogFilter). */
  final case class LogScenario(name: String, errorsOnly: Boolean = false,
                               since: Boolean = false,
                               session: Option[String] = None)

  val LogScenarios: Seq[LogScenario] = Seq(
    LogScenario("all"),
    LogScenario("errors", errorsOnly = true),
    LogScenario("session", session = Some("ss-3")),
    LogScenario("since", since = true))

  /** §3 `*Of` form of read_log_files_filtered for every scenario ×
    * component: parse, filter, file-scope by the since quirk, and the
    * last-100 tail in chronological order (rotated files oldest
    * first). `sinceTs` is a broadcast 1-row (since_ts) frame. */
  def debugLogsOf(files: DataFrame, sinceTs: DataFrame,
                  scenarios: Seq[LogScenario]): DataFrame = {
    val tsStr = coalesce(get_json_object(col("line"), "$.timestamp"),
      get_json_object(col("line"), "$.time"),
      get_json_object(col("line"), "$.ts"))
    val parsed = expr("try_to_timestamp(ts_str, \"yyyy-MM-dd'T'HH:mm:ss'Z'\")")
    val base = files
      .withColumn("ts_str", tsStr)
      .withColumn("parsed_time", parsed)
      .withColumn("level", levelFromJson(col("line")))
      .withColumn("session_id", get_json_object(col("line"), "$.session_id"))
    val frames = scenarios.map { s =>
      var f = base.crossJoin(broadcast(sinceTs))
      if (!s.since) f = f.filter(col("file_no") === 0)
      if (s.errorsOnly) f = f.filter(col("level").isin("error", "warn"))
      if (s.since)
        // Entries without a parseable timestamp are included.
        f = f.filter(col("parsed_time").isNull ||
          col("parsed_time") >= col("since_ts"))
      s.session.foreach(p => f = f.filter(col("session_id").contains(p)))
      f.select(lit(s.name).as("scenario"), col("component"), col("file_no"),
          col("line_no"), col("level"), col("session_id"),
          col("parsed_time").isNotNull.as("has_time"))
        .withColumn("tail_rk", row_number().over(
          Window.partitionBy(col("scenario"), col("component"))
            .orderBy(col("file_no").asc, col("line_no").desc)))
        .filter(col("tail_rk") <= 100)
        .drop("tail_rk")
    }
    frames.reduce(_ unionByName _)
      .orderBy(col("scenario"), col("component"), col("file_no").desc,
        col("line_no"))
  }

  /** Debug logs over the synthesis, since = max ts − 48 h. */
  def debugLogs(spark: SparkSession, dir: String): DataFrame = {
    val f = logFiles(spark, dir).localCheckpoint()
    val since = Tables.events(spark, dir)
      .agg((max(col("ts")) - expr("INTERVAL 48 HOURS")).as("since_ts"))
    debugLogsOf(f, since, LogScenarios)
  }

  // ------------------------------------------------------------------
  // log_prune — log_pruner.rs
  // ------------------------------------------------------------------

  /** The log-directory axis: active files (old AND young), rotated
    * and dated compressed variants on both sides of the retention
    * cutoff. Ages in hours. */
  def logDirRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("daemon.jsonl", 100.0, 500L),
      ("mcp-server.jsonl", 100.0, 700L),
      ("workspace.log", 100.0, 300L),
      ("daemon.jsonl.1.gz", 48.0, 1000L),
      ("daemon.jsonl.2.gz", 12.0, 900L),
      ("workspace.2026-01-24.log.gz", 72.0, 1100L),
      ("mcp-server.1.jsonl", 40.0, 200L),
      ("debug.log", 35.5, 50L),
      ("old.log.gz", 48.0, 77L))
      .toDF("name", "age_hours", "size")
  }

  /** is_active_log (log_pruner.rs:153). */
  def isActive(name: Column): Column =
    name.isin("daemon.jsonl", "mcp-server.jsonl", "workspace.log")

  /** §3 `*Of` form: per-file verdicts for both modes, the live-mode
    * deletion summary, the dry-run candidate count, and the
    * run_if_due gate arms (interval 12 h). */
  def logPruneOf(dir: DataFrame, retentionHours: Double): DataFrame = {
    val verdict = when(isActive(col("name")), lit("active"))
      .when(col("age_hours") > retentionHours, lit("delete"))
      .otherwise(lit("keep"))
    val perMode = Seq("live", "dry_run").map { m =>
      dir.select(lit("file").as("section"), lit(m).as("mode"),
        col("name"), verdict.as("verdict"),
        col("age_hours"), col("size"))
    }.reduce(_ unionByName _)
    val deletable = dir.filter(!isActive(col("name")) &&
      col("age_hours") > retentionHours)
    val summary = deletable.agg(count(lit(1)).as("n"), sum(col("size")).as("b"))
      .select(explode(map(
        lit("live:files_deleted"), col("n"),
        lit("live:bytes_freed"), col("b"),
        lit("dry_run:files_deleted"), lit(0L),
        lit("dry_run:candidates"), col("n"))).as(Seq("k", "v")))
      .select(lit("summary").as("section"),
        split(col("k"), ":").getItem(0).as("mode"),
        split(col("k"), ":").getItem(1).as("name"),
        lit(null).cast("string").as("verdict"),
        lit(null).cast("double").as("age_hours"), col("v").as("size"))
    val due = dir.sparkSession.createDataFrame(Seq(
      ("never", None: Option[Double]), ("recent", Some(3.0)),
      ("stale", Some(20.0))))
      .toDF("gate", "last_prune_age_hours")
      .select(lit("due").as("section"), col("gate").as("mode"),
        lit(null).cast("string").as("name"),
        when(col("last_prune_age_hours").isNotNull &&
          col("last_prune_age_hours") < 12.0, lit("skip"))
          .otherwise(lit("run")).as("verdict"),
        col("last_prune_age_hours").as("age_hours"),
        lit(null).cast("long").as("size"))
    perMode.unionByName(summary).unionByName(due)
      .orderBy(col("section"), col("mode"), col("name"))
  }

  def logPrune(spark: SparkSession, dir: String): DataFrame =
    logPruneOf(logDirRows(spark), 36.0)
}
