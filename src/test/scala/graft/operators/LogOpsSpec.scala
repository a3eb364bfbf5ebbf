package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with log_parsing.rs (LogLevel::from_json, key cascades,
  * LogFilter) and log_pruner.rs (retention + active-file + due-gate
  * vectors). */
class LogOpsSpec extends SparkSpec {

  import spark.implicits._
  import LogOps._

  private def levels(lines: Seq[String]): Seq[Option[String]] = {
    val df = lines.toDF("line")
    df.select(levelFromJson(col("line")).as("l")).collect()
      .map(r => Option(r.getAs[String]("l"))).toSeq
  }

  test("from_json buckets: 0-10/11-20/21-30/31-40/else — NOT the decade buckets the TUI viewer uses (log_parsing.rs:107)") {
    assert(levels(Seq(
      """{"level":10}""", """{"level":11}""", """{"level":20}""",
      """{"level":21}""", """{"level":30}""", """{"level":31}""",
      """{"level":40}""", """{"level":41}""", """{"level":45}""")) ==
      Seq(Some("trace"), Some("debug"), Some("debug"), Some("info"),
        Some("info"), Some("warn"), Some("warn"), Some("error"),
        Some("error")))
    // Divergence pinned: 45 is WARN in logs_data.rs (40..=49) but
    // ERROR here (31..=40 is the warn interval, everything above errs).
  }

  test("string levels via from_str; a string-typed numeric is NOT retried as a number (log_parsing.rs from_json string branch)") {
    assert(levels(Seq(
      """{"level":"ERROR"}""", """{"level":"err"}""", """{"level":"FATAL"}""",
      """{"level":"warning"}""", """{"level":"NOTICE"}""",
      """{"level":"42"}""")) ==
      Seq(Some("error"), Some("error"), Some("error"), Some("warn"),
        None, None))
  }

  test("the severity key backs up the level key (log_parsing.rs:172)") {
    assert(levels(Seq(
      """{"severity":30}""",
      """{"level":"DEBUG","severity":50}""",
      """{"msg":"none"}""",
      "not json")) ==
      Seq(Some("info"), Some("debug"), None, None))
  }

  test("without --since only the CURRENT file is read; with it rotated files join oldest-first (log_parsing.rs:334)") {
    val rows = debugLogs(spark, sfDir).collect()
    val bySc = rows.groupBy(_.getAs[String]("scenario"))
    for (s <- Seq("all", "errors", "session"))
      assert(bySc(s).forall(_.getAs[Long]("file_no") == 0L))
    assert(bySc("since").exists(_.getAs[Long]("file_no") > 0L))
    // Tail cap per (scenario, component).
    rows.groupBy(r => (r.getAs[String]("scenario"), r.getAs[String]("component")))
      .values.foreach(v => assert(v.length <= 100))
  }

  test("errors_only keeps error|warn; session filters by substring; since conservatively keeps timestamp-less entries (log_parsing.rs LogFilter)") {
    val rows = debugLogs(spark, sfDir).collect()
    val bySc = rows.groupBy(_.getAs[String]("scenario"))
    assert(bySc("errors").forall(r =>
      Seq("error", "warn").contains(r.getAs[String]("level"))))
    assert(bySc("session").forall(_.getAs[String]("session_id").contains("ss-3")))
    // The since slice carries rows with no parseable timestamp (the
    // non-JSON line, the missing-ts line, the bad-ts line).
    assert(bySc("since").exists(!_.getAs[Boolean]("has_time")))
  }

  test("retention verdicts: actives never pruned, age cutoff, dry-run deletes nothing (log_pruner.rs test_prune_old_files/test_active_logs_never_pruned/test_prune_dry_run)") {
    val rows = logPrune(spark, sfDir).collect()
    val files = rows.filter(r => r.getAs[String]("section") == "file" &&
      r.getAs[String]("mode") == "live")
      .map(r => r.getAs[String]("name") -> r.getAs[String]("verdict")).toMap
    assert(files("daemon.jsonl") == "active")
    assert(files("mcp-server.jsonl") == "active")
    assert(files("workspace.log") == "active")
    assert(files("daemon.jsonl.1.gz") == "delete")
    assert(files("daemon.jsonl.2.gz") == "keep")
    assert(files("workspace.2026-01-24.log.gz") == "delete")
    assert(files("mcp-server.1.jsonl") == "delete")
    assert(files("debug.log") == "keep")
    val summary = rows.filter(_.getAs[String]("section") == "summary")
      .map(r => (r.getAs[String]("mode"), r.getAs[String]("name")) ->
        r.getAs[Long]("size")).toMap
    assert(summary(("live", "files_deleted")) == 4L)
    assert(summary(("live", "bytes_freed")) == 1000L + 1100L + 200L + 77L)
    assert(summary(("dry_run", "files_deleted")) == 0L)
    assert(summary(("dry_run", "candidates")) == 4L)
  }

  test("run_if_due: no recorded prune or stale record runs, a recent one skips (log_pruner.rs test_run_if_due_skips_when_recent)") {
    val due = logPrune(spark, sfDir).collect()
      .filter(_.getAs[String]("section") == "due")
      .map(r => r.getAs[String]("mode") -> r.getAs[String]("verdict")).toMap
    assert(due == Map("never" -> "run", "recent" -> "skip", "stale" -> "run"))
  }
}
