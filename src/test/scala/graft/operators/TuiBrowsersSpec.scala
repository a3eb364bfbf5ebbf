package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with the TUI browser data layers' own unit vectors —
  * queue/formatters.rs (extract_object_relative / extract_size_bytes),
  * queue_data.rs (relative time, name/kind maps), file_list_data.rs
  * (fetch_from_conn), and logs_data.rs (Level::from_line /
  * extract_json_level) — plus corpus-level arm checks. */
class TuiBrowsersSpec extends SparkSpec {

  import spark.implicits._

  /** Run extract_object_relative through the operator's column pipeline
    * on a literal (item_type, payload, root) frame. */
  private def objects(rows: Seq[(String, String, Option[String])]): Seq[String] = {
    val registry = rows.zipWithIndex.map { case ((_, _, root), i) =>
      ("w-" + i, "t" + i, root.orNull, null: String, "projects")
    }.toDF("watch_id", "tenant_id", "path", "parent_watch_id", "collection")
    val queue = rows.zipWithIndex.map { case ((it, pj, _), i) =>
      ("q-" + i, "t" + i, it, pj, "add", "pending")
    }.toDF("queue_id", "tenant_id", "item_type", "payload_json", "op", "status")
      .withColumn("created_at", to_timestamp(lit("2024-01-01 00:00:00")))
    val now = Seq(1).toDF("x")
      .select(to_timestamp(lit("2024-01-01 00:00:30")).as("now_ts"))
    TuiBrowsers.tuiQueueOf(queue, registry, now)
      .filter(col("filter") === "all")
      .orderBy(col("queue_id"))
      .collect().map(_.getAs[String]("object")).toSeq
  }

  test("relative object strips the root, tolerating a trailing slash (formatters.rs relative_object_strips_root)") {
    val payload = """{"file_path":"/home/u/proj/src/main.rs"}"""
    assert(objects(Seq(
      ("file", payload, Some("/home/u/proj")),
      ("file", payload, Some("/home/u/proj/")))) == Seq("src/main.rs", "src/main.rs"))
  }

  test("absolute path with unknown or wrong root falls back to the basename (formatters.rs relative_object_falls_back_to_basename)") {
    val payload = """{"file_path":"/home/u/proj/src/main.rs"}"""
    assert(objects(Seq(
      ("file", payload, None),
      ("file", payload, Some("/other")))) == Seq("main.rs", "main.rs"))
  }

  test("already-relative paths are kept verbatim; leading ./ runs are trimmed (formatters.rs relative_object_keeps_already_relative_path)") {
    assert(objects(Seq(
      ("file", """{"file_path":"a/b/c/notes.md"}""", Some("/home/u/proj")),
      ("file", """{"file_path":"a/b/c/notes.md"}""", None),
      ("file", """{"file_path":"./x/y.rs"}""", None),
      ("file", """{"file_path":"././z.rs"}""", None))) ==
      Seq("a/b/c/notes.md", "a/b/c/notes.md", "x/y.rs", "z.rs"))
  }

  test("folders keep a trailing slash; urls pass through; text truncates at 40 (formatters.rs relative_folder_keeps_trailing_slash / passthrough)") {
    val over = "x" * 45
    assert(objects(Seq(
      ("folder", """{"folder_path":"/home/u/proj/src/util"}""", Some("/home/u/proj")),
      ("folder", """{"folder_path":"rel/dir"}""", None),
      ("url", """{"url":"https://example.com/x"}""", Some("/root")),
      ("text", s"""{"content":"$over"}""", None),
      ("text", """{"title":"short"}""", None),
      ("tenant", """{}""", None),
      ("file", "not json", None))) ==
      Seq("src/util/", "rel/dir/", "https://example.com/x",
        "x" * 37 + "...", "short", "", ""))
  }

  test("size_bytes: JSON numbers extracted, strings/absent/unparseable → NULL (formatters.rs size_bytes_extracted_when_present)") {
    val registry = Seq(("w-0", "t0", "/p", null: String, "projects"))
      .toDF("watch_id", "tenant_id", "path", "parent_watch_id", "collection")
    val queue = Seq(
      ("q-0", """{"file_path":"a.rs","size_bytes":2048}"""),
      ("q-1", """{"file_path":"a.rs"}"""),
      ("q-2", """{"size_bytes":"big"}"""),
      ("q-3", "not json"))
      .toDF("queue_id", "payload_json")
      .withColumn("tenant_id", lit("t0"))
      .withColumn("item_type", lit("file"))
      .withColumn("op", lit("add"))
      .withColumn("status", lit("pending"))
      .withColumn("created_at", to_timestamp(lit("2024-01-01 00:00:00")))
    val now = Seq(1).toDF("x")
      .select(to_timestamp(lit("2024-01-01 00:00:01")).as("now_ts"))
    val sizes = TuiBrowsers.tuiQueueOf(queue, registry, now)
      .filter(col("filter") === "all").orderBy(col("queue_id"))
      .collect().map(r => Option(r.getAs[java.lang.Long]("size_bytes")))
    assert(sizes.toSeq == Seq(Some(2048L), None, None, None))
  }

  test("relative age buckets: s/m/h/d and the future arm (queue_data.rs format_relative_time)") {
    val secs = Seq(-5L, 0L, 59L, 60L, 3599L, 3600L, 86399L, 86400L, 200000L)
      .toDF("secs")
    val got = secs.select(TuiBrowsers.relativeAge(col("secs")).as("age"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("future", "0s ago", "59s ago", "1m ago", "59m ago",
      "1h ago", "23h ago", "1d ago", "2d ago"))
  }

  test("top-level name collisions carry the (short_id) suffix; nested tenants read kind '?' (queue_data.rs build_tenant_name_map/kind_map)") {
    // Deterministic fixture: two top-level folders named `app` (one a
    // library), one nested folder, one tenant with no registry row, and
    // a long tenant id exercising the 8-char short_id cut.
    val registry = Seq(
      ("w1", "tenant-aaaa", "/home/u/app", null: String, "projects"),
      ("w2", "t2", "/srv/app", null: String, "libraries"),
      ("w3", "t3", "/srv/app/nested", "w2", "projects"))
      .toDF("watch_id", "tenant_id", "path", "parent_watch_id", "collection")
    val queue = Seq("tenant-aaaa", "t2", "t3", "t-unregistered")
      .zipWithIndex.map { case (t, i) => ("q-" + i, t) }
      .toDF("queue_id", "tenant_id")
      .withColumn("item_type", lit("tenant"))
      .withColumn("payload_json", lit("{}"))
      .withColumn("op", lit("add"))
      .withColumn("status", lit("pending"))
      .withColumn("created_at", to_timestamp(lit("2024-01-01 00:00:00")))
    val now = Seq(1).toDF("x")
      .select(to_timestamp(lit("2024-01-01 00:00:01")).as("now_ts"))
    val rows = TuiBrowsers.tuiQueueOf(queue, registry, now)
      .filter(col("filter") === "all")
      .collect().map(r => r.getAs[String]("tenant_id") ->
        (r.getAs[String]("project"), r.getAs[String]("kind"))).toMap
    // Collision → `name (short_id)`; short_id cuts at 8 chars.
    assert(rows("tenant-aaaa") == ("app (tenant-a)", "P"))
    assert(rows("t2") == ("app (t2)", "L"))
    // Nested folder is absent from the top-level maps: short-id
    // fallback name, kind '?'; same for an unregistered tenant.
    assert(rows("t3") == ("t3", "?"))
    assert(rows("t-unregistered") == ("t-unregi", "?"))

    // Corpus: wherever the docs tenants appear in the five slices, the
    // suffix and kind arms hold (w-8 library docs vs w-11 project docs).
    val corpus = TuiBrowsers.tuiQueue(spark, sfDir)
      .select(col("tenant_id"), col("project"), col("kind"))
      .distinct().collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    corpus.get("src8").foreach(v => assert(v == ("docs (src8)", "L")))
    corpus.get("src11").foreach(v => assert(v == ("docs (src11)", "P")))
    corpus.get("src13").foreach(v => assert(v == ("src13", "?")))
    corpus.get("src17").foreach(v => assert(v == ("src17", "?")))
    corpus.get("src3").foreach(v => assert(v == ("proj-3", "P")))
  }

  test("every status filter slice holds only its status, capped at 200 (queue_data.rs build_query arms)") {
    val rows = TuiBrowsers.tuiQueue(spark, sfDir)
      .groupBy(col("filter")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("status")).as("statuses"),
        max(col("rk")).as("max_rk"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(rows("all")._2 == 4)
    for (f <- Seq("pending", "in_progress", "failed", "done"))
      assert(rows(f)._2 == 1 && rows(f)._1 <= 200)
    assert(rows.values.forall(_._3 <= 200))
  }

  // ── file_list_data.rs ────────────────────────────────────────────

  test("file list: per-watch relative_path order, abs-path reconstruction, chunk counts (file_list_data.rs fetches)") {
    val registry = Seq(("w1", "/project"), ("w2", "/library"))
      .toDF("watch_id", "path")
    val tracked = Seq(
      ("w1", "src/main.rs", Some(8192L), 3L),
      ("w1", "src/lib.rs", None, 5L),
      ("w2", "docs/guide.md", Some(10L), 1L),
      ("w3", "ghost.txt", None, 0L))
      .toDF("watch_folder_id", "relative_path", "size_bytes", "chunk_count")
    val rows = TuiBrowsers.tuiFilesOf(registry, tracked).collect()
    // w3 has no registered watch folder → no rows (the reference's
    // unknown-watch empty result).
    assert(rows.map(_.getAs[String]("watch_folder_id")).toSet == Set("w1", "w2"))
    val w1 = rows.filter(_.getAs[String]("watch_folder_id") == "w1")
      .sortBy(_.getAs[Int]("rk"))
    assert(w1.map(_.getAs[String]("relative_path")).toSeq ==
      Seq("src/lib.rs", "src/main.rs"))
    assert(w1.head.getAs[String]("abs_path") == "/project/src/lib.rs")
    assert(Option(w1.head.getAs[java.lang.Long]("size_bytes")).isEmpty)
    assert(w1.last.getAs[Long]("size_bytes") == 8192L)
    assert(w1.head.getAs[Long]("chunk_count") == 5L)
  }

  // ── logs_data.rs ─────────────────────────────────────────────────

  private def levelOf(lines: Seq[String]): Seq[Option[String]] = {
    val df = lines.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("line_no", "line")
    TuiBrowsers.logLevelsOf(df).orderBy(col("line_no"))
      .collect().map(r => Option(r.getAs[String]("level"))).toSeq
  }

  test("level from JSON string values incl. aliases (logs_data.rs level_from_json_*)") {
    assert(levelOf(Seq(
      """{"timestamp":"2025-01-01T00:00:00Z","level":"ERROR","msg":"fail"}""",
      """{"level":"WARN","msg":"caution"}""",
      """{"level":"INFO","msg":"ok"}""",
      """{"level":"DEBUG","msg":"verbose"}""",
      """{"level":"fatal","msg":"m"}""",
      """{"level":"warning","msg":"m"}""")) ==
      Seq(Some("ERROR"), Some("WARN"), Some("INFO"), Some("DEBUG"),
        Some("ERROR"), Some("WARN")))
  }

  test("numeric pino levels bucket 50+/40/30/20/else (logs_data.rs level_from_numeric_pino)") {
    assert(levelOf(Seq(
      """{"level":50,"msg":"error"}""",
      """{"level":40,"msg":"warn"}""",
      """{"level":30,"msg":"info"}""",
      """{"level":20,"msg":"debug"}""",
      """{"level":10,"msg":"trace"}""",
      """{"level":70,"msg":"big"}""")) ==
      Seq(Some("ERROR"), Some("WARN"), Some("INFO"), Some("DEBUG"),
        Some("TRACE"), Some("ERROR")))
  }

  test("no level / unknown level / malformed value → None; spaces tolerated (logs_data.rs level_from_unknown / extract_json_level_with_spaces)") {
    assert(levelOf(Seq(
      """{"msg":"no level here"}""",
      """{ "level" : "INFO" , "msg": "ok" }""",
      """{"level":"NOTICE","msg":"m"}""",
      """{"level":,"msg":"m"}""",
      "plain text",
      """{"level":"42","msg":"m"}""")) ==
      Seq(None, Some("INFO"), None, None, None, Some("WARN")))
  }

  test("tail keeps the last 200 non-blank lines in file order (logs_data.rs read_tail_lines)") {
    val lines = (0 until 250).map(i => (i.toLong,
      if (i % 10 == 3) "   " else s"""{"level":"INFO","msg":"line $i"}"""))
      .toDF("line_no", "line")
    val got = TuiBrowsers.logLevelsOf(lines).collect()
    assert(got.length == 200)
    // Blank lines are dropped BEFORE the tail cut: 225 non-blank lines
    // exist, the first 25 of them fall off.
    val kept = got.map(_.getAs[Long]("line_no"))
    assert(kept.min >= 27 && kept.max == 249)
    assert(!got.exists(r => r.getAs[String]("line").trim.isEmpty))
  }
}
