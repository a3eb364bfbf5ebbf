package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining TUI browser data layers — the queue browser
  * (cli/src/tui/views/queue_data.rs), the file-list popup
  * (file_list_data.rs), and the log viewer's level parser
  * (logs_data.rs). The search/graph tabs' data halves are RPC fronts
  * over operators this library already implements (grep_search /
  * narrative traversals / hybrid_rrf), and the rules/scratchpad tabs
  * are bare ORDER BY reads over stores the reconcile operators cover —
  * so the three views here are the ones with their own analytics.
  *
  * Scale posture: the queue browser is five filtered top-200 rank
  * windows over one queue scan (shuffle ∝ queue rows) with every
  * lookup map (names / kinds / roots) a config-sized broadcast; the
  * file list is one broadcast registry join + a per-watch rank window;
  * the log parser is map-only with a single top-200 tail window.
  */
object TuiBrowsers {

  // ------------------------------------------------------------------
  // tui_queue — queue_data.rs fetch_queue_rows
  // ------------------------------------------------------------------

  /** short_id (output/style.rs:64): first DEFAULT_ID_LENGTH=8 chars.
    * The reference walks back to a char boundary; ids here are ASCII,
    * where byte and char boundaries coincide. */
  private def shortId(id: Column): Column =
    when(length(id) <= 8, id).otherwise(substring(id, 1, 8))

  /** Last non-empty path component, Rust
    * `rsplit('/').find(!is_empty).unwrap_or(path)`. */
  private def basenameOf(p: Column): Column =
    coalesce(try_element_at(filter(split(p, "/"), c => c =!= ""), lit(-1)), p)

  /** The queue browser's enriched unified_queue synthesis: the
    * QueueStatus residue conventions plus a payload_json axis carrying
    * every object-extraction arm (queue/formatters.rs extract_object/
    * extract_object_relative/extract_size_bytes):
    *
    *  - `file` rows cycle relative / `./`-prefixed / absolute-under-
    *    the-tenant-root / absolute-elsewhere paths, with size_bytes
    *    present, absent, or wrong-typed (the serde `as_u64` None arm);
    *  - `folder` rows cycle absolute-under-root and relative paths;
    *  - a slice of `text` rows is remapped to `url`/`website`/`doc` so
    *    the URL pass-through and the title arm are live;
    *  - remaining `text` rows cycle title / over-40-char content
    *    (the truncate_str `...` arm) / `{}`;
    *  - `tenant` rows carry `{}`, with an unparseable non-JSON slice
    *    (extract falls back to the empty object string).
    *
    * Tenant roots ride a broadcast registry join (the reference builds
    * the same map from watch_folders). */
  def browserQueue(spark: SparkSession, dir: String,
                   registry: DataFrame): DataFrame = {
    val eid = expr("CAST(substring(queue_id, 3) AS BIGINT)")
    val base = QueueStatus.queue(spark, dir)
      .withColumn("eid", eid)
      .withColumn("item_type",
        when(col("item_type") === "text" && pmod(col("eid"), lit(5)) === 0,
          lit("url"))
          .when(col("item_type") === "text" && pmod(col("eid"), lit(5)) === 1,
            lit("website"))
          .when(col("item_type") === "text" && pmod(col("eid"), lit(5)) === 2,
            lit("doc"))
          .otherwise(col("item_type")))
      .join(broadcast(registry.select(col("tenant_id").as("r_tenant"),
        col("path").as("tenant_path"))),
        col("tenant_id") === col("r_tenant"), "left")
    val m = pmod(col("eid"), lit(4))
    val filePayload =
      when(m === 0, concat(lit("{\"file_path\":\"src/f"), pmod(col("eid"), lit(50)),
        lit(".rs\",\"size_bytes\":"), pmod(col("eid"), lit(9000)) + 100, lit("}")))
        .when(m === 1, concat(lit("{\"file_path\":\"./x/y"),
          pmod(col("eid"), lit(50)), lit(".md\"}")))
        .when(m === 2, concat(lit("{\"file_path\":\""), col("tenant_path"),
          lit("/deep/a"), pmod(col("eid"), lit(50)),
          lit(".py\",\"size_bytes\":"), pmod(col("eid"), lit(7000)) + 50, lit("}")))
        .otherwise(concat(lit("{\"file_path\":\"/elsewhere/z"),
          pmod(col("eid"), lit(50)), lit(".go\",\"size_bytes\":\"big\"}")))
    val folderPayload =
      when(pmod(col("eid"), lit(2)) === 0,
        concat(lit("{\"folder_path\":\""), col("tenant_path"), lit("/sub/dir"),
          pmod(col("eid"), lit(20)), lit("\"}")))
        .otherwise(concat(lit("{\"folder_path\":\"rel/dir"),
          pmod(col("eid"), lit(20)), lit("\"}")))
    val textPayload =
      when(pmod(col("eid"), lit(3)) === 0,
        concat(lit("{\"title\":\"note "), pmod(col("eid"), lit(40)), lit("\"}")))
        .when(pmod(col("eid"), lit(3)) === 1,
          concat(lit("{\"content\":\""), repeat(lit("c"), 41), lit("-"),
            pmod(col("eid"), lit(9)), lit("\"}")))
        .otherwise(lit("{}"))
    base.withColumn("payload_json",
        when(col("item_type") === "file", filePayload)
          .when(col("item_type") === "folder", folderPayload)
          .when(col("item_type").isin("url", "website"),
            concat(lit("{\"url\":\"https://ex.com/p/"),
              pmod(col("eid"), lit(100)), lit("\"}")))
          .when(col("item_type").isin("text", "doc"), textPayload)
          .when(pmod(col("eid"), lit(7)) === 0, lit("not json"))
          .otherwise(lit("{}")))
      .drop("r_tenant", "tenant_path", "eid")
  }

  /** truncate_str(s, 40): ≤40 chars verbatim, else take(37) + `...`. */
  private def truncate40(s: Column): Column =
    when(length(s) <= 40, s).otherwise(concat(substring(s, 1, 37), lit("...")))

  /** relativize (formatters.rs:330): strip the `/`-rtrimmed root prefix
    * (NO segment-boundary check — the reference's strip_prefix is a
    * plain string prefix here), trim leading slashes, empty → NULL. */
  private def relativize(path: Column, root: Column): Column = {
    val r = rtrim(root, "/")
    val rest = regexp_replace(path.substr(length(r) + 1, lit(1 << 20)),
      "^/+", "")
    when(root.isNotNull && path.startsWith(r) && rest =!= "", rest)
  }

  /** extract_object_relative (formatters.rs:305) in the column domain:
    * `root` may be NULL (tenant not in the top-level map). A payload
    * that fails to parse yields NULL from every `get_json_object`
    * probe, so each arm falls to its empty-string default exactly like
    * the reference's parse-failure early return. */
  private def objectRelative(itemType: Column, payload: Column,
                             root: Column): Column = {
    val fp = get_json_object(payload, "$.file_path")
    val fo = get_json_object(payload, "$.folder_path")
    def pathArm(p: Column, isDir: Boolean): Column = {
      val rel = when(p.startsWith("/"),
        coalesce(relativize(p, root), basenameOf(p)))
        .otherwise(regexp_replace(p, "^(\\./)+", ""))
      if (isDir) concat(rel, lit("/")) else rel
    }
    when(itemType === "file",
        when(fp.isNull, lit("")).otherwise(pathArm(fp, isDir = false)))
      .when(itemType === "folder",
        when(fo.isNull, lit("")).otherwise(pathArm(fo, isDir = true)))
      .when(itemType.isin("url", "website"),
        coalesce(get_json_object(payload, "$.url"), lit("")))
      .when(itemType.isin("text", "doc"),
        coalesce(truncate40(get_json_object(payload, "$.title")),
          truncate40(get_json_object(payload, "$.content")), lit("")))
      .otherwise(lit(""))
  }

  /** format_relative_time (queue_data.rs:309): bucketed `Ns ago`/`Nm
    * ago`/`Nh ago`/`Nd ago`, `future` for negative spans. */
  def relativeAge(secs: Column): Column =
    when(secs < 0, lit("future"))
      .when(secs < 60, concat(secs, lit("s ago")))
      .when(secs < 3600, concat((secs / 60).cast("long"), lit("m ago")))
      .when(secs < 86400, concat((secs / 3600).cast("long"), lit("h ago")))
      .otherwise(concat((secs / 86400).cast("long"), lit("d ago")))

  /** §3 `*Of` form of fetch_queue_rows over (queue, registry, now):
    * all five StatusFilter variants in one plan (a filter axis ×
    * per-filter `ORDER BY created_at DESC LIMIT 200` rank, totalized
    * by queue_id), with the three tenant maps from the TOP-LEVEL
    * registry rows — display names with the `name (short_id)`
    * collision suffix (:253), kind 'L'/'P' by collection with '?' for
    * unmapped tenants (:153), and roots for the relative object
    * rendering. */
  def tuiQueueOf(queue: DataFrame, registry: DataFrame,
                 now: DataFrame): DataFrame = {
    val top = registry.filter(col("parent_watch_id").isNull)
    // rsplit('/').find(non-empty).unwrap_or(tenant_id) — :244.
    val nameBase = top.select(col("tenant_id").as("n_tenant"),
      coalesce(try_element_at(filter(split(col("path"), "/"), c => c =!= ""),
        lit(-1)), col("tenant_id")).as("nm"))
    val names = nameBase
      .withColumn("n_coll", count(lit(1)).over(Window.partitionBy(col("nm"))))
      .select(col("n_tenant"),
        when(col("n_coll") > 1,
          concat(col("nm"), lit(" ("), shortId(col("n_tenant")), lit(")")))
          .otherwise(col("nm")).as("display"))
    val kinds = top.select(col("tenant_id").as("k_tenant"),
      when(col("collection") === "libraries", lit("L")).otherwise(lit("P"))
        .as("kind"))
    val roots = top.select(col("tenant_id").as("r_tenant"),
      col("path").as("root"))

    val filters = explode(array(lit("all"), lit("pending"), lit("in_progress"),
      lit("failed"), lit("done"))).as("filter")
    val ranked = queue.select(col("*"), filters)
      .filter(col("filter") === "all" || col("status") === col("filter"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("filter"))
        .orderBy(col("created_at").desc, col("queue_id"))))
      .filter(col("rk") <= 200)

    ranked
      .join(broadcast(names), col("tenant_id") === col("n_tenant"), "left")
      .join(broadcast(kinds), col("tenant_id") === col("k_tenant"), "left")
      .join(broadcast(roots), col("tenant_id") === col("r_tenant"), "left")
      .crossJoin(broadcast(now))
      .select(
        col("filter"), col("rk"), col("queue_id"),
        shortId(col("queue_id")).as("short_id"),
        col("tenant_id"),
        coalesce(col("display"), shortId(col("tenant_id"))).as("project"),
        objectRelative(col("item_type"), col("payload_json"), col("root"))
          .as("object"),
        col("item_type"), col("op"), col("status"),
        relativeAge(unix_seconds(col("now_ts")) -
          unix_seconds(col("created_at"))).as("age"),
        coalesce(col("kind"), lit("?")).as("kind"),
        // extract_size_bytes: only a JSON NUMBER counts (serde as_u64 —
        // get_json_object renders numbers bare and strings unquoted, so
        // the digit gate keyed on the corpus's string arms matches).
        when(get_json_object(col("payload_json"), "$.size_bytes")
          .rlike("^[0-9]+$"),
          get_json_object(col("payload_json"), "$.size_bytes"))
          .cast("long").as("size_bytes"))
      .orderBy(col("filter"), col("rk"))
  }

  /** fetch_queue_rows over the syntheses, anchored at the queue's max
    * created_at (the reference anchors at wall-clock `now`). */
  def tuiQueue(spark: SparkSession, dir: String): DataFrame = {
    val registry = TuiViews.registry(spark, dir)
    val q = browserQueue(spark, dir, registry).localCheckpoint()
    tuiQueueOf(q, registry, q.agg(max(col("created_at")).as("now_ts")))
  }

  // ------------------------------------------------------------------
  // tui_files — file_list_data.rs fetch_from_conn
  // ------------------------------------------------------------------

  /** §3 `*Of` form of the file-list popup fetch: tracked_files joined
    * to watch_folders, `wf.path || '/' || tf.relative_path` absolute
    * paths, nullable size_bytes kept (the popup shows `size: None`
    * rather than dropping the row), `ORDER BY relative_path LIMIT
    * 5000` per watch. The reference runs one query per watch_id; the
    * batch twin carries every watch in one plan partitioned by watch
    * (the scoped_search generalization). */
  def tuiFilesOf(registry: DataFrame, tracked: DataFrame): DataFrame = {
    val wf = registry.select(col("watch_id"), col("path"))
    tracked.join(broadcast(wf),
        tracked("watch_folder_id") === wf("watch_id"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("watch_folder_id"))
          .orderBy(col("relative_path"))))
      .filter(col("rk") <= 5000)
      .select(col("watch_folder_id"), col("rk"), col("relative_path"),
        concat(col("path"), lit("/"), col("relative_path")).as("abs_path"),
        col("size_bytes"),
        coalesce(col("chunk_count"), lit(0L)).as("chunk_count"))
      .orderBy(col("watch_folder_id"), col("relative_path"))
  }

  def tuiFiles(spark: SparkSession, dir: String): DataFrame =
    tuiFilesOf(TuiViews.registry(spark, dir), TuiViews.tracked(spark, dir))

  // ------------------------------------------------------------------
  // log_levels — logs_data.rs Level::from_line + read_tail_lines
  // ------------------------------------------------------------------

  /** The synthetic JSONL log over the events axis — one line per
    * event, cycling every parser arm: the five string levels plus the
    * ERR/FATAL/WARNING aliases, a spaced `"level" : "INFO"` line, pino
    * numeric levels across all five buckets, an unknown string level
    * (NOTICE → None), a string-typed NUMERIC level ("42" → the numeric
    * fallback maps it — from_line's unadvertised arm), a missing-level
    * line, a non-JSON line, and a `"level":,`-malformed line (digit
    * scan ends at 0 → None). Line order is the event_id. */
  def logLines(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id").as("line_no"),
      {
        val v = pmod(col("event_id"), lit(13))
        when(v === 0, concat(lit("{\"timestamp\":\"t\",\"level\":\"ERROR\",\"msg\":\"m"),
          col("event_id"), lit("\"}")))
          .when(v === 1, lit("{\"level\":\"err\",\"msg\":\"m\"}"))
          .when(v === 2, lit("{\"level\":\"FATAL\",\"msg\":\"m\"}"))
          .when(v === 3, lit("{\"level\":\"WARNING\",\"msg\":\"m\"}"))
          .when(v === 4, lit("{ \"level\" : \"INFO\" , \"msg\": \"x\" }"))
          .when(v === 5, lit("{\"level\":\"DEBUG\",\"msg\":\"m\"}"))
          .when(v === 6, lit("{\"level\":\"TRACE\",\"msg\":\"m\"}"))
          .when(v === 7, concat(lit("{\"level\":"), pmod(col("event_id"), lit(70)),
            lit(",\"msg\":\"n\"}")))
          .when(v === 8, lit("{\"level\":\"NOTICE\",\"msg\":\"m\"}"))
          .when(v === 9, lit("{\"level\":\"42\",\"msg\":\"m\"}"))
          .when(v === 10, lit("{\"msg\":\"no level\"}"))
          .when(v === 11, lit("plain text line"))
          .otherwise(lit("{\"level\":,\"msg\":\"m\"}"))
      }.as("line"))

  /** extract_json_level (logs_data.rs:75) as one column expression:
    * find the FIRST `"level"` key, skip optional whitespace, require a
    * `:`, then either the quoted-string value (to the next quote) or
    * the leading digit run (empty → NULL). The reference trims with
    * Rust `trim_start`; lines here use plain spaces, which `ltrim`
    * matches. */
  def extractJsonLevel(line: Column): Column = {
    val idx = locate("\"level\"", line)
    val afterKey = line.substr(idx + 7, lit(1 << 20))
    val afterTrim = ltrim(afterKey)
    val afterColon = ltrim(substring(afterTrim, 2, 1 << 20))
    val stringVal = {
      val rest = substring(afterColon, 2, 1 << 20)
      val endq = locate("\"", rest)
      when(endq > 0, rest.substr(lit(1), endq - 1))
    }
    val numVal = {
      val digits = regexp_extract(afterColon, "^([0-9]+)", 1)
      when(digits =!= "", digits)
    }
    when(idx > 0 && afterTrim.startsWith(":"),
      when(afterColon.startsWith("\""), stringVal).otherwise(numVal))
  }

  /** Level::from_line's label mapping: the string table first, then
    * the numeric-parse fallback (which also catches string-typed
    * numerics) with the pino buckets 50+/40/30/20/else. */
  def levelLabel(levelVal: Column): Column = {
    val u = upper(levelVal)
    // ANSI-safe numeric fallback: gate the cast behind a digit probe
    // (parse::<u64> succeeds exactly on digit runs in this grammar).
    val n = when(levelVal.rlike("^[0-9]+$"), levelVal).cast("long")
    when(u.isin("ERROR", "ERR", "FATAL"), lit("ERROR"))
      .when(u.isin("WARN", "WARNING"), lit("WARN"))
      .when(u === "INFO", lit("INFO"))
      .when(u === "DEBUG", lit("DEBUG"))
      .when(u === "TRACE", lit("TRACE"))
      .when(n.isNotNull && n >= 50, lit("ERROR"))
      .when(n.isNotNull && n >= 40, lit("WARN"))
      .when(n.isNotNull && n >= 30, lit("INFO"))
      .when(n.isNotNull && n >= 20, lit("DEBUG"))
      .when(n.isNotNull, lit("TRACE"))
  }

  /** §3 `*Of` form of the log viewer's tail load (read_tail_lines):
    * blank lines dropped, the last MAX_LINES=200 lines kept in file
    * order, each annotated with its parsed level label (NULL = no
    * detected level, rendered unstyled). */
  def logLevelsOf(lines: DataFrame): DataFrame =
    lines.filter(trim(col("line")) =!= "")
      .withColumn("tail_rk",
        row_number().over(Window.orderBy(col("line_no").desc)))
      .filter(col("tail_rk") <= 200)
      .select(col("line_no"), col("line"),
        levelLabel(extractJsonLevel(col("line"))).as("level"))
      .orderBy(col("line_no"))

  def logLevels(spark: SparkSession, dir: String): DataFrame =
    logLevelsOf(logLines(spark, dir))
}
