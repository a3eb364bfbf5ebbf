package graft.operators

import graft.SparkSpec

/** The triage.rs verdict cascade on fixtures: permanent prefixes, the
  * non-file guard, and both should_drop_* decision trees. */
class QueueTriageSpec extends SparkSpec {

  import spark.implicits._

  private def failed(rows: (String, String, String, String)*) =
    // (queue_id, item_type, op, error) over one (t1, projects) tenant.
    rows.map { case (id, it, op, err) => (id, it, op, err, "t1", "projects") }
      .toDF("queue_id", "item_type", "op", "error_message", "tenant_id",
        "collection")
      .selectExpr("queue_id", "item_type", "op", "error_message",
        "tenant_id", "collection",
        "CASE WHEN queue_id LIKE '%nopath%' THEN NULL " +
          "ELSE 'src/' || queue_id || '.rs' END AS file_path")

  private val registry = Seq(("t1", "projects")).toDF("tenant_id", "collection")
  private val noTracked =
    Seq.empty[(String, String, String, Long)]
      .toDF("tenant_id", "collection", "relative_path", "chunk_count")
  private val noExists =
    Seq.empty[(String, String, String)]
      .toDF("tenant_id", "collection", "exists_path")

  private def verdicts(q: org.apache.spark.sql.DataFrame,
                       tracked: org.apache.spark.sql.DataFrame = noTracked,
                       exists: org.apache.spark.sql.DataFrame = noExists) =
    QueueTriage.triageOf(q, registry, tracked, exists).collect()
      .map(r => r.getAs[String]("queue_id") ->
        ((r.getAs[String]("action"), r.getAs[String]("route"),
          r.getAs[String]("reason")))).toMap

  test("permanent prefixes route to the DLQ before any other check (triage.rs:60)") {
    val v = verdicts(failed(
      ("q1", "text", "scan", "[permanent_exhausted] out of retries"),
      ("q2", "file", "delete", "[permanent_data] bad payload"),
      ("q3", "file", "add", "[permanent_gone] vanished"),
      ("q4", "text", "scan", "io error")))
    assert(v("q1") == (("dropped", "dlq", "permanent")))
    assert(v("q2") == (("dropped", "dlq", "permanent")))
    assert(v("q3") == (("dropped", "dlq", "permanent")))
    assert(v("q4") == (("skipped", "kept", "non_file"))) // falls through
  }

  test("failed delete: no-path, untracked and zero-chunk rows drop; chunked rows wait for the store (should_drop_failed_delete)") {
    val tracked = Seq(
      ("t1", "projects", "src/qchunks.rs", 3L),
      ("t1", "projects", "src/qempty.rs", 0L))
      .toDF("tenant_id", "collection", "relative_path", "chunk_count")
    val v = verdicts(failed(
      ("qnopath", "file", "delete", "e"),
      ("qchunks", "file", "delete", "e"),
      ("qempty", "file", "delete", "e"),
      ("quntracked", "file", "delete", "e")), tracked = tracked)
    assert(v("qnopath") == (("dropped", "deleted", "delete_no_path")))
    assert(v("qchunks") == (("skipped", "kept", "delete_has_chunks")))
    assert(v("qempty") == (("dropped", "deleted", "delete_no_chunks")))
    assert(v("quntracked") == (("dropped", "deleted", "delete_untracked")))
  }

  test("failed add/update: only a resolvable watch with a missing file drops (should_drop_failed_add_update)") {
    val exists = Seq(("t1", "projects", "src/qhere.rs"))
      .toDF("tenant_id", "collection", "exists_path")
    val other = failed(("qorphan", "file", "update", "e"))
      .withColumn("tenant_id", lit("t-unknown"))
    val v = verdicts(failed(
      ("qgone", "file", "add", "e"),
      ("qhere", "file", "update", "e"),
      ("qnopath", "file", "add", "e"))
      .unionByName(other), exists = exists)
    assert(v("qgone") == (("dropped", "deleted", "file_missing")))
    assert(v("qhere") == (("skipped", "kept", "file_present")))
    assert(v("qnopath") == (("skipped", "kept", "no_path")))
    assert(v("qorphan") == (("skipped", "kept", "no_watch")))
  }

  test("corpus slice: exactly 100 examined, every verdict arm live") {
    val rows = QueueTriage.queueTriage(spark, sfDir).collect()
    assert(rows.length == 100)
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    assert(reasons.contains("permanent"))
    assert(reasons.contains("non_file"))
  }

  private def lit(s: String) = org.apache.spark.sql.functions.lit(s)
}
