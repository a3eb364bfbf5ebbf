package graft.operators

import graft.SparkSpec

/** Parity with the reference's reconciliation sweeps: the filesystem
  * reconcile arms (idle/tasks/filesystem_reconcile.rs), the recovery
  * re-queue classification (startup/recovery/reconcile.rs), and the
  * capability-upgrade selections (tracked_files_schema/reconcile.rs).
  */
class ReconcileSpec extends SparkSpec {

  test("fs reconcile: missing wins over oversized; unlimited exts never oversize; 0-chunk keeps") {
    import spark.implicits._
    val tracked = Seq(
      // (file_id, relative_path, branch, chunks, size, exists)
      (1L, "src/data.json", "main", 3L, 600L * 1024, true),   // oversized json → reprocess
      (2L, "src/data.json", "main", 3L, 100L * 1024, true),   // under limit → keep
      (3L, "src/data.json", "main", 0L, 600L * 1024, true),   // not indexed → keep (#121 gate)
      (4L, "src/main.py", "main", 3L, 900L * 1024 * 1024, true), // no limit for py → keep
      (5L, "src/data.json", "main", 3L, 600L * 1024, false),  // missing → delete, not reprocess
      (6L, "src/app.yaml", null, 1L, 600L * 1024, true)       // null branch → 'default'
    ).toDF("file_id", "relative_path", "primary_branch", "chunk_count",
        "size_bytes", "fs_exists")
      .withColumn("watch_folder_id", org.apache.spark.sql.functions.lit("w1"))
    val folders = Seq(("w1", "/proj/w1", "t1", "c1"))
      .toDF("watch_id", "watch_path", "tenant_id", "collection")
    val out = Reconcile.fsReconcileOf(tracked, folders)
      .collect().map(r => r.getAs[Long]("file_id") ->
        (r.getAs[String]("action"), r.getAs[String]("op"), r.getAs[String]("branch"))).toMap
    assert(out(1L) == (("reprocess", "update", "main")))
    assert(out(2L) == (("keep", null, "main")))
    assert(out(3L) == (("keep", null, "main")))
    assert(out(4L) == (("keep", null, "main")))
    assert(out(5L) == (("delete", "delete", "main")))
    assert(out(6L)._3 == "default")
  }

  test("fs reconcile corpus query keeps all three arms live") {
    val out = Reconcile.fsReconcile(spark, sfDir).collect()
    val acts = out.groupBy(_.getAs[String]("action")).view.mapValues(_.length).toMap
    assert(acts.keySet == Set("delete", "reprocess", "keep"))
    out.filter(_.getAs[String]("action") == "reprocess").foreach { r =>
      assert(r.getAs[Long]("chunk_count") > 0 && !r.isNullAt(r.fieldIndex("limit_kb")))
      assert(r.getAs[Long]("size_bytes") > r.getAs[Long]("limit_kb") * 1024)
    }
    out.filter(_.getAs[String]("action") == "delete")
      .foreach(r => assert(!r.getAs[Boolean]("fs_exists")))
  }

  test("recovery reconcile: orphan clears, present updates, missing deletes; metadata carried") {
    val out = Reconcile.recoveryReconcile(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byAction = out.groupBy(_.getAs[String]("action"))
    assert(byAction.keySet == Set("clear_flag", "update", "delete"))
    byAction("clear_flag").foreach { r =>
      assert(r.getAs[String]("watch_folder_id") == "ghost")
      assert(r.isNullAt(r.fieldIndex("metadata")))
    }
    (byAction("update") ++ byAction("delete")).foreach { r =>
      assert(r.getAs[String]("metadata") == Reconcile.ReconcileMetadata)
    }
  }

  test("scratchpad reconcile matches by content VALUE, keys the enqueue by sha256[..32]") {
    import spark.implicits._
    val mirror = Seq(
      ("sp-1", "T1", "shared body", "t0", "src1"),   // content in store → present
      ("sp-2", "T2", "only mirror", "t1", "src2")    // absent → enqueue
    ).toDF("id", "title", "content", "tags", "tenant_id")
    val store = Seq("shared body", "other note").toDF("content")
    val out = Reconcile.scratchpadReconcileOf(mirror, store)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[String]("action"), r.getAs[String]("idem_key"))).toMap
    assert(out("sp-1")._1 == "present" && out("sp-1")._2 == null)
    assert(out("sp-2")._1 == "enqueue")
    val payload =
      """{"content":"only mirror","source_type":"scratchpad","tags":"t1","title":"T2"}"""
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"text|add|src2|scratchpad|$payload".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out("sp-2")._2 == hex.take(32))
    val corpus = Reconcile.scratchpadReconcile(spark, sfDir).collect()
    assert(corpus.exists(_.getAs[String]("action") == "present") &&
      corpus.exists(_.getAs[String]("action") == "enqueue"))
  }

  test("upgrade select: per-reason status predicates and the language filter arm") {
    val out = Reconcile.upgradeSelect(spark, sfDir).collect()
    val byReason = out.groupBy(_.getAs[String]("reason"))
    assert(byReason.keySet ==
      Set("grammar_available", "lsp_available", "enrichment_retry"))
    // grammar_available carries the language filter: only .py files survive.
    byReason("grammar_available").foreach { r =>
      assert(r.getAs[String]("relative_path").endsWith(".py"))
    }
    // A tenant axis exists and branches coalesce.
    assert(out.map(_.getAs[String]("tenant_id")).distinct.length > 1)
    assert(out.forall(r => r.getAs[String]("primary_branch") != null))
    assert(out.exists(_.getAs[String]("primary_branch") == "default"))
  }
}
