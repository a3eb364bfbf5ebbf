package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{CoreAnalytics, PayloadOps}

class StreamOpsSpec extends SparkSpec {

  test("streaming windowed counts equal the batch twin on the same input") {
    val streamed = StreamOps.streamingWindowOnce(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = CoreAnalytics.windowEvents(spark, sfDir)
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (k, (n, s)) =>
      assert(streamed(k)._1 == n, s"count at $k")
      assert(math.abs(streamed(k)._2 - s) < 1e-6, s"sum at $k")
    }
  }

  test("streaming session windows equal the batch twin (complete mode), " +
    "append mode withholds exactly the watermark-open tail") {
    val gapMs = 1800L * 1000L
    val complete = StreamOps.sessionWindowOnce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val batch = PayloadOps.sessionWindowAgg(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // complete mode retains every session through the final trigger: the
    // streamed table IS the batch result (this is what the oracle gates)
    assert(complete.nonEmpty && complete == batch,
      s"complete-mode stream must equal batch: ${complete.size} vs ${batch.size}")
    // the unbounded-deployment append mode emits only watermark-closed
    // sessions, each matching the batch twin exactly
    val streamed = StreamOps.sessionWindowAppendOnce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed.nonEmpty, "stream must emit closed sessions")
    streamed.foreach { case (k, v) =>
      assert(batch.get(k).contains(v), s"session $k: stream=$v batch=${batch.get(k)}")
    }
    // sessions the stream withheld are exactly those still open at the
    // final watermark (last event + gap past maxTs - watermark delay)
    val events = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val maxTsMs = events.map(_._2).max
    val wmMs = maxTsMs - gapMs
    // session_window semantics: an event at exactly last+gap starts a
    // NEW session, so the split condition is >= gap
    val lastBySession: Map[(Long, Long), Long] = events.groupBy(_._1).flatMap {
      case (uid, rows) =>
        val ts = rows.map(_._2).sorted
        val out = scala.collection.mutable.Map[(Long, Long), Long]()
        var start = ts.head
        ts.zip(ts.head +: ts.init).foreach { case (t, prev) =>
          if (t - prev >= gapMs) start = t
          out((uid, start)) = t
        }
        out
    }
    val missing = batch.keySet -- streamed.keySet
    missing.foreach { case (uid, startTs) =>
      val last = lastBySession((uid, startTs.getTime))
      assert(last + gapMs > wmMs - 1000,
        s"withheld session ($uid, $startTs) closed at ${last + gapMs} " +
          s"well before watermark $wmMs — it should have been emitted")
    }
  }

  test("streaming store equals batch store_points row-for-row (same digests)") {
    val batch = graft.operators.Ingest.storePoints(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getDouble(4), r.getInt(5), r.getString(6), r.getString(7), r.getInt(8)))
    val streamed = StreamOps.streamingStoreOnce(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getDouble(4), r.getInt(5), r.getString(6), r.getString(7), r.getInt(8)))
    assert(streamed.nonEmpty)
    assert(streamed.toSet == batch.toSet,
      "stream and batch must build identical points (ids, digests, norms, payload)")
    assert(streamed.length == batch.length, "no duplicate points")
  }

  test("manifest-source streaming store equals the file-source twin row-for-row") {
    // The O(new-files)-discovery variant (round 12): the stream reads
    // appended manifest segments and each micro-batch loads exactly the
    // data files its segments name. On the same closed corpus the
    // emitted point set must be IDENTICAL to the listing file source's —
    // the sf0.1 reconciliation the round-11 board asked for runs here on
    // the larger corpus deliberately (multi-segment manifest, several
    // triggers), not just the spec-default SF.
    val dir = "/root/testdata/sf0.1"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getDouble(4), r.getInt(5), r.getString(6), r.getString(7), r.getInt(8)))
    val viaFiles = rows(StreamOps.streamingStoreOnce(spark, dir))
    val viaManifest = rows(StreamOps.streamingStoreManifestOnce(spark, dir))
    assert(viaManifest.nonEmpty)
    assert(viaManifest.toSet == viaFiles.toSet,
      "manifest-source and file-source streams must build identical points")
    assert(viaManifest.length == viaFiles.length, "no duplicate points")
  }

  test("manifest compaction: exactly-once enumeration, identical store output") {
    // Writer-side compaction (round 12): seal a long per-file append
    // history, compact to one segment, and the store over the compacted
    // manifest must equal the file-source twin — each data file
    // enumerated exactly once (duplicate appends would duplicate
    // points; the length equality below catches that too).
    val viaFiles = StreamOps.streamingStoreOnce(spark, sfDir).collect()
      .map(_.toSeq)
    val viaCompacted = StreamOps
      .streamingStoreCompactedManifestOnce(spark, sfDir).collect()
      .map(_.toSeq)
    assert(viaCompacted.nonEmpty)
    assert(viaCompacted.toSet == viaFiles.toSet,
      "compacted-manifest store must build the file-source twin's points")
    assert(viaCompacted.length == viaFiles.length, "exactly-once enumeration")

    // the compaction primitive itself: distinct union, append order,
    // merged inputs deleted, survives appends after compaction
    val mdir = new java.io.File("target/manifest-compact-spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    if (mdir.exists()) rm(mdir)
    StreamOps.appendManifestSegment(mdir, Seq("/a", "/b"))
    StreamOps.appendManifestSegment(mdir, Seq("/b", "/c"))
    val compacted = StreamOps.compactManifest(mdir)
    val appended = StreamOps.appendManifestSegment(mdir, Seq("/d"))
    val lines = mdir.listFiles().sortBy(_.getName).toSeq.flatMap(f =>
      java.nio.file.Files.readAllLines(f.toPath).toArray.toSeq.map(_.toString))
      .filter(_.nonEmpty)
    assert(mdir.listFiles().length == 2, "one compacted + one appended segment")
    assert(lines == Seq("/a", "/b", "/c", "/d"),
      s"distinct union in append order, then the post-compaction append: $lines")
    // monotonic numbering across compaction: a checkpointed stream dedups
    // manifest files BY NAME, so neither the compacted output nor any
    // post-compaction append may reuse a retired segment name
    assert(compacted.getName == "seg-00002.txt",
      s"compacted segment must take max(merged)+1, got ${compacted.getName}")
    assert(appended.getName == "seg-00003.txt",
      s"post-compaction append must count past the compacted segment, got ${appended.getName}")
    val recompacted = StreamOps.compactManifest(mdir)
    assert(recompacted.getName == "seg-00004.txt",
      s"numbering must stay monotonic across repeated compactions, got ${recompacted.getName}")
  }

  test("manifest stream resumed on an existing checkpoint delivers " +
    "post-compaction appends (and re-delivery stays dedup-safe)") {
    // The round-12 footgun: compaction that restarts segment numbering
    // at seg-00000 makes a RESUMED checkpoint treat new segments as
    // already-processed names → silent data loss. Vector: run a
    // 2-segment manifest under a durable checkpoint, compact BETWEEN
    // runs, append a third corpus slice, resume on the SAME checkpoint.
    // The appended slice MUST reach the sink; the compacted segment's
    // re-delivery (its name is new to the checkpoint) duplicates old
    // points — the documented at-least-once cost, removed by the
    // (doc_id, chunk_index)-keyed distinct any point store applies.
    val work = new java.io.File("target/manifest-resume-spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    if (work.exists()) rm(work)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val slices = Seq(
      ("a", col("doc_id") % 3 === 0), ("b", col("doc_id") % 3 === 1),
      ("c", col("doc_id") % 3 === 2))
    slices.foreach { case (n, p) =>
      docs.filter(p).coalesce(1).write.mode("overwrite")
        .parquet(s"${work.getAbsolutePath}/corpus-$n")
    }
    def sliceFiles(n: String): Seq[String] =
      new java.io.File(work, s"corpus-$n").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val mdir = new java.io.File(work, "manifest")
    val out = new java.io.File(work, "points")
    val ckpt = Some(new java.io.File(work, "ckpt"))
    StreamOps.appendManifestSegment(mdir, sliceFiles("a"))
    StreamOps.appendManifestSegment(mdir, sliceFiles("b"))
    val first = StreamOps.runManifestStoreResumable(spark, mdir, out, ckpt)
      .collect().map(_.toSeq)
    assert(first.nonEmpty && first.length == first.toSet.size,
      "first run: exactly-once over the pre-compaction manifest")
    StreamOps.compactManifest(mdir)
    StreamOps.appendManifestSegment(mdir, sliceFiles("c"))
    val resumed = StreamOps.runManifestStoreResumable(spark, mdir, out, ckpt)
      .collect().map(_.toSeq)
    val expected = StreamOps.streamingStoreOnce(spark, sfDir)
      .collect().map(_.toSeq)
    // the data-loss assert: slice c (a post-compaction append under a
    // resumed checkpoint) must be present in the accumulated sink
    assert(resumed.toSet == expected.toSet,
      "resumed run must deliver the post-compaction segment: distinct " +
        s"points ${resumed.toSet.size} vs file-source twin ${expected.toSet.size}")
    // and the duplication observed is exactly the compacted segment's
    // re-delivery (slices a+b twice, slice c once) — never a gap
    assert(resumed.length == first.length * 2 + (expected.length - first.length),
      s"re-delivery accounting: got ${resumed.length}, first=${first.length}, " +
        s"total=${expected.length}")
  }

  test("manifest compaction crash window: a half-compacted dir duplicates, never drops") {
    // The compact-then-delete order's claim, pinned (round-14 board #6):
    // a crash BETWEEN writing the compacted segment and deleting the
    // merged inputs leaves BOTH the originals and the compacted copy on
    // disk. A stream resumed on an existing checkpoint over that state
    // must still deliver every path — the originals dedup BY NAME
    // against the checkpoint, the compacted segment re-delivers its
    // already-processed paths (the documented at-least-once cost), and
    // a post-crash append arrives exactly once.
    val work = new java.io.File("target/manifest-crash-spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
    }
    if (work.exists()) rm(work)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val slices = Seq(
      ("a", col("doc_id") % 3 === 0), ("b", col("doc_id") % 3 === 1),
      ("c", col("doc_id") % 3 === 2))
    slices.foreach { case (n, p) =>
      docs.filter(p).coalesce(1).write.mode("overwrite")
        .parquet(s"${work.getAbsolutePath}/corpus-$n")
    }
    def sliceFiles(n: String): Seq[String] =
      new java.io.File(work, s"corpus-$n").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val mdir = new java.io.File(work, "manifest")
    val out = new java.io.File(work, "points")
    val ckpt = Some(new java.io.File(work, "ckpt"))
    StreamOps.appendManifestSegment(mdir, sliceFiles("a"))
    StreamOps.appendManifestSegment(mdir, sliceFiles("b"))
    val first = StreamOps.runManifestStoreResumable(spark, mdir, out, ckpt)
      .collect().map(_.toSeq)
    assert(first.nonEmpty && first.length == first.toSet.size)

    // Simulate the crash EXACTLY: compactManifest's write happened, its
    // deletes did not. Snapshot the inputs, compact, restore them.
    val snapshot = mdir.listFiles().map(f =>
      (f.getName, java.nio.file.Files.readString(f.toPath))).toMap
    val compacted = StreamOps.compactManifest(mdir)
    snapshot.foreach { case (name, content) =>
      java.nio.file.Files.writeString(new java.io.File(mdir, name).toPath, content)
    }
    assert(mdir.listFiles().map(_.getName).sorted.toSeq ==
      (snapshot.keySet + compacted.getName).toSeq.sorted,
      "crash state: merged inputs AND the compacted segment coexist")

    // A writer that comes back AFTER the crash must still count past
    // the compacted high-water mark, not reuse a retired name.
    val appended = StreamOps.appendManifestSegment(mdir, sliceFiles("c"))
    assert(appended.getName == "seg-00003.txt",
      s"post-crash append counts past the compacted segment, got ${appended.getName}")

    val resumed = StreamOps.runManifestStoreResumable(spark, mdir, out, ckpt)
      .collect().map(_.toSeq)
    val expected = StreamOps.streamingStoreOnce(spark, sfDir)
      .collect().map(_.toSeq)
    // never drops: every path delivered despite the half-compacted dir
    assert(resumed.toSet == expected.toSet,
      "crash-state resume must deliver every path: distinct " +
        s"points ${resumed.toSet.size} vs file-source twin ${expected.toSet.size}")
    // duplicates ONLY from the compacted set: originals dedup by name
    // against the checkpoint, so accounting matches the clean-compaction
    // vector exactly — slices a+b twice (compacted re-delivery), c once
    assert(resumed.length == first.length * 2 + (expected.length - first.length),
      s"duplicates must come only from the compacted segment's re-delivery: " +
        s"got ${resumed.length}, first=${first.length}, total=${expected.length}")

    // Recovery: compacting the half-compacted dir heals it — one
    // segment, each path once, numbering still monotonic.
    val healed = StreamOps.compactManifest(mdir)
    assert(healed.getName == "seg-00004.txt",
      s"healing compaction continues the monotonic numbering, got ${healed.getName}")
    val healedLines = java.nio.file.Files.readAllLines(healed.toPath)
      .toArray.toSeq.map(_.toString).filter(_.nonEmpty)
    assert(healedLines.length == healedLines.toSet.size,
      "healed manifest enumerates each path exactly once")
    assert(healedLines.toSet ==
      (sliceFiles("a") ++ sliceFiles("b") ++ sliceFiles("c")).toSet,
      "healed manifest carries the full corpus")
  }

  test("stateful debounce stream equals the closed-log twin up to the watermark") {
    val debounceMs = 600L * 1000L
    val batch = PayloadOps.debounceEvents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val streamed = StreamOps.debounceOnce(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val maxTsMs = graft.Tables.events(spark, sfDir)
      .agg(max(col("ts"))).head.getTimestamp(0).getTime
    // Each user's final event is in the closed-log result unconditionally,
    // but the stream only flushes it when the final watermark passed its
    // quiet window — reconcile exactly at the ms-precision timeout rule.
    val tails = batch.groupBy(_._1).values
      .map(rs => rs.maxBy(r => (r._2.getTime, r._3))).toSet
    val expected = batch.filter(r =>
      !tails.contains(r) || r._2.getTime + debounceMs < maxTsMs).toSet
    assert(streamed.nonEmpty, "debounced stream must emit rows")
    assert(streamed.toSet == expected,
      s"stream (${streamed.length}) vs expected (${expected.size}); " +
        s"missing=${(expected -- streamed.toSet).take(3)} extra=${(streamed.toSet -- expected).take(3)}")
  }
}
