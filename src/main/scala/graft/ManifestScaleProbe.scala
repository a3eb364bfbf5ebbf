package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Dev tool (round-15 board #6): the manifest SOURCE's per-trigger
  * discovery term at decade-3 segment counts, measured — LISTING_r12
  * priced the FILE source's full-directory listing; the manifest
  * source's O(segments-in-dir) discovery claim was structural but
  * unmeasured past sf0.1.
  *
  * Protocol per segment count N ∈ counts:
  *  1. seal N one-path segments (written directly — the writer API's
  *     per-append dir scan is O(N²) for a bulk build) in a fresh
  *     manifest dir, plus a durable checkpoint;
  *  2. catch up in ONE AvailableNow trigger (maxFilesPerTrigger = N);
  *  3. run a ProcessingTime(0) stream on the same checkpoint and read
  *     per-trigger `durationMs.latestOffset` out of the query's own
  *     `recentProgress` ring — the exact discovery wall:
  *     FileStreamSource lists the manifest dir and filters against its
  *     seen-files map every trigger, whether or not anything is new.
  *     (Read directly from the query object, NOT via a
  *     StreamingQueryListener — measured here: listener delivery
  *     silently missed every event for a full 600 s window while the
  *     ring buffer filled normally.) The stream-restart recovery wall
  *     (offset-WAL replay + seen-map rebuild, which grows with N) is
  *     waited out and reported separately as first_progress_after. A
  *     few fresh segments are appended during the window so idle and
  *     delivering triggers are both sampled;
  *  4. compact the manifest to ONE segment and re-sample — the
  *     post-compaction floor.
  *
  * The foreachBatch body only counts paths (no data read): the probe
  * isolates DISCOVERY, which is independent of the batch body.
  * Output: one line per (N, phase) with median/p90 discovery ms and
  * the segment-file count on disk. `runMain graft.ManifestScaleProbe
  * [counts-csv]` (default 1000,10000,100000).
  */
object ManifestScaleProbe {
  def main(args: Array[String]): Unit = {
    val counts = args.headOption.getOrElse("1000,10000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // idle triggers record progress (and so a latestOffset duration —
      // the pure-discovery sample) at this cadence; the 10s default
      // yields zero idle samples inside the probe's ~10s window
      .config("spark.sql.streaming.noDataProgressEventInterval", "500")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }

    val countBatch = (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                      _: Long) => { batch.count(); () }

    for (n <- counts) {
      val work = new java.io.File(s"target/manifest-scale-$n")
      if (work.exists()) rm(work)
      val manifestDir = new java.io.File(work, "manifest"); manifestDir.mkdirs()
      val ckpt = new java.io.File(work, "ckpt")
      val t0 = System.nanoTime()
      (0 until n).foreach { i =>
        java.nio.file.Files.writeString(
          new java.io.File(manifestDir, f"seg-$i%07d.txt").toPath,
          s"/data/part-$i.parquet\n")
      }
      System.err.println(
        f"[manifest] built $n segments (${(System.nanoTime() - t0) / 1e9}%.1fs)")

      def measure(phase: String): Unit = {
        val tStart = System.nanoTime()
        val q = spark.readStream
          .option("maxFilesPerTrigger", "1")
          .text(manifestDir.getAbsolutePath)
          .writeStream
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .foreachBatch(countBatch)
          .trigger(Trigger.ProcessingTime(0))
          .start()
        // Restart recovery (offset-WAL replay + seen-map rebuild from
        // the file-source metadata log) grows with segment count and
        // can dwarf the sample window — wait it out and REPORT it: it
        // is the restart-cost term of the same scaling story.
        val initDeadline = System.nanoTime() + 900L * 1000 * 1000 * 1000
        while (q.recentProgress.isEmpty && q.exception.isEmpty &&
               System.nanoTime() < initDeadline) Thread.sleep(200)
        val initS = (System.nanoTime() - tStart) / 1e9
        val skip = q.recentProgress.length // init-phase entries: not sampled
        // sample idle + delivering triggers; a few fresh appends land
        // mid-window so the seen-map filter runs against real news
        (0 until 4).foreach { k =>
          Thread.sleep(1500)
          graft.streaming.StreamOps.appendManifestSegment(
            manifestDir, Seq(s"/data/new-$phase-$k.parquet"))
        }
        Thread.sleep(4000)
        val progresses = q.recentProgress.drop(skip)
        q.exception.foreach(e => System.err.println(s"[manifest] QUERY FAILED: $e"))
        q.stop(); q.awaitTermination()
        val ds = progresses.toSeq
          .flatMap(p => Option(p.durationMs.get("latestOffset")).map(_.toLong))
          .filter(_ >= 0).sorted
        val delivered = progresses.count(_.numInputRows > 0)
        val segsOnDisk = Option(manifestDir.listFiles()).map(_.length).getOrElse(0)
        if (ds.nonEmpty)
          println(f"[manifest] n=$n%7d phase=$phase%-10s segs_on_disk=$segsOnDisk%7d " +
            f"restart_recovery=$initS%6.1fs triggers=${ds.size}%3d " +
            f"(delivering=$delivered) discovery_ms med=${ds(ds.size / 2)}%6d " +
            f"p90=${ds((ds.size * 9) / 10)}%6d max=${ds.last}%6d")
        else
          println(f"[manifest] n=$n phase=$phase NO SAMPLES " +
            f"(restart_recovery=$initS%6.1fs)")
      }

      // catch-up: one big trigger consumes the backlog so the steady
      // state starts with the seen-map fully loaded
      val tCatch = System.nanoTime()
      val catchup = spark.readStream
        .option("maxFilesPerTrigger", n.toString)
        .text(manifestDir.getAbsolutePath)
        .writeStream
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch(countBatch)
        .trigger(Trigger.AvailableNow())
        .start()
      catchup.awaitTermination()
      println(f"[manifest] n=$n catchup wall=${(System.nanoTime() - tCatch) / 1e9}%.1fs")

      measure("steady")
      val t1 = System.nanoTime()
      graft.streaming.StreamOps.compactManifest(manifestDir)
      println(f"[manifest] n=$n compaction wall=${(System.nanoTime() - t1) / 1e9}%.2fs")
      measure("compacted")
      rm(work)
    }
    spark.stop()
  }
}
