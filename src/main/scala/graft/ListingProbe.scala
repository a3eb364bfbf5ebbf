package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamOps

/** Dev tool: measure the streaming file source's per-trigger LISTING
  * term against the manifest source on a MANY-FILES corpus — the §4
  * claim ("O(all files) per trigger vs O(new segments)") as a number.
  *
  * Builds a one-doc-per-file layout of the ×10 documents table
  * (tens of thousands of part files — the shape a 100 TB corpus's
  * table directory actually has), then runs the SAME store pipeline
  * through (a) the file source forced into `triggers` micro-batches
  * via maxFilesPerTrigger — each batch re-lists the whole directory —
  * and (b) the manifest source with `triggers` segments — each batch
  * lists only the manifest dir and reads exactly its named files.
  *
  * `runMain graft.ListingProbe [srcDir] [files] [triggers]`.
  */
object ListingProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("target/synth-corpus-x10")
    val files = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val triggers = args.drop(2).headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val manyDir = s"target/manyfiles-$files"
    if (!new java.io.File(s"$manyDir/documents.parquet/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      Tables.documents(spark, srcDir)
        .repartition(files)
        .write.mode("overwrite").parquet(s"$manyDir/documents.parquet")
      System.err.println(f"[listing] built $manyDir (${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    val nFiles = new java.io.File(s"$manyDir/documents.parquet")
      .listFiles().count(_.getName.startsWith("part-"))
    val perTrigger = math.max(1, math.ceil(nFiles.toDouble / triggers).toInt)

    // Both variants run the SAME transform through the SAME sink (a
    // foreachBatch parquet append) so the measured difference is
    // discovery alone: (a) re-lists the whole data directory every
    // trigger (FileStreamSource.fetchMaxOffset), (b) lists only the
    // manifest dir and file-indexes exactly the new segment's paths.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    def sinkTo(outDir: java.io.File)(df: DataFrame): Long = {
      val q = df.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.Ingest.pointRows(
            graft.operators.Ingest.chunkWithMeta(batch, 200, 50, Seq("lang", "source")), 8)
            .write.mode("append").parquet(outDir.getAbsolutePath)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir.getAbsolutePath).count()
    }
    // (a) file source, forced into `triggers` batches. Dev-only knob —
    // the REGISTERED twin never sets maxFilesPerTrigger (batch layout
    // is part of its oracle-pinned semantics).
    def fileSourceRun(): Long = {
      val out = new java.io.File("target/listing-file-out"); rm(out)
      sinkTo(out)(
        spark.readStream.schema(StreamOps.documentsSchema)
          .option("maxFilesPerTrigger", perTrigger.toString)
          .parquet(s"$manyDir/documents.parquet"))
    }
    // (b) manifest source: stream the manifest segments; foreachBatch
    // resolves each batch's named data files with a batch read, then
    // the same transform/sink. (Inlined rather than calling the
    // registered streamingStoreManifestOnce so the sink matches (a)
    // exactly.)
    def manifestRun(): Long = {
      val dataFiles = new java.io.File(s"$manyDir/documents.parquet")
        .listFiles().filter(_.getName.startsWith("part-"))
        .map(_.getAbsolutePath).sorted.toSeq
      val mDir = new java.io.File("target/listing-manifest"); rm(mDir); mDir.mkdirs()
      dataFiles.grouped(perTrigger).zipWithIndex.foreach { case (fs, i) =>
        java.nio.file.Files.writeString(
          new java.io.File(mDir, f"seg-$i%05d.txt").toPath,
          fs.mkString("", "\n", "\n"))
      }
      val out = new java.io.File("target/listing-manifest-out"); rm(out)
      val q = spark.readStream
        .option("maxFilesPerTrigger", "1")
        .text(mDir.getAbsolutePath)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val paths = batch.collect().map(_.getString(0)).filter(_.nonEmpty)
          if (paths.nonEmpty) {
            val docs = spark.read.schema(StreamOps.documentsSchema)
              .parquet(paths.toIndexedSeq: _*)
            graft.operators.Ingest.pointRows(
              graft.operators.Ingest.chunkWithMeta(docs, 200, 50, Seq("lang", "source")), 8)
              .write.mode("append").parquet(out.getAbsolutePath)
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out.getAbsolutePath).count()
    }

    for (round <- 1 to 2) {
      val t1 = System.nanoTime()
      val nf = fileSourceRun()
      val fileSec = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val nm = manifestRun()
      val manifestSec = (System.nanoTime() - t2) / 1e9
      require(nf == nm, s"row mismatch: file=$nf manifest=$nm")
      println(f"[listing] round $round files=$nFiles triggers=$triggers rows=$nf  " +
        f"file_source=$fileSec%.1fs  manifest=$manifestSec%.1fs")
    }
    spark.stop()
  }
}
