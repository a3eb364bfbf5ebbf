package graft

import org.apache.spark.sql.SparkSession

import graft.operators.VectorSearch

/** Dev tool: measured recall@k of the ANN paths against brute force,
  * sweeping the knobs that trade cost for recall.
  * `runMain graft.Recall [sfDir]`.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = sets(VectorSearch.knnJoin(spark, sfDir, probeMax = 5L, k = k))
    val sweeps = Seq(
      "ann_lsh tables=4"  -> (() => VectorSearch.annLsh(spark, sfDir, tables = 4)),
      "ann_lsh tables=8"  -> (() => VectorSearch.annLsh(spark, sfDir, tables = 8)),
      "ann_lsh tables=16" -> (() => VectorSearch.annLsh(spark, sfDir, tables = 16)),
      "ann_ivf ce=50 np=1"  -> (() => VectorSearch.annIvf(spark, sfDir, centroidEvery = 50, nprobe = 1)),
      "ann_ivf ce=50 np=3"  -> (() => VectorSearch.annIvf(spark, sfDir, centroidEvery = 50, nprobe = 3)),
      "ann_ivf ce=50 np=5"  -> (() => VectorSearch.annIvf(spark, sfDir, centroidEvery = 50, nprobe = 5)),
      "ann_ivf ce=20 np=5"  -> (() => VectorSearch.annIvf(spark, sfDir, centroidEvery = 20, nprobe = 5)),
      "ann_ivf ce=20 np=10" -> (() => VectorSearch.annIvf(spark, sfDir, centroidEvery = 20, nprobe = 10)),
      "ann_ivf ce=20 np=10 lloyd=3" -> (() =>
        VectorSearch.annIvf(spark, sfDir, centroidEvery = 20, nprobe = 10, lloydIters = 3)))
    sweeps.foreach { case (name, mk) =>
      val t0 = System.nanoTime()
      val got = sets(mk())
      val sec = (System.nanoTime() - t0) / 1e9
      val recalls = exact.map { case (p, ex) =>
        got.getOrElse(p, Set.empty).count(ex).toDouble / ex.size
      }
      println(f"[recall] $name%-18s recall@$k = ${recalls.sum / recalls.size}%.3f  ($sec%.1fs)")
    }
    spark.stop()
  }
}
