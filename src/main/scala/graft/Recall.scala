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
    val n = graft.Tables.embeddings(spark, sfDir).count()
    // (name, top-k frame, candidate frame for scanned-fraction — null for LSH)
    def ivf(name: String, nc: Int, np: Int, r: Int = 1, it: Int = 10,
            init: String = "k-means||") =
      (s"ann_ivf $name",
        () => VectorSearch.annIvf(spark, sfDir, numCentroids = nc, nprobe = np,
          replicas = r, kmeansIters = it, kmeansInit = init),
        () => VectorSearch.ivfCandidates(spark, sfDir, numCentroids = nc, nprobe = np,
          replicas = r, kmeansIters = it, kmeansInit = init))
    val sweeps = Seq(
      ("ann_lsh tables=4", () => VectorSearch.annLsh(spark, sfDir, tables = 4), null),
      ("ann_lsh tables=8", () => VectorSearch.annLsh(spark, sfDir, tables = 8), null),
      ("ann_lsh tables=16", () => VectorSearch.annLsh(spark, sfDir, tables = 16), null),
      ivf("k=200 np=5", 200, 5),
      ivf("k=500 np=12 it=5", 500, 12, it = 5),
      ivf("k=500 np=18 it=5", 500, 18, it = 5),
      ivf("k=500 np=20 it=5", 500, 20, it = 5))
    sweeps.foreach { case (name, mk, cand) =>
      val t0 = System.nanoTime()
      val got = sets(mk())
      val sec = (System.nanoTime() - t0) / 1e9
      val recalls = exact.map { case (p, ex) =>
        got.getOrElse(p, Set.empty).count(ex).toDouble / ex.size
      }
      val scanned = if (cand == null) Double.NaN
        else cand().count().toDouble / (5.0 * n)
      println(f"[recall] $name%-20s recall@$k = ${recalls.sum / recalls.size}%.3f  " +
        f"scanned = $scanned%.3f  ($sec%.1fs)")
    }
    spark.stop()
  }
}
