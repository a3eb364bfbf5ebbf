package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool (round 15): per-query execution-shape stats — jobs, stages,
  * tasks, task-time vs CPU-time, shuffle bytes — for a set of queries.
  * Separates LATENCY-bound queries (many sequential jobs/stages, low
  * CPU) from COMPUTE-bound ones (task CPU ≈ task time), which decides
  * the §1 target: fewer materializations/exchanges vs cheaper per-row
  * work. `runMain graft.JobStats <name1,name2,...> [sfDir]`.
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTime = new AtomicLong; val cpuTime = new AtomicLong
    val shufRead = new AtomicLong; val shufWrite = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTime.addAndGet(m.executorRunTime)
          cpuTime.addAndGet(m.executorCpuTime / 1000000L)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    }
    // one untimed warmup
    try SparkEntry.queries("q1_agg")(spark, sfDir).count() catch { case _: Throwable => () }
    try {
      Seq(
        graft.operators.GraphFusion.explainsGraph(spark, sfDir),
        graft.operators.CrossBoundary.conceptGraph(spark, sfDir),
        graft.operators.GraphQueries.narrativeGraph(spark, sfDir)
      ).foreach { case (e, n) => e.count(); n.count() }
    } catch { case _: Throwable => () }
    val protectedIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    println(f"${"query"}%-30s ${"wall"}%7s ${"jobs"}%5s ${"stages"}%7s " +
      f"${"tasks"}%6s ${"taskSec"}%8s ${"cpuSec"}%8s ${"shR_MB"}%7s ${"shW_MB"}%7s")
    for (name <- names) {
      val fn = Probe.targetFn(name)
      try fn(spark, sfDir).queryExecution.toRdd.count() catch { case _: Throwable => () } // warm
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      Seq(jobs, stages, tasks).foreach(_.set(0))
      Seq(taskTime, cpuTime, shufRead, shufWrite).foreach(_.set(0L))
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).queryExecution.toRdd.count() catch { case _: Throwable => () }
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events before reading the counters (the bus is
      // private; a short settle sleep is enough for a dev tool)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"$name%-30s $wall%7.2f ${jobs.get}%5d ${stages.get}%7d " +
        f"${tasks.get}%6d ${taskTime.get / 1e3}%8.1f ${cpuTime.get / 1e3}%8.1f " +
        f"${shufRead.get / 1e6}%7.1f ${shufWrite.get / 1e6}%7.1f")
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => protectedIds.contains(id) }
        .values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
