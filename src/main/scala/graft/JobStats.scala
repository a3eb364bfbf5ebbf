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
    // Per-job breakdown (round 16): wall per job id + the submission
    // GAP since the previous job ended — a large gap is DRIVER-side
    // work (planning, collect processing, checkpoint bookkeeping), a
    // large dur is cluster work. Enabled by SPARK_GRAFT_JOBSTATS_PERJOB.
    val perJob = sys.env.contains("SPARK_GRAFT_JOBSTATS_PERJOB")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val lastEnd = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) {
          val now = System.nanoTime()
          jobStart.put(j.jobId, now)
          val gap = if (lastEnd.get() == 0) 0.0 else (now - lastEnd.get()) / 1e9
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          System.err.println(f"[job] start id=${j.jobId}%-4d gap=$gap%6.3f  $desc")
        }
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (perJob) {
          val now = System.nanoTime()
          lastEnd.set(now)
          val dur = Option(jobStart.get(j.jobId)).map(s => (now - s) / 1e9).getOrElse(-1.0)
          System.err.println(f"[job] end   id=${j.jobId}%-4d dur=$dur%6.3f")
        }
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
    // In-process main-thread sampler (round 16; external attach is
    // unavailable in the sandbox): every 50 ms record main's top
    // catalyst/graft frame; a frequency table of these is a poor man's
    // flame graph for the driver-side gaps. SPARK_GRAFT_JOBSTATS_SAMPLE.
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    if (sys.env.contains("SPARK_GRAFT_JOBSTATS_SAMPLE")) {
      val mainThread = Thread.currentThread()
      val execMode = sys.env.get("SPARK_GRAFT_JOBSTATS_SAMPLE").contains("exec")
      val t = new Thread(() => {
        while (true) {
          if (execMode) {
            // Executor-side poor man's profiler: one sample per RUNNING
            // task thread per tick, attributed to the topmost
            // interesting frame (generated code, graft expressions,
            // catalyst eval, shuffle machinery).
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (th, st) =>
              if (th.getName.startsWith("Executor task launch") &&
                  th.getState == Thread.State.RUNNABLE && st.nonEmpty) {
                val frame = st.find(f =>
                    f.getClassName.contains("graft") ||
                    f.getClassName.contains("generated") ||
                    f.getClassName.contains("catalyst") ||
                    f.getClassName.contains("unsafe") ||
                    f.getClassName.contains("shuffle") ||
                    f.getClassName.contains("parquet"))
                  .map(f => f.getClassName + "." + f.getMethodName)
                  .getOrElse(st.head.getClassName + "." + st.head.getMethodName)
                sampleCounts.merge(frame, 1, (a: Integer, b: Integer) => a + b)
              }
            }
          } else {
            val st = mainThread.getStackTrace
            val frame = st.find(f =>
                f.getClassName.contains("catalyst") || f.getClassName.contains("graft") ||
                f.getClassName.startsWith("org.apache.spark.sql.execution"))
              .map(f => f.getClassName + "." + f.getMethodName)
              .getOrElse(st.headOption.map(f => f.getClassName + "." + f.getMethodName).getOrElse("?"))
            sampleCounts.merge(frame, 1, (a: Integer, b: Integer) => a + b)
          }
          Thread.sleep(50)
        }
      })
      t.setDaemon(true)
      t.start()
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        sampleCounts.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (f, c) =>
          System.err.println(f"[sample] $c%5d  $f")
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
      try {
        val qe = fn(spark, sfDir).queryExecution
        qe.toRdd.count()
        // Catalyst phase walls (analysis/optimization/planning) of the
        // FINAL query execution — construction-time eager actions'
        // planning is not attributed here, but a large number on the
        // final plan pinpoints driver-side planning cost (§7.3).
        if (perJob) {
          qe.tracker.phases.foreach { case (p, s) =>
            System.err.println(f"[phase] $name $p ${(s.endTimeMs - s.startTimeMs) / 1e3}%.3f s")
          }
          qe.tracker.topRulesByTime(8).foreach { case (rule, summary) =>
            System.err.println(f"[rule] $name ${summary.totalTimeNs / 1e9}%.3f s " +
              f"invocations=${summary.numInvocations} effective=${summary.numEffectiveInvocations} $rule")
          }
        }
      } catch { case _: Throwable => () }
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
