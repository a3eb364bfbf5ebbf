package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool (round 15): dump `.explain("formatted")` for a set of
  * queries into plan files the optimization round commits as evidence.
  *
  * `runMain graft.PlanDump <tag> <name1,name2,...> [sfDir]` writes
  * `plans/r15/<name>_<tag>.txt` per query. Names resolve through
  * [[Probe.targetFn]] so probe-only twins (nosort sinks, knob points)
  * can be dumped alongside registered queries.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outDir = Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16"))
    Files.createDirectories(outDir)
    for (name <- names) {
      try {
        val qe = Probe.targetFn(name)(spark, sfDir).queryExecution
        val formatted = qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(outDir.resolve(s"${name}_$tag.txt"), formatted)
        System.err.println(s"[plandump] wrote ${name}_$tag.txt (${formatted.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
