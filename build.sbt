ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "workspaceqdrantmcpspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The bench/driver contract requires graft.Bench's single JSON metric
// line to reach stdout VERBATIM at the start of a line. sbt's default
// output strategy for forked runs (LoggedOutput) re-logs every stdout
// line as "[info] ..." — a line-oriented JSON parser then never sees
// `{"metric":...}` at line start (every driver BENCH_r*.json since
// round 1 carries `parsed: null`). StdoutOutput hands the forked JVM
// sbt's raw stdout/stderr instead.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
)
// Heap is scoped per task: the 24g pin is for bench/verify runs at
// sf0.1 (variance source: an 8g default paid GC pauses at
// sf0.1/local[32]); tests run at small SF and keep a modest default so
// contributor machines with less RAM fail cleanly instead of swapping.
// SPARK_DRIVER_MEM overrides both.
run / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
