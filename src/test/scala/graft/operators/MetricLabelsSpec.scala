package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with monitoring/labels/cardinality.rs (AC1–AC4). */
class MetricLabelsSpec extends SparkSpec {

  import spark.implicits._
  import MetricLabels._

  private def bound(rows: Seq[(Long, String, String)], cap: Int = DefaultCap) =
    metricLabelsOf(rows.toDF("event_id", "raw_language", "path"), cap)
      .filter(col("section") === "event").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[String]("bounded_language"),
          r.getAs[String]("bounded_file_type"))).toMap

  test("allow-set languages pass verbatim; unknown and TAIL languages collapse to other (AC1/AC2)") {
    val got = bound(Seq(
      (1L, "python", "x"), (2L, "rust", "x"), (3L, "c-sharp", "x"),
      (4L, "cobol", "x"), (5L, "", "x"),
      // zig/vala sit past the default cap of 40 — bounded away.
      (6L, "zig", "x"), (7L, "vala", "x")))
    assert(got(1L)._1 == "python" && got(2L)._1 == "rust" &&
      got(3L)._1 == "c-sharp")
    assert(got(4L)._1 == Other && got(5L)._1 == Other)
    assert(got(6L)._1 == Other && got(7L)._1 == Other)
    // A smaller cap tightens the set (the env-override contract).
    val capped = bound(Seq((1L, "rust", "x"), (2L, "java", "x")), cap = 4)
    assert(capped(1L)._1 == Other && capped(2L)._1 == "java")
  }

  test("file_type: case-insensitive extension map, unknown/missing → other (AC4)") {
    val got = bound(Seq(
      (1L, "x", "a/b/main.PY"), (2L, "x", "src/app.rs"),
      (3L, "x", "x/y.Ts"), (4L, "x", "doc/readme.MD"),
      (5L, "x", "data/file.xyz"), (6L, "x", "Makefile"),
      // Tail-language extension bounds away through the same gate.
      (7L, "x", "pkg/mod.zig")))
    assert(got(1L)._2 == "python" && got(2L)._2 == "rust" &&
      got(3L)._2 == "typescript" && got(4L)._2 == "markdown")
    assert(got(5L)._2 == Other && got(6L)._2 == Other && got(7L)._2 == Other)
  }

  test("at most cap+1 distinct series per label, even under junk floods (AC3)") {
    val junk = (0 until 400).map(i =>
      (i.toLong, s"lang_${i % 97}_${(i * 31) % 13}", s"f$i.ext$i")) ++
      BundledLanguages.zipWithIndex.map { case (l, i) =>
        ((1000 + i).toLong, l, "x.py") }
    val series = metricLabelsOf(junk.toDF("event_id", "raw_language", "path"),
        DefaultCap)
      .filter(col("section") === "series" && col("raw_language") === "language")
      .collect().map(_.getAs[String]("path")).toSet
    assert(series.size <= DefaultCap + 1, s"got ${series.size} series")
    assert(series.contains(Other))
  }

  test("corpus series view stays bounded and counts every event") {
    val rows = metricLabels(spark, sfDir).collect()
    val events = rows.count(_.getAs[String]("section") == "event")
    val series = rows.filter(_.getAs[String]("section") == "series")
    for (label <- Seq("language", "file_type")) {
      val s = series.filter(_.getAs[String]("raw_language") == label)
      assert(s.length <= DefaultCap + 1)
      assert(s.map(_.getAs[Long]("n")).sum == events)
    }
  }
}
