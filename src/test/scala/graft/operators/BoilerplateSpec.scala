package graft.operators

import java.security.MessageDigest

import graft.{SparkSpec, Tables}

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("boilerplate_lines: per-source df, keep order, tab-trim parity") {
    val docs = Seq(
      (1L, "s1", "HEADER\nalpha\nbeta"),
      (2L, "s1", "HEADER\ngamma"),
      (3L, "s1", "  HEADER  \ndelta"), // trims to the same key
      // same literal header in ANOTHER source: df=1 there -> kept
      (4L, "s2", "HEADER\nepsilon"),
      (5L, "s1", "")).toDF("doc_id", "source", "text")
    val out = Boilerplate.boilerplateLinesOf(docs, dfThreshold = 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))).toMap
    assert(out(1L) == ((3L, 1L, 0.333333, md5hex("alpha\nbeta"))))
    assert(out(2L) == ((2L, 1L, 0.5, md5hex("gamma"))))
    // the RAW (untrimmed) line is dropped; kept lines rebuild verbatim
    assert(out(3L) == ((2L, 1L, 0.5, md5hex("delta"))))
    assert(out(4L) == ((2L, 0L, 0.0, md5hex("HEADER\nepsilon"))))
    assert(out(5L) == ((0L, 0L, 0.0, md5hex(""))))
  }

  test("boilerplate_lines: corpus invariants") {
    val rows = Boilerplate.boilerplateLines(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val frac = r.getDouble(3)
      assert(frac >= 0.0 && frac <= 1.0)
      // a doc with zero boilerplate hashes its own non-empty-line join
      assert(r.getString(4).length == 32)
    }
  }
}
