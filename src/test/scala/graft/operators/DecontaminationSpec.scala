package graft.operators

import graft.{SparkSpec, Tables}

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate: fixture overlap counts and the flag") {
    val eval = Seq(
      (1L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    val cands = Seq(
      // shares the 8-gram "two ... nine" with the eval doc
      (10L, "x two three four five six seven eight nine"),
      // no shared 8-gram
      (11L, "p q r s t u v w x y z"),
      // too short for any 8-gram
      (12L, "one two three")).toDF("doc_id", "text")
    val out = Decontamination.decontaminateOf(cands, eval, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(10L) == ((2L, 1L, 1)))
    assert(out(11L) == ((4L, 0L, 0)))
    assert(out(12L) == ((0L, 0L, 0)))
  }

  test("decontaminate: corpus invariants") {
    val rows = Decontamination.decontaminate(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.length == total - 50)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"overlap > n_grams for ${r.getLong(0)}")
      assert(r.getInt(3) == (if (r.getLong(2) > 0) 1 else 0))
    }
  }
}
