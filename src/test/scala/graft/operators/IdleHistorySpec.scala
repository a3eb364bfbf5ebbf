package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Parity with the reference's flip-flop analysis
  * (idle_history/history.rs:114 analyze_flip_flops): window scoping,
  * the rate and mean-duration aggregates, the <30s short-stay count,
  * the threshold flag, and the ceil-ratio cooloff recommendation.
  */
class IdleHistorySpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.map { case (u, sec, id) => (u, new Timestamp(sec * 1000L), id) }
      .toDF("user_id", "ts", "event_id")
  }

  test("rate, mean duration, and short-stay count over the window") {
    // user 1: transitions at +10s, +20s, +3630s after t0 → durations 10, 10, 3610
    val out = IdleHistory.flipFlopsOf(
      ev(Seq((1L, 1000L, 1L), (1L, 1010L, 2L), (1L, 1020L, 3L), (1L, 4630L, 4L))),
      hours = 2.0, threshold = 10.0).collect()
    val r = out.head
    assert(r.getLong(1) == 3) // first event is not a transition
    assert(math.abs(r.getDouble(2) - 1.5) < 1e-9)
    assert(math.abs(r.getDouble(3) - (10.0 + 10.0 + 3610.0) / 3) < 1e-3)
    assert(r.getLong(4) == 2) // two stays < 30s
    assert(!r.getBoolean(5) && r.getLong(6) == 0L)
  }

  test("flip-flop flag and ceil-ratio cooloff (history.rs:145: 20/h @ 10/h -> +1)") {
    // 21 events in 1h → 20 transitions/h with threshold 10 → ceil(2)-1 = 1
    val rows = (0L until 21L).map(i => (7L, 1000L + i * 60L, i))
    val out = IdleHistory.flipFlopsOf(ev(rows), hours = 1.0, threshold = 10.0).collect()
    val r = out.head
    assert(r.getLong(1) == 20 && r.getBoolean(5) && r.getLong(6) == 1L)
  }

  test("window excludes older transitions but keeps edge-crossing durations") {
    // now = 10000s; 1h window = [6400, 10000]; the 5000s event is out,
    // the 7000s event is in with its duration measured from 5000s.
    val out = IdleHistory.flipFlopsOf(
      ev(Seq((1L, 1000L, 1L), (1L, 5000L, 2L), (1L, 7000L, 3L), (1L, 10000L, 4L))),
      hours = 1.0, threshold = 10.0).collect()
    val r = out.head
    assert(r.getLong(1) == 2)
    assert(math.abs(r.getDouble(3) - (2000.0 + 3000.0) / 2) < 1e-3)
  }

  test("idle_flipflops on the corpus: both flag arms live, recommendation only when flipping") {
    val rows = IdleHistory.idleFlipflops(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val flags = rows.map(_.getBoolean(5)).toSet
    rows.foreach { r =>
      assert((r.getLong(6) > 0) == (r.getBoolean(5) && r.getLong(6) > 0))
      if (!r.getBoolean(5)) assert(r.getLong(6) == 0L)
    }
    assert(flags.nonEmpty)
  }
}
