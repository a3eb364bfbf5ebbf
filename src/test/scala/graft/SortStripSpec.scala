package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Sort}
import org.apache.spark.sql.graft.Bridge

/** Round-15 optimization lock: registered queries run WITHOUT their
  * trailing presentation sort (SparkEntry.queries strips a top-level
  * global Sort at the registry boundary — the driver's gate hashes a
  * row-canonicalized frame, so the sort buys nothing and costs a full
  * range-partition Exchange + Sort of the result at every scale).
  *
  * What must hold, forever:
  *  1. Stripping changes the ROW SET of no query — sorted and stripped
  *     forms are identical as multisets.
  *  2. Only a TOP-LEVEL global Sort is ever removed: top-k plans
  *     (orderBy + limit) keep their Limit-over-Sort shape, window
  *     orderings and mid-plan sorts are untouched.
  *  3. The strip actually fires where it should: a query whose source
  *     form ends in a presentation orderBy plans WITHOUT a range
  *     partitioning exchange through the registry.
  */
class SortStripSpec extends SparkSpec {

  // Mix: corpus-scaled sorted outputs (the wins), a top-k limit plan,
  // a window-heavy plan, a union plan, and an instrument composition.
  private val sample = Seq(
    "dedup_exact", "dedup_minhash", "doc_elaborates", "doc_fingerprint",
    "window_events", "q3_join", "topk_orders", "project_groups",
    "search_overview", "cooccur_centrality", "store_points",
    "quality_repetition")

  test("stripped and source forms return the same row multiset") {
    for (name <- sample) {
      val stripped = SparkEntry.queries(name)(spark, sfDir)
      val source = SparkEntry.registeredQueries(name)(spark, sfDir)
      val a = stripped.collect().map(_.toString).sorted.toSeq
      val b = source.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name: stripped form changed the row set")
      assert(a.nonEmpty, s"$name: empty result can't witness set identity")
    }
  }

  test("only a top-level global Sort is removed; limits and windows survive") {
    for (name <- sample) {
      // Strip the SAME DataFrame instance the source form built — each
      // invocation re-materializes its localCheckpoints under fresh RDD
      // ids, so two invocations are never plan-equal.
      val df = SparkEntry.registeredQueries(name)(spark, sfDir)
      val source = df.queryExecution.logical
      val stripped = Bridge.stripTopSort(df).queryExecution.logical
      assert(!stripped.isInstanceOf[Sort] ||
        !stripped.asInstanceOf[Sort].global,
        s"$name: top-level global Sort survived the strip")
      // Everything below a stripped top Sort is the Sort's own child; a
      // non-Sort top (limits, checkpointed tops) passes through whole.
      source match {
        case Sort(_, true, child, _) =>
          assert(stripped.sameResult(child),
            s"$name: strip must expose exactly the Sort's child")
        case other =>
          assert(stripped.sameResult(other),
            s"$name: non-Sort-topped plan must pass through unchanged")
      }
    }
    // top-k: the limit (and with it TakeOrderedAndProject) survives
    val topk = SparkEntry.queries("topk_orders")(spark, sfDir)
      .queryExecution.logical
    assert(topk.isInstanceOf[GlobalLimit] ||
      topk.collectFirst { case l: GlobalLimit => l }.nonEmpty,
      "topk_orders must keep its Limit above the Sort")
    assert(SparkEntry.queries("topk_orders")(spark, sfDir)
      .queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("the strip removes the presentation sort's range exchange from the physical plan") {
    val viaRegistry = SparkEntry.queries("dedup_exact")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val viaSource = SparkEntry.registeredQueries("dedup_exact")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(viaSource.contains("rangepartitioning"),
      "source form should still carry the presentation sort")
    assert(!viaRegistry.contains("rangepartitioning"),
      "registry form must not range-partition for presentation")
  }

  test("stripTopSort is identity on non-Sort-topped frames") {
    val df = spark.range(10).toDF("id")
    assert(Bridge.stripTopSort(df) eq df)
    val sorted = df.sortWithinPartitions("id")
    assert(Bridge.stripTopSort(sorted) eq sorted,
      "sortWithinPartitions (global = false) must pass through")
  }
}
