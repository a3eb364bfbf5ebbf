package graft.operators

import graft.SparkSpec

/** Parity with the reference's branch-cleanup semantics
  * (branch_cleanup/mod.rs + tests.rs): deleted-branch membership is
  * removed; files left with no branches are orphaned (full delete);
  * files still referenced elsewhere are updated, not deleted.
  */
class BranchLifecycleSpec extends SparkSpec {

  test("cleanup classifies delete/update/keep like the reference") {
    import spark.implicits._
    val tracked = Seq(
      (1L, "t0", Seq("feature-x")),          // only the dead branch → delete
      (2L, "t0", Seq("main", "feature-x")),  // dead branch removed → update
      (3L, "t0", Seq("main")),               // untouched → keep
      (4L, "t1", Seq("feature-x", "dev"))    // one dead, one live → update
    ).toDF("doc_id", "tenant_id", "branches")
    val out = BranchLifecycle.branchCleanupOf(tracked, Seq("main", "dev")).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, "delete", ""),
      (2L, "update", "main"),
      (3L, "keep", "main"),
      (4L, "update", "dev")))
  }

  test("branch_cleanup on the corpus: feature-only docs on stale branches orphan") {
    val rows = BranchLifecycle.branchCleanup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, action, left) =>
      val feature = s"b${id % 5}"
      val featureLive = Set("b0", "b1", "b2").contains(feature)
      val expected =
        if (id % 10 >= 7) { if (featureLive) "keep" else "delete" }
        else if (featureLive) "keep"
        else "update"
      assert(action == expected, s"doc $id: $action != $expected ($left)")
      if (action == "delete") assert(left.isEmpty)
      if (action == "update") assert(left == "main")
    }
    // The headline semantics — orphaned full delete — must actually be
    // exercised: residues {7,8,9} land feature-only docs on stale b3/b4.
    assert(rows.exists(_._2 == "delete"), "delete partition must be non-empty")
    assert(rows.exists(_._2 == "update"))
    assert(rows.exists(_._2 == "keep"))
  }
}
