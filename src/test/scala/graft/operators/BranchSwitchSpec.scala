package graft.operators

import graft.SparkSpec

/** Parity with branch_switch/: the db.rs:79 candidate filters and the
  * queue.rs:22 change-status op mapping (incl. the two-row rename).
  */
class BranchSwitchSpec extends SparkSpec {

  import spark.implicits._

  test("branch-add: old-branch carriers only, changed and already-carrying excluded (db.rs:79)") {
    val tracked = Seq(
      ("t1", "src/a.rs", Seq("main")),               // → branch_add
      ("t1", "src/b.rs", Seq("main", "feature-x")),  // already carries new
      ("t1", "src/c.rs", Seq("dev")),                // not on old branch
      ("t1", "src/d.rs", Seq("main")),               // changed → excluded
      ("t2", "src/d.rs", Seq("main")))               // same path, other watch → add
      .toDF("tenant_id", "path", "branches")
    val changes = Seq(("t1", "src/d.rs", "modified", "src/d.rs.old"))
      .toDF("tenant_id", "path", "status", "old_path")
    val rows = BranchSwitch.branchSwitchOf(tracked, changes, "main", "feature-x")
      .collect()
    val adds = rows.filter(_.getAs[String]("action") == "branch_add")
      .map(r => (r.getAs[String]("tenant_id"), r.getAs[String]("path")))
    assert(adds.toSet == Set(("t1", "src/a.rs"), ("t2", "src/d.rs")))
    val afterRow = rows.find(r => r.getAs[String]("action") == "branch_add" &&
      r.getAs[String]("tenant_id") == "t1").get
    val after = afterRow.getSeq[String](afterRow.fieldIndex("branches_after"))
    assert(after.toList == List("main", "feature-x"))
  }

  test("op mapping: modified/type_changed update, added/copied add, deleted delete, renamed two rows (queue.rs:22)") {
    val tracked = Seq.empty[(String, String, Seq[String])]
      .toDF("tenant_id", "path", "branches")
    val changes = Seq(
      ("t1", "a", "modified", "a.old"),
      ("t1", "b", "type_changed", "b.old"),
      ("t1", "c", "added", "c.old"),
      ("t1", "d", "copied", "d.old"),
      ("t1", "e", "deleted", "e.old"),
      ("t1", "f", "renamed", "old/f"))
      .toDF("tenant_id", "path", "status", "old_path")
    val rows = BranchSwitch.branchSwitchOf(tracked, changes, "main", "feature-x")
      .collect().map(r => (r.getAs[String]("path"), r.getAs[String]("action")))
    assert(rows.toSet == Set(
      ("a", "update"), ("b", "update"), ("c", "add"), ("d", "add"),
      ("e", "delete"), ("f", "add"), ("old/f", "delete")))
  }
}
