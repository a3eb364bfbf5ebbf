package graft.operators

import graft.SparkSpec

/** Parity with the reference's cross-project branch default
  * (mcp-server/src/tools/target_branch.rs tests): detected checkout
  * branch wins, the "default" sentinel falls through to the tracked-row
  * majority, no rows + no path yields None, and the is_cross_project
  * truth table.
  */
class TargetBranchSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  private def tracked(rows: Seq[(String, String)]) = {
    import spark.implicits._
    rows.toDF("watch_folder_id", "primary_branch")
  }

  private def targets(ids: String*) = {
    import spark.implicits._
    ids.toDF("watch_folder_id")
  }

  private def resolve(ts: Seq[String], tr: Seq[(String, String)],
                      det: Map[String, String]): Map[String, (Option[String], String)] =
    TargetBranch.resolveOf(targets(ts: _*), tracked(tr), det).collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), r.getString(2))).toMap

  test("db majority fallback used when no path (target_branch.rs:81)") {
    val out = resolve(Seq("wf1"),
      Seq("wf1" -> "main", "wf1" -> "main", "wf1" -> "dev"), Map.empty)
    assert(out("wf1") == (Some("main"), "mode"))
  }

  test("no rows + no path yields none (target_branch.rs:90)") {
    val out = resolve(Seq("wf1"), Seq.empty, Map.empty)
    assert(out("wf1") == (None, "none"))
  }

  test("detected branch from a real checkout wins (target_branch.rs:96)") {
    val out = resolve(Seq("wf1"), Seq("wf1" -> "main"),
      Map("wf1" -> "feature-z"))
    assert(out("wf1") == (Some("feature-z"), "detected"))
  }

  test("the 'default' probe sentinel falls through to the mode (target_branch.rs:29)") {
    val out = resolve(Seq("wf1"), Seq("wf1" -> "main", "wf1" -> "main"),
      Map("wf1" -> "default"))
    assert(out("wf1") == (Some("main"), "mode"))
  }

  test("count ties break by branch name ascending (determinism superset)") {
    val out = resolve(Seq("wf1"), Seq("wf1" -> "dev", "wf1" -> "main"), Map.empty)
    assert(out("wf1") == (Some("dev"), "mode"))
  }

  test("is_cross_project truth table (target_branch.rs:127)") {
    assert(TargetBranch.isCrossProject(Some("a"), Some("b")))
    assert(TargetBranch.isCrossProject(Some("a"), None))
    assert(!TargetBranch.isCrossProject(Some("a"), Some("a")))
    assert(!TargetBranch.isCrossProject(None, Some("b")))
    assert(!TargetBranch.isCrossProject(None, None))
  }

  test("target_branch on the corpus: all three cascade arms reachable") {
    val rows = TargetBranch.targetBranch(spark, sfDir).collect()
      .map(r => r.getString(0) -> (Option(r.getString(1)), r.getString(2))).toMap
    assert(rows("src2") == (Some("feature-z"), "detected"))
    assert(rows("src_gone") == (None, "none"))
    assert(rows("src5")._2 == "mode") // probe said "default" → fell through
    rows.filter(_._2._2 == "mode").foreach { case (wf, (b, _)) =>
      assert(b.nonEmpty, s"$wf resolved mode with no branch")
    }
  }
}
