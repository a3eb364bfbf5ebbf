package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with branch_discovery/tests.rs (classify_files +
  * infer_parent_branch vectors) plus corpus arm checks. */
class BranchDiscoveryOpsSpec extends SparkSpec {

  import spark.implicits._
  import BranchDiscoveryOps._

  private def run(fs: Seq[(String, String)],
                  known: Seq[(Long, String, String, String, Seq[String])]) = {
    val fsDf = fs.toDF("relative_path", "file_hash")
    val knDf = known
      .toDF("file_id", "relative_path", "file_hash", "base_point", "branches")
    branchDiscoveryOf(fsDf, knDf, "feature-x").collect()
      .groupBy(_.getAs[String]("section"))
      .map { case (k, v) =>
        k -> v.map(r => r.getAs[String]("key") -> r.getAs[String]("value")).toSeq }
  }

  test("all shared when every (path, hash) matches without the branch (tests.rs test_classify_all_shared)") {
    val out = run(
      Seq("src/a.rs" -> "h1", "src/b.rs" -> "h2"),
      Seq((1L, "src/a.rs", "h1", "bp1", Seq("main")),
        (2L, "src/b.rs", "h2", "bp2", Seq("main"))))
    assert(out("classify").toMap ==
      Map("src/a.rs" -> "shared", "src/b.rs" -> "shared"))
    assert(out("count").toMap ==
      Map("shared_count" -> "2", "novel_count" -> "0"))
  }

  test("unknown paths are novel (tests.rs test_classify_all_novel)") {
    val out = run(Seq("src/new.rs" -> "h9"),
      Seq((1L, "src/a.rs", "h1", "bp1", Seq("main"))))
    assert(out("classify").toMap == Map("src/new.rs" -> "novel"))
    assert(out("count").toMap ==
      Map("shared_count" -> "0", "novel_count" -> "1"))
  }

  test("hash changes are novel too; matches classify shared (tests.rs test_classify_mixed)") {
    val out = run(
      Seq("src/a.rs" -> "h1", "src/b.rs" -> "CHANGED", "src/c.rs" -> "h3"),
      Seq((1L, "src/a.rs", "h1", "bp1", Seq("main")),
        (2L, "src/b.rs", "h2", "bp2", Seq("main"))))
    assert(out("classify").toMap == Map("src/a.rs" -> "shared",
      "src/b.rs" -> "novel", "src/c.rs" -> "novel"))
  }

  test("rows already carrying the branch are neither shared nor novel (tests.rs test_classify_skips_already_present_branch)") {
    val out = run(Seq("src/a.rs" -> "h1"),
      Seq((1L, "src/a.rs", "h1", "bp1", Seq("main", "feature-x"))))
    assert(out("classify").toMap == Map("src/a.rs" -> "already"))
    assert(out("count").toMap ==
      Map("shared_count" -> "0", "novel_count" -> "0"))
  }

  test("parent is the branch matching the most files; none without matches (tests.rs test_infer_parent_most_matches/no_matches)") {
    val out = run(
      Seq("a" -> "h1", "b" -> "h2", "c" -> "h3"),
      Seq((1L, "a", "h1", "bp", Seq("main", "dev")),
        (2L, "b", "h2", "bp", Seq("main")),
        (3L, "c", "h3", "bp", Seq("old"))))
    assert(out("parent") == Seq("parent_branch" -> "main"))

    val none = run(Seq("x" -> "h9"),
      Seq((1L, "a", "h1", "bp", Seq("main"))))
    assert(!none.contains("parent"))
  }

  test("qdrant updates: per base_point sorted+deduped membership incl the new branch (scanner.rs process_shared_files)") {
    val out = run(
      Seq("a" -> "h1", "b" -> "h2"),
      Seq((1L, "a", "h1", "bp1", Seq("zeta", "main")),
        (2L, "b", "h2", "bp1", Seq("main"))))
    // bp1 totalized by min relative_path ('a') → its branches + new.
    assert(out("qdrant") == Seq("bp1" -> "feature-x", "bp1" -> "main",
      "bp1" -> "zeta"))
  }

  test("corpus: every classify arm live; parent inferred; counts consistent") {
    val rows = branchDiscovery(spark, sfDir).collect()
    val classify = rows.filter(_.getAs[String]("section") == "classify")
      .map(_.getAs[String]("value"))
    assert(Set("shared", "novel").subsetOf(classify.toSet))
    val counts = rows.filter(_.getAs[String]("section") == "count")
      .map(r => r.getAs[String]("key") -> r.getAs[String]("value").toLong).toMap
    assert(counts("shared_count") == classify.count(_ == "shared"))
    assert(counts("novel_count") == classify.count(_ == "novel"))
    val parent = rows.filter(_.getAs[String]("section") == "parent")
    assert(parent.length == 1)
    // main is the majority membership in the synthesis.
    assert(parent.head.getAs[String]("value") == "main")
  }
}
