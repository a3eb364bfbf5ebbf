package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Tree-builder semantics from mcp-server tools/list (tree.rs +
  * renderers.rs fixtures). */
class FileTreeSpec extends SparkSpec {

  private def files(rows: Seq[(String, Option[String])]): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((p, e), i) => (p, e, i.toLong) }
      .toDF("relative_path", "extension", "input_idx")
  }

  private def noSubs = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("sm_path", "repo_name")
  }

  private def subs(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("sm_path", "repo_name")
  }

  private def byPath(df: DataFrame) =
    df.collect().map(r => r.getAs[String]("folder_path") -> r).toMap

  test("folder rollups and extension summary (summary_format_shows_extension_counts)") {
    val t = byPath(FileTree.treeOf(files(Seq(
      ("src/a.rs", Some("rs")), ("src/b.rs", Some("rs")), ("src/c.ts", Some("ts")))),
      noSubs))
    assert(t("src").getAs[Long]("total_files") == 3)
    assert(t("src").getAs[Long]("n_direct_files") == 3)
    assert(t("src").getAs[String]("ext_summary") == "(3 files: 2 rs, 1 ts)")
    assert(t(".").getAs[Long]("total_files") == 3)
    assert(t(".").getAs[Long]("n_direct_files") == 0)
  }

  test("submodule stop-descent: node exists, nothing below, files dropped (tree.rs:79-91)") {
    val t = byPath(FileTree.treeOf(files(Seq(
      ("vendor/dep/deep/x.rs", Some("rs")), ("src/main.rs", Some("rs")))),
      subs("vendor/dep" -> "dep-repo")))
    assert(t.contains("vendor") && t.contains("vendor/dep"))
    assert(!t.contains("vendor/dep/deep"), "no nodes below a submodule")
    assert(t("vendor/dep").getAs[Boolean]("is_submodule"))
    assert(t("vendor/dep").getAs[String]("repo_name") == "dep-repo")
    assert(t("vendor/dep").getAs[Long]("total_files") == 0)
    assert(t("vendor/dep").getAs[String]("ext_summary") == "(empty)")
    assert(t(".").getAs[Long]("total_files") == 1, "submodule file not counted anywhere")
  }

  test("file directly inside a submodule folder is dropped too (tree.rs:84)") {
    val t = byPath(FileTree.treeOf(files(Seq(
      ("sub/x.txt", Some("txt")), ("y.txt", Some("txt")))),
      subs("sub" -> "r")))
    assert(t("sub").getAs[Long]("total_files") == 0)
    assert(t(".").getAs[Long]("total_files") == 1)
    assert(t(".").getAs[Long]("n_direct_files") == 1)
  }

  test("extension summary: top 4 + N other, null extension keys as 'other' (format_extension_summary)") {
    val t = byPath(FileTree.treeOf(files(Seq(
      ("d/a1.rs", Some("rs")), ("d/a2.rs", Some("rs")), ("d/a3.rs", Some("rs")),
      ("d/b1.py", Some("py")), ("d/b2.py", Some("py")),
      ("d/c1.md", Some("md")), ("d/c2.md", Some("md")),
      ("d/e1.ts", Some("ts")), ("d/e2.ts", Some("ts")),
      ("d/x1", None), ("d/x2", None), ("d/x3", None), ("d/x4", None))),
      noSubs))
    // counts: other 4, rs 3, py 2, md 2, ts 2; equal counts keep
    // first-seen order (py, md, ts). 5 distinct > 4 shown → the
    // trailing "N other" holds the remaining 13 - 11 = 2 files.
    assert(t("d").getAs[String]("ext_summary") == "(13 files: 4 other, 3 rs, 2 py, 2 md, 2 other)")
  }

  test("first-seen tiebreak follows traversal order: node files before children, children in byte order") {
    // Equal counts: ts appears at the root file FIRST in input, but
    // traversal visits root files before children — x.ts (at node) is
    // seen before a/y.rs regardless of input order.
    val t = byPath(FileTree.treeOf(files(Seq(
      ("a/y.rs", Some("rs")), ("x.ts", Some("ts")))),
      noSubs))
    assert(t(".").getAs[String]("ext_summary") == "(2 files: 1 ts, 1 rs)")
  }

  test("root-level file: attaches to '.', no folder nodes") {
    val t = byPath(FileTree.treeOf(files(Seq(("README.md", Some("md")))), noSubs))
    assert(t.size == 1 && t(".").getAs[Long]("n_direct_files") == 1)
  }

  test("corpus: ghost submodule absent; depth and counts consistent") {
    val out = FileTree.listTree(spark, sfDir).collect()
    val paths = out.map(_.getAs[String]("folder_path")).toSet
    assert(!paths.exists(_.startsWith("ghost")), "untouched submodule never becomes a node")
    assert(paths.contains("lib/mod1") && !paths.exists(_.startsWith("lib/mod1/")))
    val root = out.find(_.getAs[String]("folder_path") == ".").get
    val tops = out.filter(_.getAs[Int]("depth") == 1)
    assert(root.getAs[Long]("total_files") ==
      tops.map(_.getAs[Long]("total_files")).sum + root.getAs[Long]("n_direct_files"))
  }
}
