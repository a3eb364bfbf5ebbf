package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with recover_state/reconstruction.rs: the project-root
  * inference vectors, the grouping-key fallbacks, the first-point
  * attribute selection, and the missing-point-id chunk skip.
  */
class StateReconstructSpec extends SparkSpec {

  import spark.implicits._

  private def points(rows: (String, String, String, String, Seq[String],
      String, Int, String)*): DataFrame =
    rows.toDF("point_id", "tenant_id", "file_path", "absolute_path",
        "branches", "branch", "chunk_index", "content")
      .withColumn("file_hash", lit("fh"))
      .withColumn("language", lit("rust"))
      .withColumn("file_type", lit("code"))
      .withColumn("base_point", lit("bp"))
      .withColumn("relative_path", lit("rp"))
      .withColumn("extension", lit("rs"))

  private def run(df: DataFrame) =
    StateReconstruct.reconstructProjectsOf(df).collect()

  test("project root: LCA of multiple files (reconstruction.rs vectors)") {
    val out = run(points(
      ("p1", "t", "/home/u/proj/src/a.rs", "/home/u/proj/src/a.rs", null, null, 0, "x"),
      ("p2", "t", "/home/u/proj/lib/b.rs", "/home/u/proj/lib/b.rs", null, null, 0, "y"),
      ("p3", "t", "/home/u/proj/src/deep/c.rs", "/home/u/proj/src/deep/c.rs", null, null, 0, "z")))
    assert(out.forall(_.getAs[String]("project_root") == "/home/u/proj"))
  }

  test("project root: single file parents; no common ancestor is unknown") {
    val one = run(points(("p1", "t", "/home/u/proj/src/a.rs",
      "/home/u/proj/src/a.rs", null, null, 0, "x")))
    assert(one.head.getAs[String]("project_root") == "/home/u/proj/src")
    val disjoint = run(points(
      ("p1", "t", "a/x.rs", "a/x.rs", null, null, 0, "x"),
      ("p2", "t", "b/y.rs", "b/y.rs", null, null, 0, "y")))
    assert(disjoint.forall(_.getAs[String]("project_root") == "/unknown-project"))
  }

  test("root inference prefers absolute_path; grouping prefers file_path") {
    val out = run(points(
      ("p1", "t", "rel/a.rs", "/abs/deep/a.rs", null, null, 0, "x"),
      ("p2", "t", "rel/b.rs", "/abs/deep/b.rs", null, null, 0, "y")))
    assert(out.forall(_.getAs[String]("project_root") == "/abs/deep"))
    assert(out.map(_.getAs[String]("file_path")).toSet ==
      Set("rel/a.rs", "rel/b.rs"))
  }

  test("branch fallback: branches[0], empty array falls through, then branch, then main") {
    val out = run(points(
      ("p1", "t", "/r/a.rs", "/r/a.rs", Seq("feature", "main"), "dev", 0, "x"),
      ("p2", "t", "/r/b.rs", "/r/b.rs", Seq.empty[String], "dev", 0, "y"),
      ("p3", "t", "/r/c.rs", "/r/c.rs", null, "dev", 0, "z"),
      ("p4", "t", "/r/d.rs", "/r/d.rs", null, null, 0, "w")))
      .map(r => r.getAs[String]("file_path") -> r.getAs[String]("branch")).toMap
    assert(out("/r/a.rs") == "feature")
    assert(out("/r/b.rs") == "dev")
    assert(out("/r/c.rs") == "dev")
    assert(out("/r/d.rs") == "main")
  }

  test("chunks skip missing point ids; chunk_count keeps them; digest is order-stable") {
    val out = run(points(
      (null, "t", "/r/a.rs", "/r/a.rs", null, null, 0, "c0"),
      ("p1", "t", "/r/a.rs", "/r/a.rs", null, null, 1, "c1"),
      ("p2", "t", "/r/a.rs", "/r/a.rs", null, null, 2, "c2"))).head
    assert(out.getAs[Long]("chunk_count") == 3L)
    assert(out.getAs[Long]("n_chunks") == 2L)
    val flipped = run(points(
      ("p2", "t", "/r/a.rs", "/r/a.rs", null, null, 2, "c2"),
      ("p1", "t", "/r/a.rs", "/r/a.rs", null, null, 1, "c1"),
      (null, "t", "/r/a.rs", "/r/a.rs", null, null, 0, "c0"))).head
    assert(out.getAs[String]("chunks_digest") == flipped.getAs[String]("chunks_digest"))
  }

  test("empty grouping path is skipped; tenants without usable paths still root unknown") {
    val out = run(points(
      (null: String, "t", null, null, null, null, 0, "x"),
      ("p1", "t", "/r/a.rs", "/r/a.rs", null, null, 0, "y")))
    assert(out.length == 1 && out.head.getAs[String]("file_path") == "/r/a.rs")
  }

  test("corpus query: fallback arms live, chunk-skip residue visible") {
    val out = StateReconstruct.stateReconstruct(spark, sfDir).collect()
    assert(out.nonEmpty)
    val branches = out.map(_.getAs[String]("branch")).toSet
    assert(branches == Set("feature", "dev", "main"))
    assert(out.exists(r => r.getAs[Long]("n_chunks") < r.getAs[Long]("chunk_count")))
    assert(out.forall(_.getAs[String]("project_root").startsWith("/proj/")))
  }
}
