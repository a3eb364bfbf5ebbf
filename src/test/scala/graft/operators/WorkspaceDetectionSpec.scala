package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's workspace detection
  * (grouping/workspace/workspace_tests.rs): cargo basic/glob/inline,
  * npm array/object forms, go.work block + single-line use, member
  * resolution against real directories, deterministic workspace ids.
  */
class WorkspaceDetectionSpec extends SparkSpec {
  import spark.implicits._

  private val files = Seq(
    ("t0", "daemon/core/src/lib.rs"), ("t0", "daemon/grpc/src/server.rs"),
    ("t0", "cli/src/main.rs"), ("t0", "packages/app/index.ts"),
    ("t0", "packages/web/index.ts"), ("t0", "tools/site/build.ts"))
    .toDF("tenant_id", "rel_path")

  private def detect(filename: String, content: String): Seq[(String, String, String)] =
    WorkspaceDetection.detectWorkspacesOf(
      Seq(("t0", "/ws/root", filename, content))
        .toDF("tenant_id", "root", "filename", "content"), files)
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq

  test("cargo workspace: basic members, glob members, inline form") {
    val basic = detect("Cargo.toml",
      "[workspace]\nmembers = [\n    \"daemon/core\",\n    \"daemon/grpc\",\n]\n")
    assert(basic.map(_._3) == Seq("/ws/root/daemon/core", "/ws/root/daemon/grpc"))
    assert(basic.forall(_._2 == "cargo"))

    val glob = detect("Cargo.toml", "[workspace]\nmembers = [\"daemon/*\"]\n")
    assert(glob.map(_._3) == Seq("/ws/root/daemon/core", "/ws/root/daemon/grpc"),
      "glob resolves only to directories that hold files")

    val inline = detect("Cargo.toml", "[workspace]\nmembers = [\"cli\", \"tools/site\"]\n")
    assert(inline.map(_._3) == Seq("/ws/root/cli", "/ws/root/tools/site"))

    // no [workspace] section → nothing
    assert(detect("Cargo.toml", "[package]\nname = \"solo\"\n").isEmpty)
  }

  test("npm workspace: array and object forms; absent field → nothing") {
    val arr = detect("package.json", """{"workspaces": ["packages/*"]}""")
    assert(arr.map(_._3) == Seq("/ws/root/packages/app", "/ws/root/packages/web"))
    assert(arr.forall(_._2 == "npm"))
    val obj = detect("package.json", """{"workspaces": {"packages": ["tools/site"]}}""")
    assert(obj.map(_._3) == Seq("/ws/root/tools/site"))
    assert(detect("package.json", """{"name": "no-workspaces"}""").isEmpty)
  }

  test("go.work: use block with comments, single-line use, nonexistent members dropped") {
    val out = detect("go.work",
      "go 1.21\n\nuse (\n\t./daemon/core\n\t// ./commented\n\t./missing\n)\n\nuse ./cli\n")
    assert(out.map(_._3) == Seq("/ws/root/cli", "/ws/root/daemon/core"),
      "comment and nonexistent ./missing are dropped")
    assert(out.forall(_._2 == "go"))
  }

  test("workspace ids are the reference's ws:<sha256(root)[..12]> and deterministic") {
    val out = detect("Cargo.toml", "[workspace]\nmembers = [\"cli\"]\n")
    val expected = "ws:" + java.security.MessageDigest.getInstance("SHA-256")
      .digest("/ws/root".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    assert(out.nonEmpty && out.forall(_._1 == expected))
  }

  test("workspace_detect on the corpus: all three kinds resolve members") {
    val rows = WorkspaceDetection.workspaceDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(2)).toSet == Set("cargo", "npm", "go"))
    // every member path is rooted at its tenant's root
    rows.foreach { r =>
      assert(r.getString(3).startsWith(s"/proj/${r.getString(0)}/"))
    }
  }
}
