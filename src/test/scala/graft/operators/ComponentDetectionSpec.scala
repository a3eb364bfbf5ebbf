package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's component detection
  * (component_detection/tests/unit.rs): path_to_component_id,
  * parse_cargo_members (multi-line, inline, comments, no-workspace),
  * file matching, most-specific assignment, and the cargo > npm >
  * directory precedence of detect_components.
  */
class ComponentDetectionSpec extends SparkSpec {
  import spark.implicits._

  test("path_to_component_id vectors") {
    val vectors = Seq(
      "daemon/core" -> "daemon.core",
      "cli" -> "cli",
      "src/typescript/mcp" -> "src.typescript.mcp",
      "trailing/" -> "trailing",
      "/leading" -> "leading")
    val out = vectors.map(_._1).toDF("p")
      .select(ComponentDetection.pathToComponentId(col("p"))).collect().map(_.getString(0))
    assert(out.toSeq == vectors.map(_._2))
  }

  private def cargoMembers(content: String): Seq[String] =
    ComponentDetection.withCargoMembers(Seq(content).toDF("content"))
      .select("members").collect().head.getSeq[String](0)

  test("parse_cargo_members: basic, inline, comments, no-workspace (unit.rs fixtures)") {
    val basic =
      "\n[workspace]\nresolver = \"2\"\nmembers = [\n    \"daemon/core\",\n    \"daemon/grpc\",\n    \"cli\",\n]\n"
    assert(cargoMembers(basic) == Seq("daemon/core", "daemon/grpc", "cli"))
    assert(cargoMembers("\n[workspace]\nmembers = [\"a\", \"b\"]\n") == Seq("a", "b"))
    val commented =
      "\n[workspace]\nmembers = [\n    \"a\",\n    # \"commented-out\",\n    \"b\",\n]\n"
    assert(cargoMembers(commented) == Seq("a", "b"))
    assert(cargoMembers("\n[package]\nname = \"my-crate\"\n").isEmpty)
  }

  test("assign_component: most specific base_path wins, no match is null (unit.rs)") {
    val comps = Seq(
      ("t0", "daemon", "daemon", "cargo"),
      ("t0", "daemon.core", "daemon/core", "cargo")
    ).toDF("tenant_id", "component_id", "base_path", "source")
    val files = Seq(
      (1L, "t0", "daemon/core/src/lib.rs"),
      (2L, "t0", "daemon/grpc/src/lib.rs"),
      (3L, "t0", "cli/src/main.rs"),
      (4L, "t0", "daemon/core"),        // exact base match
      (5L, "t0", "daemon/core_extra/x") // prefix must be a path boundary
    ).toDF("doc_id", "tenant_id", "rel_path")
    val out = ComponentDetection.assignComponents(files, comps).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out(1L).contains("daemon.core"))
    assert(out(2L).contains("daemon"))
    assert(out(3L).isEmpty)
    assert(out(4L).contains("daemon.core"))
    assert(out(5L).contains("daemon"))
  }

  test("detect_components: npm fills only unclaimed ids, fallback only when no manifest") {
    val manifests = Seq(
      // t0: cargo claims cli; npm also lists cli plus packages glob
      ("t0", "Cargo.toml", "[workspace]\nmembers = [\"cli\"]\n"),
      ("t0", "package.json", """{"workspaces": ["cli", "tools/site"]}"""),
      // t1: object-form workspaces
      ("t1", "package.json", """{"workspaces": {"packages": ["packages/*"]}}""")
    ).toDF("tenant_id", "filename", "content")
    val files = Seq(
      ("t0", "cli/src/main.rs"), ("t0", "tools/site/x.ts"),
      ("t1", "packages/app/i.ts"), ("t1", "packages/web/i.ts"),
      ("t1", "packages/readme.md"), // direct file: not a subdirectory
      ("t2", "lib/core.py"), ("t2", "dist/bundle.js"), ("t2", ".github/ci.yml"),
      ("t2", "README.md") // top-level file: not a directory component
    ).toDF("tenant_id", "rel_path")
    val out = ComponentDetection.detectComponentsOf(manifests, files).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3))).toSet
    assert(out == Set(
      ("t0", "cli", "cargo"),          // npm's duplicate cli is NOT inserted
      ("t0", "tools.site", "npm"),
      ("t1", "packages.app", "npm"),   // glob resolved to real subdirs only
      ("t1", "packages.web", "npm"),
      ("t2", "lib", "directory")))     // dist + dotdirs ignored, files skipped
  }

  test("component_detect on the corpus: all three sources assign files") {
    val rows = ComponentDetection.componentDetect(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sources = rows.flatMap(r => Option(r.getString(4))).toSet
    assert(sources == Set("cargo", "npm", "directory"))
    // dist/bundle.js is never assigned for cargo/npm tenants and is
    // ignored by the directory fallback
    rows.filter(_.getString(2) == "dist/bundle.js").foreach { r =>
      assert(r.isNullAt(3), s"dist must be unassigned: $r")
    }
  }
}
