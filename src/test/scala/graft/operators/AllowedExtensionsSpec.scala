package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's allowed-extensions gate
  * (allowed_extensions/tests.rs): two-tier allowlist lookup,
  * case-insensitive matching, extension-less rejection, the superset
  * invariant, and route_file's library re-route semantics.
  */
class AllowedExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private def allowed(cases: Seq[(String, String)]): Seq[Boolean] =
    cases.toDF("p", "c")
      .select(AllowedExtensionsOps.isAllowed(col("p"), col("c"))).collect()
      .map(r => !r.isNullAt(0) && r.getBoolean(0)).toSeq

  test("is_allowed: project sources, library documents, rejections (tests.rs)") {
    val yes = Seq(
      "/home/user/project/src/main.rs" -> "projects",
      "/home/user/project/lib.py" -> "projects",
      "/home/user/project/index.ts" -> "projects",
      "README.md" -> "projects",
      "/docs/manual.pdf" -> "libraries",
      "/docs/book.epub" -> "libraries",
      "/docs/notes.md" -> "libraries",     // project exts allowed in libraries
      "/docs/report.docx" -> "libraries",
      "main.rs" -> "libraries",
      // case-insensitive
      "file.RS" -> "projects", "file.Py" -> "projects",
      "file.PDF" -> "libraries", "FILE.Html" -> "libraries",
      "analysis.r" -> "projects", "analysis.R" -> "projects",
      // unknown collection falls back to the project set
      "main.rs" -> "some_custom_collection",
      // dots in directory names don't confuse extraction
      "/home/user/my.project/src/main.rs" -> "projects")
    val no = Seq(
      // binary/media/archives
      "image.png" -> "projects", "photo.jpg" -> "projects",
      "video.mp4" -> "projects", "archive.zip" -> "projects",
      "binary.exe" -> "projects", "data.sqlite" -> "projects",
      "model.onnx" -> "projects",
      // extension-less always rejected
      "Makefile" -> "projects", "Dockerfile" -> "projects",
      "LICENSE" -> "projects", "/home/user/.bashrc" -> "projects",
      "" -> "projects", "file." -> "projects",
      // library-only formats rejected for projects
      "doc.pdf" -> "projects", "book.epub" -> "projects",
      "report.docx" -> "projects", "novel.mobi" -> "projects",
      "slides.pptx" -> "projects", "data.parquet" -> "projects",
      "budget.xlsx" -> "projects",
      "doc.pdf" -> "some_custom_collection",
      "/home/user/my.project/src/data.bin" -> "projects")
    assert(allowed(yes).forall(identity), "every allow fixture must pass")
    assert(allowed(no).forall(!_), "every reject fixture must fail")
  }

  test("library allowlist is a superset of the project allowlist") {
    val proj = AllowedExtensionsOps.projectExtensions.toSet
    val lib = AllowedExtensionsOps.libraryExtensions.toSet
    assert(proj.subsetOf(lib))
    // every library-ROUTED extension is library-allowed but NOT project-allowed
    AllowedExtensionsOps.libraryRoutedExtensions.foreach { e =>
      assert(lib.contains(e) && !proj.contains(e), s"$e must be library-only")
    }
  }

  test("route_file: project source, pdf re-route with origin, exclusions (tests.rs)") {
    val files = Seq(
      (1L, "/project/src/main.rs", "projects", "my-project"),
      (2L, "lib.py", "projects", "my-project"),
      (3L, "/project/docs/manual.pdf", "projects", "my-project"),
      (4L, "/docs/manual.pdf", "libraries", "fastapi"),
      (5L, "archive.zip", "projects", "my-project"),
      (6L, "archive.zip", "libraries", "fastapi"),
      (7L, "LICENSE", "projects", "my-project"),
      (8L, "types.d.ts", "projects", "my-project"), // plain extension: .ts
      (9L, "page.htm", "libraries", "fastapi"),     // library-only, not routed
      (10L, "page.htm", "projects", "my-project")   // .htm NOT project-allowed
    ).toDF("doc_id", "file_path", "watch_collection", "tenant_id")
    val out = AllowedExtensionsOps.routeFilesOf(files).collect()
      .map(r => r.getLong(0) -> (r.getString(3), Option(r.getString(4)))).toMap
    assert(out(1L) == ("project", None))
    assert(out(2L) == ("project", None))
    assert(out(3L) == ("library", Some("my-project")), "pdf in project carries origin")
    assert(out(4L) == ("library", None), "library watch sets no origin")
    assert(out(5L) == ("excluded", None))
    assert(out(6L) == ("excluded", None))
    assert(out(7L) == ("excluded", None))
    assert(out(8L) == ("project", None))
    assert(out(9L) == ("library", None))
    assert(out(10L) == ("excluded", None))
  }

  test("file_routes on the corpus: all three routes and the origin re-route occur") {
    val rows = AllowedExtensionsOps.fileRoutes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(3)).toSet == Set("project", "library", "excluded"))
    val rerouted = rows.filter(r => !r.isNullAt(4))
    assert(rerouted.nonEmpty, "pdf/pptx in project watches must carry source_project_id")
    rerouted.foreach(r => assert(r.getString(2) == "projects" && r.getString(3) == "library"))
  }

  test("format routing: overrides, -refs partition, excluded no-ext (format_routing.rs)") {
    import org.apache.spark.sql.functions.col
    val files = Seq(
      (1L, "/project/docs/manual.pdf", "proj-a"),
      (2L, "/project/slides/deck.pptx", "proj-a"),
      (3L, "/project/src/main.rs", "proj-a"),
      (4L, "/project/help.chm", "proj-a"),  // .chm: allowed-ext routed but NOT format-routed
      (5L, "/project/LICENSE", "proj-a")
    ).toDF("doc_id", "file_path", "tenant_id")
    val out = AllowedExtensionsOps.routeProjectFilesOf(files).collect()
      .map(r => r.getLong(0) -> (r.getString(2), Option(r.getString(4)))).toMap
    assert(out(1L) == ("libraries", Some("proj-a-refs")))
    assert(out(2L) == ("libraries", Some("proj-a-refs")))
    assert(out(3L) == ("projects", None))
    assert(out(4L) == ("projects", None), ".chm is absent from the routing default list")
    assert(out(5L) == ("excluded", None))

    // configurable overrides: docx to projects, pptx stays libraries
    val ov = Seq((1L, "report.docx", "t"), (2L, "deck.pptx", "t"))
      .toDF("doc_id", "file_path", "tenant_id")
    val routed = AllowedExtensionsOps.routeProjectFilesOf(ov, routeDocxTo = "projects")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(routed(1L) == "projects" && routed(2L) == "libraries")
  }
}
