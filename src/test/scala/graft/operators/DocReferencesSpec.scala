package graft.operators

import graft.SparkSpec

/** REFERENCES_DOC parity with the reference's own test vectors
  * (narrative/references.rs:226-385, cited per case).
  */
class DocReferencesSpec extends SparkSpec {
  import spark.implicits._

  private def refsOf(path: String, content: String): Seq[(String, String)] =
    DocReferences.referencesOf(
      Seq(("t1", 1L, path, content)).toDF("tenant_id", "doc_id", "file_path", "content"))
      .orderBy("target_path")
      .collect()
      .map(r => (r.getAs[String]("target_path"), r.getAs[String]("target_filename")))
      .toSeq

  // references.rs:227 test_inline_link_produces_edge
  test("references: inline link resolves against the source directory") {
    assert(refsOf("src/docs/index.md", "See the [guide](./guide.md) for details.\n") ==
      Seq(("src/docs/guide.md", "guide.md")))
  }

  // references.rs:247 test_http_url_no_edge
  test("references: http urls produce no edge") {
    assert(refsOf("readme.md", "Visit [docs](https://example.com) for info.\n").isEmpty)
  }

  // references.rs:256 test_reference_style_link_produces_edge
  test("references: reference-style definition produces an edge") {
    assert(refsOf("docs/index.md", "[api]: api-reference.md\n") ==
      Seq(("docs/api-reference.md", "api-reference.md")))
  }

  // references.rs:274 test_non_markdown_returns_empty
  test("references: non-markdown files are skipped") {
    assert(refsOf("src/main.rs", "[link](./other.rs)\n").isEmpty)
  }

  // references.rs:283 test_duplicate_link_single_edge
  test("references: duplicate targets dedup to one edge") {
    val md = "[guide](./guide.md) is useful.\nAlso see [guide again](./guide.md).\n"
    assert(refsOf("docs/index.md", md) == Seq(("docs/guide.md", "guide.md")))
  }

  // references.rs:297 test_anchor_only_no_edge
  test("references: anchor-only targets produce no edge") {
    assert(refsOf("readme.md", "Jump to [section](#heading) below.\n").isEmpty)
  }

  // references.rs:306 test_parent_path_resolution
  test("references: .. components resolve lexically") {
    assert(refsOf("src/docs/guide.md", "See [readme](../README.md) at the root.\n") ==
      Seq(("src/README.md", "README.md")))
  }

  // references.rs:317 test_mailto_no_edge
  test("references: mailto targets produce no edge") {
    assert(refsOf("readme.md", "Contact [us](mailto:hi@example.com).\n").isEmpty)
  }

  // references.rs:327 test_link_with_fragment_resolves_path
  test("references: fragments strip before resolution") {
    assert(refsOf("docs/index.md", "See [setup](./install.md#quickstart) guide.\n") ==
      Seq(("docs/install.md", "install.md")))
  }

  // references.rs:339 test_multiple_links_same_line
  test("references: multiple links on one line each produce an edge") {
    assert(refsOf("index.md", "See [a](a.md) and [b](b.md) for details.\n") ==
      Seq(("a.md", "a.md"), ("b.md", "b.md")))
  }

  // references.rs:350 test_mixed_inline_and_refstyle
  test("references: inline and reference-style links combine") {
    val md = "Read [intro](intro.md) first.\n\n[api]: api.md\n[changelog]: changelog.md\n"
    assert(refsOf("docs/readme.md", md) == Seq(
      ("docs/api.md", "api.md"),
      ("docs/changelog.md", "changelog.md"),
      ("docs/intro.md", "intro.md")))
  }

  // references.rs:28 — the refstyle regex requires the target on the SAME
  // line as the definition (a per-line scan can never consume a newline).
  test("references: reference-style target on the next line does not match") {
    assert(refsOf("a.md", "[c]:\nnext.md\n").isEmpty)
  }

  // normalize_path (references.rs:59): `.` skips, `//` collapses, and a
  // root-escaping `..` pops past the top like Rust's Components iterator.
  test("references: lexical normalization edge shapes") {
    assert(refsOf("a/b.md", "[x](./sub/.//deep.md)\n") ==
      Seq(("a/sub/deep.md", "deep.md")))
    assert(refsOf("a.md", "[x](../up.md)\n") == Seq(("up.md", "up.md")))
  }
}
