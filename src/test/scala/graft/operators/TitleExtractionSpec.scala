package graft.operators

import graft.SparkSpec

/** Parity with the reference's title-extraction test vectors
  * (title_extraction/content.rs + mod.rs tests).
  */
class TitleExtractionSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String, String, String, String)]): Map[Long, (String, String)] = {
    import spark.implicits._
    TitleExtraction.titleExtractOf(
        rows.toDF("doc_id", "file_path", "meta_title", "text", "source_format"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
  }

  test("markdown: frontmatter, quoted frontmatter, heading, none") {
    val out = run(Seq(
      (1L, "a.md", null, "---\ntitle: My Document\nauthor: John\n---\n\n# Content\nSome text.", "md"),
      (2L, "b.md", null, "---\ntitle: \"Quoted Title\"\n---\n\n# Content", "md"),
      (3L, "c.md", null, "# My Heading\n\nSome content here.", "md"),
      (4L, "plain_notes.md", null, "just some plain text without any headings or frontmatter.", "md")))
    assert(out(1L) == ("My Document", "content"))
    assert(out(2L) == ("Quoted Title", "content"))
    assert(out(3L) == ("My Heading", "content"))
    assert(out(4L) == ("Plain Notes", "filename"), "no md title falls back to filename")
  }

  test("html: title tag, h1 fallback, og:title") {
    val out = run(Seq(
      (1L, "p.html", null, "<html><head><title>My Page</title></head><body><h1>Content</h1></body></html>", "html"),
      (2L, "q.html", null, "<html><head></head><body><h1>First Heading</h1><p>Content</p></body></html>", "html"),
      (3L, "r.html", null, "<html><head><meta property=\"og:title\" content=\"Open Graph Title\"></head></html>", "html")))
    assert(out(1L) == ("My Page", "content"))
    assert(out(2L) == ("First Heading", "content"))
    assert(out(3L) == ("Open Graph Title", "content"))
  }

  test("first line: valid, too long, trailing period") {
    val out = run(Seq(
      (1L, "x.txt", null, "Introduction to Machine Learning\n\nThis chapter covers...", "txt"),
      (2L, "long_doc.txt", null, ("a" * 250) + "\n\nMore content.", "txt"),
      (3L, "sent.txt", null, "This is a sentence.\n\nMore content.", "txt")))
    assert(out(1L) == ("Introduction to Machine Learning", "content"))
    assert(out(2L) == ("Long Doc", "filename"))
    assert(out(3L) == ("Sent", "filename"))
  }

  test("metadata wins unless placeholder; filename title-cases stems") {
    val out = run(Seq(
      (1L, "meta.txt", "Real Title", "Whatever Content\n", "txt"),
      (2L, "ph.txt", "Untitled", "no uppercase here\n", "txt"),
      (3L, "ph2.txt", "Document3", "no uppercase here\n", "txt"),
      (4L, "my_great-notes.txt", null, "no uppercase here\n", "txt")))
    assert(out(1L) == ("Real Title", "metadata"))
    assert(out(2L) == ("Ph", "filename"), "placeholder metadata is rejected")
    assert(out(3L) == ("Ph2", "filename"), "numbered placeholder rejected")
    assert(out(4L) == ("My Great Notes", "filename"))
  }

  test("title_extract on the corpus: lowercase text falls back to filenames") {
    val rows = TitleExtraction.titleExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) == s"Doc${r.getLong(0)}")
      assert(r.getString(2) == "filename")
    }
  }
}
