package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CodeComment + comment-EXPLAINS parity with the reference's own test
  * vectors (narrative/comments.rs:363-720, cited per case).
  */
class CommentsSpec extends SparkSpec {
  import spark.implicits._

  /** Mirrors CommentExtractor::with_context(automaton).extract(t1, path,
    * content, lang): (start_line, end_line, first_line, symbol-or-null,
    * node-or-null) per block. The reference tests build their automaton
    * with min_symbol_length 3.
    */
  private def blocksOf(path: String, content: String, lang: String,
                       symbols: Seq[(String, String)]): Seq[(Int, Int, String, String, String)] = {
    val docs = Seq(("t1", 1L, path, content, lang))
      .toDF("tenant_id", "doc_id", "file_path", "content", "language")
    val syms = symbols.map { case (n, id) => ("t1", n, id) }
      .toDF("tenant_id", "symbol_name", "node_id")
    Comments.commentsOf(docs, syms, minSymbolLength = 3)
      .orderBy("start_line")
      .collect()
      .map(r => (r.getAs[Int]("start_line"), r.getAs[Int]("end_line"),
        r.getAs[String]("first_line"), r.getAs[String]("symbol"),
        r.getAs[String]("node_id")))
      .toSeq
  }

  private val RustCommentFn =
    "// This is a comment\n// that spans multiple\n// lines describing\n// the foo function\nfn foo() {\n    println!(\"hello\");\n}\n"

  // comments.rs:396 rust_comment_block_no_context_drops_explains — empty
  // automaton: the CodeComment node survives, no edge, no stub.
  test("comments: no-context extraction keeps the node and drops the edge") {
    val blocks = blocksOf("src/main.rs", RustCommentFn, "rust", Seq.empty)
    assert(blocks == Seq((1, 4, "This is a comment", null, null)))
  }

  // comments.rs:418 rust_comment_block_resolves_real_symbol
  test("comments: nearby signature resolves to the real node id") {
    val blocks = blocksOf("src/main.rs", RustCommentFn, "rust",
      Seq(("foo", "real-foo-node")))
    assert(blocks == Seq((1, 4, "This is a comment", "foo", "real-foo-node")))
  }

  // comments.rs:443 rust_comment_block_ambiguous_symbol_drops_edge
  test("comments: ambiguous symbol keeps the node, drops the edge") {
    val blocks = blocksOf("src/main.rs", RustCommentFn, "rust",
      Seq(("foo", "foo-a"), ("foo", "foo-b")))
    assert(blocks == Seq((1, 4, "This is a comment", null, null)))
  }

  // comments.rs:472 python_comment_block_no_function — an assignment is
  // not a signature.
  test("comments: python block with no signature after it") {
    val content = "# Configuration section\n# sets up the database\n# connection parameters\nDATABASE_URL = \"sqlite:///db.sqlite\"\n"
    val blocks = blocksOf("config.py", content, "python", Seq.empty)
    assert(blocks == Seq((1, 3, "Configuration section", null, null)))
  }

  // comments.rs:496 two_line_comment_below_threshold
  test("comments: two-line runs never become nodes") {
    val content = "// Short comment\n// only two lines\nfn bar() {}\n"
    assert(blocksOf("src/lib.rs", content, "rust", Seq.empty).isEmpty)
  }

  // comments.rs:512 comment_block_far_from_function — 5 non-signature
  // lines exhaust the proximity budget.
  test("comments: signature beyond five candidate lines yields no edge") {
    val content = "// This block is\n// far away from\n// any function definition\nlet x = 1;\nlet y = 2;\nlet z = 3;\nlet w = 4;\nlet q = 5;\nfn distant() {}\n"
    val blocks = blocksOf("src/far.rs", content, "rust",
      Seq(("distant", "n-distant")))
    assert(blocks == Seq((1, 3, "This block is", null, null)))
  }

  // comments.rs:535 no_language_returns_empty + :591 unknown_language
  test("comments: missing or unsupported language produces nothing") {
    assert(blocksOf("notes.txt", "Just some text\nwith no code\n", null, Seq.empty).isEmpty)
    assert(blocksOf("file.xyz", "// some comment\n// more\n// and more\nfn test() {}\n",
      "brainfuck", Seq.empty).isEmpty)
  }

  // comments.rs:547 python_comment_with_def
  test("comments: python def resolves") {
    val content = "# Compute the sum\n# of two numbers\n# and return result\ndef add(a, b):\n    return a + b\n"
    val blocks = blocksOf("math.py", content, "python", Seq(("add", "py-add")))
    assert(blocks == Seq((1, 3, "Compute the sum", "add", "py-add")))
  }

  // comments.rs:569 lua_double_dash_comments
  test("comments: lua -- blocks and function keyword resolve") {
    val content = "-- Initialize the module\n-- with default settings\n-- and register handlers\nfunction setup()\n    print('ready')\nend\n"
    val blocks = blocksOf("init.lua", content, "lua", Seq(("setup", "lua-setup")))
    assert(blocks == Seq((1, 3, "Initialize the module", "setup", "lua-setup")))
  }

  // comments.rs:603 multiple_comment_blocks
  test("comments: multiple blocks each resolve their own signature") {
    val content = "// First block\n// of comments\n// three lines\nfn first() {}\n\n// Second block\n// also has\n// three lines\nfn second() {}\n"
    val blocks = blocksOf("src/multi.rs", content, "rust",
      Seq(("first", "n-first"), ("second", "n-second")))
    assert(blocks == Seq(
      (1, 3, "First block", "first", "n-first"),
      (6, 8, "Second block", "second", "n-second")))
  }

  // comments.rs:671 test_extract_symbol_name unit vectors
  test("comments: extract_symbol_name vectors") {
    val vectors = Seq(
      "fn foo() {" -> "foo",
      "pub fn bar(x: i32) -> bool {" -> "bar",
      "pub(crate) fn baz() {" -> "baz",
      "def hello(self):" -> "hello",
      "async def run():" -> "run",
      "function doStuff() {" -> "doStuff",
      "func main() {" -> "main",
      "fun create() {" -> "create",
      "int compute(int x) {" -> "compute",
      "let x = 5;" -> null,
      "" -> null)
    val got = vectors.map(_._1).toDF("t")
      .select(col("t"), Comments.extractSymbolName(col("t")).as("sym"))
      .collect().map(r => r.getAs[String]("t") -> r.getAs[String]("sym")).toMap
    vectors.foreach { case (line, want) =>
      assert(got(line) == want, s"extract_symbol_name($line)")
    }
  }

  // comments.rs:699 test_collect_comment_blocks — spans of the two
  // qualifying runs in the 11-line fixture.
  test("comments: collect_comment_blocks line spans") {
    val content = Seq(
      "// line one", "// line two", "// line three", "fn foo() {}",
      "// short", "// only two", "code here", "// another", "// block of",
      "// three lines", "// and four").mkString("\n")
    val blocks = blocksOf("x.rs", content, "rust", Seq.empty)
    assert(blocks.map(b => (b._1, b._2)) == Seq((1, 3), (8, 11)))
  }
}
