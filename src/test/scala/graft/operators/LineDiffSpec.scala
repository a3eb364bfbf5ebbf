package graft.operators

import graft.SparkSpec
import graft.operators.LineDiffOps.{computeLineDiff, DiffOp}

/** All 17 reference vectors from line_diff.rs:343-524, plus the
  * walk-order and restricted-corpus equivalence properties the DuckDB
  * oracle relies on. */
class LineDiffSpec extends SparkSpec {

  private def ops(o: String, n: String): Vector[DiffOp] = computeLineDiff(o, n)
  private def count(v: Vector[DiffOp], op: String): Int = v.count(_.op == op)
  private def changeCount(v: Vector[DiffOp]): Int = v.count(_.op != "unchanged")

  test("identical content (line_diff.rs test_identical_content)") {
    val r = ops("line1\nline2\nline3", "line1\nline2\nline3")
    assert(changeCount(r) == 0)
    assert(r.length == 3)
    assert(r.forall(_.op == "unchanged"))
  }

  test("single line change (test_single_line_change)") {
    val r = ops("line1\nline2\nline3", "line1\nmodified\nline3")
    assert(count(r, "changed") == 1)
    assert(count(r, "inserted") == 0)
    assert(count(r, "deleted") == 0)
    assert(r(0) == DiffOp("unchanged", Some(0), Some(0), None))
    assert(r(2) == DiffOp("unchanged", Some(2), Some(2), None))
    assert(r(1) == DiffOp("changed", Some(1), Some(1), Some("modified")))
  }

  test("insert at end (test_insert_at_end)") {
    val r = ops("line1\nline2", "line1\nline2\nline3")
    assert(count(r, "inserted") == 1 && count(r, "deleted") == 0)
    assert(r.last == DiffOp("inserted", None, Some(2), Some("line3")))
  }

  test("insert at beginning (test_insert_at_beginning)") {
    val r = ops("line2\nline3", "line1\nline2\nline3")
    assert(count(r, "inserted") == 1 && count(r, "deleted") == 0)
    assert(r.head == DiffOp("inserted", None, Some(0), Some("line1")))
  }

  test("delete first line (test_delete_first_line)") {
    val r = ops("line1\nline2\nline3", "line2\nline3")
    assert(count(r, "deleted") == 1 && count(r, "inserted") == 0)
    assert(r.head == DiffOp("deleted", Some(0), None, None))
  }

  test("delete last line (test_delete_last_line)") {
    val r = ops("line1\nline2\nline3", "line1\nline2")
    assert(count(r, "deleted") == 1 && count(r, "inserted") == 0)
    assert(r.last == DiffOp("deleted", Some(2), None, None))
  }

  test("multi line change (test_multi_line_change)") {
    val r = ops("a\nb\nc\nd\ne", "a\nB\nC\nd\ne")
    assert(count(r, "changed") == 2)
    assert(count(r, "inserted") == 0 && count(r, "deleted") == 0)
  }

  test("empty to content (test_empty_to_content)") {
    val r = ops("", "line1\nline2")
    assert(count(r, "inserted") + count(r, "changed") > 0)
    assert(r.count(op => op.op != "inserted") == 1) // old has 1 line ("")
    assert(r.count(op => op.op != "deleted") == 2)  // new has 2
  }

  test("content to empty (test_content_to_empty)") {
    val r = ops("line1\nline2", "")
    assert(count(r, "deleted") + count(r, "changed") > 0)
    assert(r.count(op => op.op != "inserted") == 2)
    assert(r.count(op => op.op != "deleted") == 1)
  }

  test("completely different pairs as Changed (test_completely_different)") {
    val r = ops("aaa\nbbb\nccc", "xxx\nyyy\nzzz")
    assert(changeCount(r) == 3)
    assert(count(r, "changed") == 3)
  }

  test("insert in middle (test_insert_in_middle)") {
    val r = ops("line1\nline3", "line1\nline2\nline3")
    assert(count(r, "inserted") == 1)
    assert(count(r, "deleted") == 0 && count(r, "changed") == 0)
  }

  test("delete in middle (test_delete_in_middle)") {
    val r = ops("line1\nline2\nline3", "line1\nline3")
    assert(count(r, "deleted") == 1)
    assert(count(r, "inserted") == 0 && count(r, "changed") == 0)
  }

  test("realistic rust code (test_realistic_rust_code)") {
    val o = "fn main() {\n    println!(\"hello\");\n    let x = 42;\n    process(x);\n}\n\nfn process(val: i32) {\n    println!(\"{}\", val);\n}"
    val n = "fn main() {\n    println!(\"hello, world!\");\n    let x = 42;\n    let y = 10;\n    process(x, y);\n}\n\nfn process(val: i32, extra: i32) {\n    println!(\"{} {}\", val, extra);\n}"
    val r = ops(o, n)
    assert(changeCount(r) > 0)
  }

  test("300 lines 1 change (test_diff_performance_300_lines_1_change)") {
    val lines = (0 until 300).map(i => s"line $i content here")
    val o = lines.mkString("\n")
    val n = lines.updated(150, "CHANGED LINE 150").mkString("\n")
    val t0 = System.nanoTime()
    val r = ops(o, n)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 100, s"300-line diff took $ms ms") // reference target 10ms native; generous JVM margin
    assert(count(r, "changed") == 1)
    assert(count(r, "inserted") == 0 && count(r, "deleted") == 0)
  }

  test("1000 lines 10 scattered changes (test_diff_performance_1000_lines)") {
    val lines = (0 until 1000).map(i => s"line $i with some content")
    val o = lines.mkString("\n")
    val n = (0 until 1000).map(i =>
      if (i % 100 == 0) s"CHANGED $i" else s"line $i with some content").mkString("\n")
    val r = ops(o, n)
    assert(count(r, "changed") == 10)
  }

  test("op counts consistency (test_diff_op_counts_consistency)") {
    val r = ops("a\nb\nc\nd\ne", "a\nB\ninserted\nc\ne")
    val oldConsumed = r.count(op => op.op != "inserted")
    val newConsumed = r.count(op => op.op != "deleted")
    assert(oldConsumed == 5)
    assert(newConsumed == 5)
  }

  test("trailing newline handling (test_trailing_newline_handling)") {
    assert(changeCount(ops("line1\nline2\n", "line1\nline2\n")) == 0)
    val r = ops("line1\nline2", "line1\nline2\n")
    assert(r.count(op => op.op != "inserted") == 2)
    assert(r.count(op => op.op != "deleted") == 3)
    assert(changeCount(r) > 0)
  }

  // ── Properties the oracle construction relies on ──────────────────

  test("unique-line corpus: matching equals all common lines (oracle premise)") {
    // Old lines unique; new derived by delete/change/insert with
    // non-colliding contents — the Histogram matching must be exactly
    // the untouched lines, and the walk the per-segment rank-zip.
    val old = (0 until 40).map(i => s"u$i alpha")
    val newL = old.zipWithIndex.flatMap { case (l, i) =>
      val kept = if (i % 7 == 3) Nil
        else if (i % 7 == 5) Seq(s"~c~$i~$l") else Seq(l)
      if (i % 7 == 0) kept :+ s"~i~$i~doc" else kept
    }
    val r = ops(old.mkString("\n"), newL.mkString("\n"))
    val common = old.zipWithIndex.filter { case (_, i) => i % 7 != 3 && i % 7 != 5 }.map(_._1).toSet
    val unchanged = r.filter(_.op == "unchanged").map(op => old(op.oldIndex.get)).toSet
    assert(unchanged == common, "matching must be exactly the untouched lines")
    // every op indexes consistently
    r.filter(_.op == "unchanged").foreach { op =>
      assert(old(op.oldIndex.get) == newL(op.newIndex.get))
    }
    r.filter(_.op == "changed").foreach { op =>
      assert(op.content.get == newL(op.newIndex.get))
    }
  }

  test("segment rank-zip equivalence on an uneven segment (r removed > a added)") {
    // Between matches: old has 3 removed, new has 1 added →
    // walk must emit 1 changed then 2 deleted.
    val r = ops("k1\nr1\nr2\nr3\nk2", "k1\na1\nk2")
    assert(r == Vector(
      DiffOp("unchanged", Some(0), Some(0), None),
      DiffOp("changed", Some(1), Some(1), Some("a1")),
      DiffOp("deleted", Some(2), None, None),
      DiffOp("deleted", Some(3), None, None),
      DiffOp("unchanged", Some(4), Some(2), None)))
  }

  test("segment rank-zip equivalence (a added > r removed)") {
    val r = ops("k1\nr1\nk2", "k1\na1\na2\na3\nk2")
    assert(r == Vector(
      DiffOp("unchanged", Some(0), Some(0), None),
      DiffOp("changed", Some(1), Some(1), Some("a1")),
      DiffOp("inserted", None, Some(2), Some("a2")),
      DiffOp("inserted", None, Some(3), Some("a3")),
      DiffOp("unchanged", Some(2), Some(4), None)))
  }

  test("repeated lines still anchor (histogram occurrence weighting)") {
    // Blank lines repeat; the unique lines anchor around them.
    val o = "alpha\n\nbeta\n\ngamma"
    val n = "alpha\n\nBETA\n\ngamma"
    val r = ops(o, n)
    assert(count(r, "changed") == 1)
    assert(r.find(_.op == "changed").get.content.contains("BETA"))
    assert(count(r, "unchanged") == 4)
  }
}
