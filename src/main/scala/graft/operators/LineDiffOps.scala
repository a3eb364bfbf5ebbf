package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Line-level diff computation — the incremental code-search
  * maintenance subsystem's front end (line_diff.rs:123
  * `compute_line_diff`, fts_batch_processor/diff_apply.rs).
  *
  * The reference computes a minimal line edit script with imara-diff's
  * Histogram algorithm, then walks the per-line removed/added flags
  * with two cursors (line_diff.rs:131-188) to produce
  * Unchanged/Changed/Inserted/Deleted ops that map 1:1 onto
  * `code_lines` SQL operations. We port BOTH halves faithfully:
  * [[HistogramDiff]] is the anchoring algorithm (unique-anchor
  * recursion with prefix/suffix trim and imara's 63-occurrence chain
  * cap; regions with no eligible anchor degrade to whole-region
  * replacement — the flags-then-walk pipeline makes this
  * observationally identical to imara's hunk output on every
  * reference vector, see LineDiffSpec), and [[walk]] is a direct
  * port of the cursor loop including its defensive
  * exhausted-side branches.
  *
  * Relational shape: the document axis is the parallel axis — the diff
  * itself is genuine per-row imperative logic (a per-document edit
  * script has no relational decomposition), so it runs as a typed
  * `flatMap` over (doc, old, new) rows: map-only, no shuffle of the
  * corpus, scales linearly with document count at any SF.
  *
  * Oracle strategy: on a corpus whose lines are unique within each
  * file and whose edits never collide with surviving lines, the
  * Histogram matching provably equals "all common lines" (every
  * common element occurs once per side and in consistent order, so
  * each recursion anchors and the full LCS is matched), and the
  * cursor walk collapses to a per-segment rank-zip: between two
  * consecutive matched lines, the k-th removed old line pairs with
  * the k-th added new line as Changed, and the longer side's tail
  * becomes pure Deleted/Inserted. That construction IS
  * SQL-expressible (windows only, no recursion), which is what the
  * DuckDB oracle computes. [[diffCorpus]] derives such a corpus
  * deterministically from `documents` in both engines; general-input
  * fidelity (ambiguous repeats, fallback, trailing newlines) is
  * pinned by the 17 reference vectors in LineDiffSpec.
  */
object LineDiffOps {

  /** One diff op row (line_diff.rs:20 DiffOp). `content` carries the
    * new-side content for Changed/Inserted, null otherwise — exactly
    * the payload the reference's variants carry. */
  final case class DiffOp(op: String, oldIndex: Option[Int], newIndex: Option[Int],
                          content: Option[String])

  final case class DiffOpRow(doc_id: Long, op: String, old_index: Option[Int],
                             new_index: Option[Int], content: Option[String])

  // ─── Histogram matching ────────────────────────────────────────────

  /** imara-diff's histogram chain cap (imara-diff
    * src/histogram.rs `MAX_CHAIN_LEN`): elements occurring more than
    * 63 times on the old side are never anchors. */
  val MaxChainLen = 63

  /** Compute per-line removed/added flags — the Histogram matching
    * (line_diff.rs:92 build_change_flags). A line is matched
    * (not flagged) iff it is part of the common-subsequence anchoring
    * the algorithm selects: common prefix/suffix first, then
    * recursively the lowest-occurrence longest common region, exactly
    * the JGit/imara histogram strategy. */
  def changeFlags(oldLines: Array[String], newLines: Array[String]): (Array[Boolean], Array[Boolean]) = {
    // Intern lines to ints so region extension is integer compares.
    val intern = mutable.HashMap.empty[String, Int]
    def id(s: String): Int = intern.getOrElseUpdate(s, intern.size)
    val a = oldLines.map(id)
    val b = newLines.map(id)
    val matchedA = new Array[Boolean](a.length)
    val matchedB = new Array[Boolean](b.length)

    def recurse(a0: Int, a1: Int, b0: Int, b1: Int): Unit = {
      var x0 = a0; var x1 = a1; var y0 = b0; var y1 = b1
      while (x0 < x1 && y0 < y1 && a(x0) == b(y0)) {
        matchedA(x0) = true; matchedB(y0) = true; x0 += 1; y0 += 1
      }
      while (x1 > x0 && y1 > y0 && a(x1 - 1) == b(y1 - 1)) {
        matchedA(x1 - 1) = true; matchedB(y1 - 1) = true; x1 -= 1; y1 -= 1
      }
      if (x0 >= x1 || y0 >= y1) return

      // Histogram of the old-side range: element -> positions.
      val occ = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
      var i = x0
      while (i < x1) {
        occ.getOrElseUpdate(a(i), mutable.ArrayBuffer.empty) += i
        i += 1
      }

      // Scan the new-side range for the best common region: lowest
      // old-side occurrence count wins, longer region breaks ties
      // (the JGit HistogramDiffIndex selection rule).
      var bestCnt = MaxChainLen + 1
      var bestLen = 0
      var bAs = -1; var bAe = -1; var bBs = -1; var bBe = -1
      var j = y0
      while (j < y1) {
        var nextJ = j + 1
        occ.get(b(j)) match {
          case Some(positions) if positions.length <= MaxChainLen =>
            positions.foreach { p =>
              var as = p; var ae = p + 1; var bs = j; var be = j + 1
              while (as > x0 && bs > y0 && a(as - 1) == b(bs - 1)) { as -= 1; bs -= 1 }
              while (ae < x1 && be < y1 && a(ae) == b(be)) { ae += 1; be += 1 }
              // Region weight: the minimum occurrence count inside it.
              var cnt = Int.MaxValue
              var k = as
              while (k < ae) { cnt = math.min(cnt, occ(a(k)).length); k += 1 }
              val len = ae - as
              if (cnt < bestCnt || (cnt == bestCnt && len > bestLen)) {
                bestCnt = cnt; bestLen = len; bAs = as; bAe = ae; bBs = bs; bBe = be
              }
              if (be > nextJ) nextJ = be
            }
          case _ => ()
        }
        j = nextJ
      }

      if (bAs < 0) return // no eligible anchor: whole region stays unmatched

      var k = 0
      while (k < bAe - bAs) {
        matchedA(bAs + k) = true; matchedB(bBs + k) = true; k += 1
      }
      recurse(x0, bAs, y0, bBs)
      recurse(bAe, x1, bBe, y1)
    }

    recurse(0, a.length, 0, b.length)
    // Flags are the complement of the matching.
    (matchedA.map(!_), matchedB.map(!_))
  }

  /** The two-cursor op walk (line_diff.rs:131-188), ported branch for
    * branch including the defensive exhausted-side arms. */
  def walk(oldLines: Array[String], newLines: Array[String],
           oldRemoved: Array[Boolean], newAdded: Array[Boolean]): Vector[DiffOp] = {
    val ops = Vector.newBuilder[DiffOp]
    var oi = 0; var ni = 0
    while (oi < oldLines.length || ni < newLines.length) {
      val oldIsRemoved = oi < oldLines.length && oldRemoved(oi)
      val newIsAdded = ni < newLines.length && newAdded(ni)
      (oldIsRemoved, newIsAdded) match {
        case (false, false) =>
          if (oi < oldLines.length && ni < newLines.length) {
            ops += DiffOp("unchanged", Some(oi), Some(ni), None); oi += 1; ni += 1
          } else if (oi < oldLines.length) {
            ops += DiffOp("deleted", Some(oi), None, None); oi += 1
          } else {
            ops += DiffOp("inserted", None, Some(ni), Some(newLines(ni))); ni += 1
          }
        case (true, true) =>
          ops += DiffOp("changed", Some(oi), Some(ni), Some(newLines(ni))); oi += 1; ni += 1
        case (true, false) =>
          ops += DiffOp("deleted", Some(oi), None, None); oi += 1
        case (false, true) =>
          ops += DiffOp("inserted", None, Some(ni), Some(newLines(ni))); ni += 1
      }
    }
    ops.result()
  }

  /** compute_line_diff (line_diff.rs:123): split on `\n` (trailing
    * empties kept — Rust `split('\n')` semantics), flags, walk. */
  def computeLineDiff(oldContent: String, newContent: String): Vector[DiffOp] = {
    val oldLines = oldContent.split("\n", -1)
    val newLines = newContent.split("\n", -1)
    val (removed, added) = changeFlags(oldLines, newLines)
    walk(oldLines, newLines, removed, added)
  }

  // ─── Corpus derivation (shared with the DuckDB oracle) ─────────────

  /** Marker prefixes for deterministic edits; documents carrying a
    * line that starts with either are excluded so edited lines can
    * never collide with surviving ones (the guard is a no-op on the
    * synthetic corpus but makes the oracle equivalence unconditional). */
  val ChangeMarker = "~r7c~"
  val InsertMarker = "~r7i~"

  /** Width of the synthesized line axis: the corpus documents are
    * single-line, so each becomes a "file" of 24-char slices (the
    * same derive-lines-deterministically pattern code_comments and
    * doc_sections use). Duplicate slices are deduplicated to first
    * occurrence so lines are unique within each file — the property
    * the oracle equivalence is proven under. */
  val SliceWidth = 24

  /** The unique-line old axis: fixed-width slices of the document
    * text, deduplicated to first occurrence (order preserved),
    * re-indexed densely from 0. */
  def oldLinesOf(docs: DataFrame): DataFrame = {
    val wDup = Window.partitionBy(col("doc_id"), col("line")).orderBy(col("i0"))
    val wIdx = Window.partitionBy(col("doc_id")).orderBy(col("i0"))
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          greatest(ceil(length(col("text")) / lit(SliceWidth.toDouble)), lit(1.0))
            .cast("int") - 1)).as("i0"))
      .withColumn("line",
        col("text").substr(col("i0") * SliceWidth + 1, lit(SliceWidth)))
      .withColumn("dup_rn", row_number().over(wDup))
      .filter(col("dup_rn") === 1)
      .withColumn("oi", (row_number().over(wIdx) - 1).cast("int"))
      .select(col("doc_id"), col("oi"), col("line").as("content"))
  }

  /** Deterministic edit script over the old axis: delete `oi%7==3`,
    * change `oi%7==5` (marker-prefixed), insert after `oi%7==0`
    * (marker line). Both engines derive the same pair. */
  def diffPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(!col("text").contains(ChangeMarker) && !col("text").contains(InsertMarker))
    val old = oldLinesOf(docs)
    val kept = old.filter(pmod(col("oi"), lit(7)) =!= 3)
      .withColumn("nc",
        when(pmod(col("oi"), lit(7)) === 5,
          concat(lit(ChangeMarker), col("oi").cast("string"), lit("~"), col("content")))
          .otherwise(col("content")))
      .select(col("doc_id"), col("oi"), lit(0).as("sub"), col("nc"))
    val inserted = old.filter(pmod(col("oi"), lit(7)) === 0)
      .select(col("doc_id"), col("oi"), lit(1).as("sub"),
        concat(lit(InsertMarker), col("oi").cast("string"), lit("~"),
          col("doc_id").cast("string")).as("nc"))
    val newLines = kept.unionAll(inserted)
    val oldContent = old.groupBy("doc_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("oi"), col("content")))),
        x => x.getField("content")), "\n").as("old_content"))
    val newContent = newLines.groupBy("doc_id").agg(
      array_join(transform(array_sort(collect_list(struct(col("oi"), col("sub"), col("nc")))),
        x => x.getField("nc")), "\n").as("new_content"))
    oldContent.join(newContent, Seq("doc_id"))
  }

  /** Exploded diff ops over a (doc_id, old_content, new_content)
    * frame — the real Histogram diff per row, map-only. */
  def diffOpsOf(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("doc_id").cast("long"), col("old_content"), col("new_content"))
      .as[(Long, String, String)]
      .flatMap { case (docId, o, n) =>
        computeLineDiff(o, n).map(op =>
          DiffOpRow(docId, op.op, op.oldIndex, op.newIndex, op.content))
      }
      .toDF()
  }

  // ─── Registered queries ────────────────────────────────────────────

  /** line_diff: the full op stream on the derived corpus. */
  def lineDiff(spark: SparkSession, dir: String): DataFrame =
    diffOpsOf(diffPairs(spark, dir))
      .orderBy(col("doc_id"), col("old_index").asc_nulls_last, col("new_index"))

  /** diff_stats: per-file FileDiffStats (diff_apply.rs:23) plus the
    * old/new line counts DiffResult carries (line_diff.rs:40). Orphan
    * deletes are structurally zero — the walk accounts for every old
    * index — mirroring delete_orphaned_lines finding nothing on
    * well-formed diffs. */
  def diffStats(spark: SparkSession, dir: String): DataFrame =
    diffOpsOf(diffPairs(spark, dir))
      .groupBy("doc_id")
      .agg(
        sum(when(col("op") === "unchanged", 1).otherwise(0)).cast("long").as("lines_unchanged"),
        sum(when(col("op") === "changed", 1).otherwise(0)).cast("long").as("lines_updated"),
        sum(when(col("op") === "inserted", 1).otherwise(0)).cast("long").as("lines_inserted"),
        sum(when(col("op") === "deleted", 1).otherwise(0)).cast("long").as("lines_deleted"),
        sum(when(col("op") =!= "inserted", 1).otherwise(0)).cast("long").as("old_line_count"),
        sum(when(col("op") =!= "deleted", 1).otherwise(0)).cast("long").as("new_line_count"))
      .orderBy("doc_id")

  /** code_lines_state: the post-apply `code_lines` table
    * (diff_apply.rs:296 renumber_after_changes) — new-file lines with
    * `seq = initial_seq(i) = (i+1)*1000` and 1-based line numbers.
    * When a file has no inserts/deletes the renumber is skipped and
    * retained lines keep their prior seqs; on a freshly-ingested
    * state those are the initial gaps of the SAME indices (no shifts
    * without inserts/deletes), so the skip is value-identical here —
    * the condition is kept faithful in the expression below. */
  def codeLinesState(spark: SparkSession, dir: String): DataFrame = {
    val ops = diffOpsOf(diffPairs(spark, dir))
    val newRows = ops.filter(col("op") =!= "deleted")
    // Changed/Inserted carry content; Unchanged needs the old line text.
    val old = oldLinesOf(Tables.documents(spark, dir)
      .filter(!col("text").contains(ChangeMarker) && !col("text").contains(InsertMarker)))
      .withColumnRenamed("content", "old_line")
    newRows
      .join(old,
        newRows("doc_id") === old("doc_id") && newRows("old_index") === old("oi"), "left")
      .select(newRows("doc_id"), col("new_index"),
        coalesce(col("content"), col("old_line")).as("content"))
      .withColumn("line_number", (col("new_index") + 1).cast("long"))
      .withColumn("seq", ((col("new_index") + 1) * 1000.0).cast("double"))
      .drop("new_index")
      .orderBy("doc_id", "line_number")
  }

  /** fts_delta: the incremental FTS5 op stream (diff_apply.rs:175-227
    * apply_diff_ops' FTS5_DELETE_ROW / FTS5_INSERT_ROW calls) —
    * Changed emits delete(old content) then insert(new content) on
    * the same row (`sub` 0/1), Deleted emits delete(old), Inserted
    * emits insert(new). Unchanged emits nothing — that is the entire
    * point of F-018: index maintenance proportional to the edit, not
    * the file. */
  def ftsDelta(spark: SparkSession, dir: String): DataFrame = {
    val ops = diffOpsOf(diffPairs(spark, dir))
    val old = oldLinesOf(Tables.documents(spark, dir)
      .filter(!col("text").contains(ChangeMarker) && !col("text").contains(InsertMarker)))
      .withColumnRenamed("content", "old_line")
    val joined = ops.filter(col("op") =!= "unchanged")
      .join(old, ops("doc_id") === old("doc_id") && ops("old_index") === old("oi"), "left")
      .select(ops("doc_id"), col("op"), col("old_index"), col("new_index"),
        col("content"), col("old_line"))
    val deletes = joined.filter(col("op").isin("changed", "deleted"))
      .select(col("doc_id"), lit("delete").as("action"), lit(0).as("sub"),
        col("old_index"), col("new_index"), col("old_line").as("content"))
    val inserts = joined.filter(col("op").isin("changed", "inserted"))
      .select(col("doc_id"), lit("insert").as("action"), lit(1).as("sub"),
        col("old_index"), col("new_index"), col("content"))
    deletes.unionAll(inserts)
      .orderBy(col("doc_id"), col("old_index").asc_nulls_last, col("new_index"), col("sub"))
  }
}
