package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.TextFunctions._

/** Document-ingestion pipeline re-expressed as batch operators: the
  * reference's store path is chunk → dense embed + sparse embed →
  * point upsert with payload (reference:
  * src/rust/daemon/core/src/document_processor/chunking.rs:23 and
  * shared/point_builder.rs), and its read paths are retrieve/scroll and
  * the list tool (mcp-server/src/tools/retrieve.rs, tools/list/).
  *
  * Everything is a projected scan + narrow transforms (posexplode for
  * chunking) — map-only at 100 TB; collection stats is one partial-agg
  * shuffle on `source`.
  */
object Ingest {

  /** Fixed-size character chunking with overlap
    * (chunking.rs `chunk_by_characters`: chunk_size window advancing by
    * chunk_size − overlap). Emits (doc_id, chunk_index, start_char,
    * chunk_text, chunk_len).
    */
  def chunkDocuments(spark: SparkSession, dir: String,
                     chunkSize: Int = 200, overlap: Int = 50): DataFrame =
    chunkWithMeta(Tables.documents(spark, dir), chunkSize, overlap, Nil)
      .orderBy(col("doc_id"), col("chunk_index"))

  /** The chunking core: fixed char windows via posexplode, carrying any
    * extra per-document columns (lang/source payload) through the
    * explode so downstream never joins back to the corpus. Pure narrow
    * transforms — also legal on a streaming DataFrame (the
    * streaming_store path reuses it verbatim). */
  private[graft] def chunkWithMeta(docs: DataFrame, chunkSize: Int, overlap: Int,
                                   extraCols: Seq[String]): DataFrame = {
    val stride = chunkSize - overlap
    docs
      .select(col("doc_id") +: extraCols.map(col) :+
        posexplode(expr(
          s"transform(sequence(1, greatest(length(text), 1), $stride), s -> struct(s AS start_char, substr(text, s, $chunkSize) AS chunk_text))"))
          .as(Seq("chunk_index", "c")): _*)
      .select(col("doc_id") +: extraCols.map(col) :+ col("chunk_index") :+
        col("c.start_char").as("start_char") :+
        col("c.chunk_text").as("chunk_text"): _*)
      .withColumn("chunk_len", length(col("chunk_text")))
      .filter(col("chunk_len") > 0)
  }

  /** Full store pipeline: chunk → deterministic fake dense embedding
    * (hash-derived vector — the real model is a service the container
    * doesn't have; the Spark-side plumbing is real) → sparse BM25 stats
    * per chunk → point rows with payload, point ids from content digest
    * (reference: common/src/hashing.rs document ids). lang/source ride
    * the chunk explode from the same scan — no join back to the corpus.
    *
    * The fake embedding components are the md5 hex digits of the chunk
    * text (nibble j → integer 0..15 → j-th coordinate v/8−1 ∈ [−1,0.875])
    * and the exported digest is md5 over the INTEGER nibble values — a
    * format-stable encoding with no engine-specific double formatting,
    * so the DuckDB oracle reproduces digest and norm exactly.
    */
  def storePoints(spark: SparkSession, dir: String,
                  dim: Int = 8): DataFrame =
    pointRows(chunkWithMeta(Tables.documents(spark, dir), 200, 50, Seq("lang", "source")), dim)
      .orderBy(col("doc_id"), col("chunk_index"))

  /** The point-construction core over a chunk frame (point_builder.rs):
    * map-only column expressions, shared verbatim between the batch
    * store above and the streaming_store path — the digest scheme is
    * identical by construction, so batch and stream reconcile
    * row-for-row on a closed input.
    */
  private[graft] def pointRows(chunks: DataFrame, dim: Int = 8): DataFrame = {
    require(dim <= 32, "md5 supplies 32 hex nibbles")
    val nibbles = (0 until dim).map { j =>
      conv(substring(md5(col("chunk_text")), j + 1, 1), 16, 10)
    }
    val denseCols = nibbles.map(n => n.cast("double") / 8.0 - 1.0)
    chunks
      .withColumn("point_id", md5(concat_ws("#", col("doc_id"), col("chunk_index"), col("chunk_text"))))
      .withColumn("dense", array(denseCols: _*))
      .withColumn("dense_digest", md5(concat_ws(",", nibbles: _*)))
      .withColumn("dense_norm",
        round(sqrt(aggregate(col("dense"), lit(0.0), (acc, x) => acc + x * x)), 4))
      .withColumn("sparse_nnz", size(array_distinct(tokenizeSimple(col("chunk_text")))))
      .select(col("point_id"), col("doc_id"), col("chunk_index"),
        col("dense_digest"), col("dense_norm"), col("sparse_nnz"),
        col("lang"), col("source"), col("chunk_len"))
  }

  /** Paragraphs from blank-line structure, the reference's default
    * (chunking.rs:50 `text.split("\n\n")`, trimmed, empties dropped).
    */
  def paragraphsFromText(text: Column): Column =
    filter(transform(split(text, "\n\n"), p => trim(p)), p => p =!= lit(""))

  /** Synthesized paragraphs for corpora without blank-line structure
    * (this test corpus is a flat word stream): fixed groups of
    * `wordsPerPara` words. Deterministic and cheap — one split + one
    * transform, no shuffle.
    */
  def wordGroupParagraphs(text: Column, wordsPerPara: Int = 8): Column = {
    val ws = filter(split(text, " "), w => w =!= lit(""))
    filter(
      transform(
        sequence(lit(0), greatest(((size(ws) - 1) / lit(wordsPerPara)).cast("int"), lit(0))),
        g => trim(array_join(slice(ws, g * wordsPerPara + 1, lit(wordsPerPara)), " "))),
      p => p =!= lit(""))
  }

  /** Paragraph-preserving chunking (chunking.rs:44 `chunk_by_paragraphs`):
    * pack trimmed paragraphs into chunks joined by "\n\n"; when the next
    * paragraph would push the chunk past `chunkSize` (+2 for the
    * separator), flush it and carry back the last `overlap` chars as the
    * start of the next chunk (overlap = 0: the fresh chunk starts past
    * the separator, chunking.rs's fresh-chunk case). Every chunk is a
    * slice of the normalized text (paragraphs joined by "\n\n"), so the
    * fold only tracks integer boundaries — a per-row `aggregate` HOF,
    * map-only at any scale — and content is cut with one substring at
    * the end.
    */
  def chunkParagraphs(spark: SparkSession, dir: String,
                      chunkSize: Int = 120, overlap: Int = 30,
                      wordsPerPara: Int = 8): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), wordGroupParagraphs(col("text"), wordsPerPara).as("ps"))
    chunkParagraphsOf(docs, chunkSize, overlap)
  }

  /** The packing fold over a (doc_id, ps: array<string>) frame.
    * State is (emitted "start,end" pairs ";"-joined, cur_start, cur_len);
    * the branch order is exactly the reference's: flush-then-append,
    * append with separator, or start fresh.
    */
  def chunkParagraphsOf(docs: DataFrame, chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0, "negative overlap is meaningless")
    def emit(acc: Column): Column =
      concat(acc("b"), when(acc("b") === "", lit("")).otherwise(lit(";")),
        acc("cs").cast("string"), lit(","), (acc("cs") + acc("cl")).cast("string"))
    val zero = struct(lit("").as("b"), lit(0L).as("cs"), lit(0L).as("cl"))
    val folded = aggregate(col("ps"), zero,
      (acc, p) => {
        val lp = length(p).cast("long")
        val ov = greatest(acc("cl") - lit(overlap.toLong), lit(0L))
        // overlap = 0 (chunking.rs supports it): the fresh chunk starts
        // PAST the "\n\n" separator with no carried chars — the generic
        // arithmetic would prepend the separator to the next chunk.
        def flushed =
          if (overlap == 0)
            struct(emit(acc).as("b"), (acc("cs") + acc("cl") + lit(2L)).as("cs"), lp.as("cl"))
          else
            struct(emit(acc).as("b"), (acc("cs") + ov).as("cs"),
              (acc("cl") - ov + lit(2L) + lp).as("cl"))
        when(acc("cl") > 0 && acc("cl") + lp + lit(2L) > lit(chunkSize.toLong),
          flushed)
          .when(acc("cl") > 0,
            struct(acc("b").as("b"), acc("cs").as("cs"), (acc("cl") + lit(2L) + lp).as("cl")))
          .otherwise(struct(acc("b").as("b"), acc("cs").as("cs"), lp.as("cl")))
      },
      acc => when(acc("cl") > 0, emit(acc)).otherwise(acc("b")))

    docs
      .select(col("doc_id"), concat_ws("\n\n", col("ps")).as("norm"), folded.as("b"))
      .filter(col("b") =!= "")
      .select(col("doc_id"), col("norm"),
        posexplode(split(col("b"), ";")).as(Seq("chunk_index", "pr")))
      .select(col("doc_id"), col("chunk_index").cast("int").as("chunk_index"),
        split(col("pr"), ",")(0).cast("long").as("start_char"),
        col("norm"), split(col("pr"), ",")(1).cast("long").as("end_char"))
      .select(col("doc_id"), col("chunk_index"), col("start_char"),
        col("norm").substr(col("start_char").cast("int") + 1,
          (col("end_char") - col("start_char")).cast("int")).as("content"),
        (col("end_char") - col("start_char")).as("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_index"))
  }

  /** Keyset-paginated retrieve (Qdrant scroll): filter by payload field,
    * seek past the last-seen id, take one page — filter pushes to the
    * scan and the page is a TakeOrderedAndProject (per-partition heap),
    * never a global single-partition window.
    */
  def retrieveScroll(spark: SparkSession, dir: String,
                     lang: String = "en", lastSeen: Long = 40L, pageSize: Int = 20): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("lang") === lang && col("doc_id") > lastSeen)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
      .limit(pageSize)

  /** Library hierarchy rollup (keyword_extraction/hierarchy_builder/
    * builder.rs): the nightly builder materializes per-tenant rollups of
    * the tag/document store, walking tenant → collection → detail
    * (builder.rs:126 rebuild_all over builder.rs:239
    * collect_concept_tags' per-tenant GROUP BY). Re-expressed as ONE
    * grouping-sets pass — `ROLLUP(library, section)` where library =
    * `source` (the tenant axis) and section = `lang` — instead of the
    * reference's per-tenant loop: detail, per-library, and grand-total
    * rows in a single shuffle. `lvl` is the grouping depth (0 = detail,
    * 1 = library subtotal, 2 = grand total).
    */
  def libraryRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source").as("library"), col("lang").as("section"), col("n_chars"))
      .rollup(col("library"), col("section"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        (grouping(col("library")) * 2 + grouping(col("section"))).cast("int").as("lvl"))
      .select(col("lvl"), col("library"), col("section"),
        col("n_docs"), col("total_chars"), col("avg_chars"))
      .orderBy(col("lvl"), col("library"), col("section"))

  /** Per-collection stats (the reference's list tool): document counts
    * and size aggregates grouped by `source`.
    */
  def collectionStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        round(avg(col("n_chars")), 4).as("avg_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("source"))
}
