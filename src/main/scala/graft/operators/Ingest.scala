package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * explode so downstream never joins back to the corpus. */
  private def chunkWithMeta(docs: DataFrame, chunkSize: Int, overlap: Int,
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
    * The dense vector is exported as a scalar digest + norm (verifiable
    * columns); the array itself stays internal.
    */
  def storePoints(spark: SparkSession, dir: String,
                  dim: Int = 8): DataFrame = {
    val chunks = chunkWithMeta(Tables.documents(spark, dir), 200, 50, Seq("lang", "source"))
    val denseCols = (0 until dim).map { j =>
      (pmod(xxhash64(col("chunk_text"), lit(j)), lit(2000L)).cast("double") / 1000.0 - 1.0)
    }
    chunks
      .withColumn("point_id", md5(concat_ws("#", col("doc_id"), col("chunk_index"), col("chunk_text"))))
      .withColumn("dense", array(denseCols: _*))
      .withColumn("dense_digest", md5(concat_ws(",", col("dense").cast("array<string>"))))
      .withColumn("dense_norm",
        round(sqrt(aggregate(col("dense"), lit(0.0), (acc, x) => acc + x * x)), 4))
      .withColumn("sparse_nnz", size(array_distinct(tokenizeSimple(col("chunk_text")))))
      .select(col("point_id"), col("doc_id"), col("chunk_index"),
        col("dense_digest"), col("dense_norm"), col("sparse_nnz"),
        col("lang"), col("source"), col("chunk_len"))
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
