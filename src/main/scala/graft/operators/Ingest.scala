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
                     chunkSize: Int = 200, overlap: Int = 50): DataFrame = {
    val stride = chunkSize - overlap
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(1, greatest(length(text), 1), $stride), s -> struct(s AS start_char, substr(text, s, $chunkSize) AS chunk_text))"))
          .as(Seq("chunk_index", "c")))
      .select(col("doc_id"), col("chunk_index"),
        col("c.start_char").as("start_char"),
        col("c.chunk_text").as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
      .filter(col("chunk_len") > 0)
      .orderBy(col("doc_id"), col("chunk_index"))
  }

  /** Full store pipeline: chunk → deterministic fake dense embedding
    * (hash-derived unit vector — the real model is a service the
    * container doesn't have; the Spark-side plumbing is real) → sparse
    * BM25 stats per chunk → point rows with payload, point ids from
    * content digest (reference: common/src/hashing.rs document ids).
    */
  def storePoints(spark: SparkSession, dir: String,
                  dim: Int = 8): DataFrame = {
    val chunks = chunkDocuments(spark, dir)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("source"))
    val denseCols = (0 until dim).map { j =>
      (pmod(xxhash64(col("chunk_text"), lit(j)), lit(2000L)).cast("double") / 1000.0 - 1.0)
    }
    chunks.join(broadcast(docs), "doc_id")
      .withColumn("point_id", md5(concat_ws("#", col("doc_id"), col("chunk_index"), col("chunk_text"))))
      .withColumn("dense", array(denseCols: _*))
      .withColumn("sparse_nnz", size(array_distinct(tokenizeSimple(col("chunk_text")))))
      .select(col("point_id"), col("doc_id"), col("chunk_index"),
        col("dense"), col("sparse_nnz"), col("lang"), col("source"), col("chunk_len"))
      .orderBy(col("doc_id"), col("chunk_index"))
  }

  /** Keyset-paginated retrieve (Qdrant scroll): filter by payload field,
    * order by id, return one page. The window is only for the bounded
    * page — at scale the filter pushes to the scan and the page is a
    * TakeOrdered.
    */
  def retrieveScroll(spark: SparkSession, dir: String,
                     lang: String = "en", pageStart: Int = 41, pageEnd: Int = 60): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("lang") === lang)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
      .filter(col("rn").between(pageStart, pageEnd))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

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
