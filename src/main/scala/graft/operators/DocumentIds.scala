package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stable document / point identity (common/src/document_id.rs) — THE
  * id derivations that make ingestion idempotent and branch-isolated:
  *
  *  - normalize_path_for_id (:69): backslashes → `/`, trailing
  *    slashes trimmed.
  *  - generate_document_id (:26): UUID v5 over the module's own
  *    namespace (7a3b9c4d-e5f6-478a-b1c2-d3e4f5061728) of
  *    `tenant|normalized_path`, HYPHENATED — same file + tenant ⇒
  *    same id across re-ingests (surgical updates). Rendered with the
  *    [[ParentUnits.uuid5Hex]] sha1-with-patched-nibbles machinery
  *    generalized to a caller namespace; DuckDB has no sha1, so the
  *    registered output pins identity through the (tenant, path) key
  *    and the uuid itself is KAT-pinned in DocumentIdsSpec (the
  *    parent_units precedent).
  *  - generate_point_id (:41): sha256(`tenant|branch|path|chunk`)
  *    [..32] hex — branch in the key ⇒ branch-isolated points.
  *  - generate_content_document_id (:56): sha256(`tenant|content`)
  *    [..32] for path-less content items.
  *
  * Map-only projections — the identity layer is shuffle-free at any
  * scale.
  */
object DocumentIds {

  /** document_id.rs DOCUMENT_ID_NAMESPACE as hex. */
  val DocNamespaceHex = "7a3b9c4de5f6478ab1c2d3e4f5061728"

  /** normalize_path_for_id (:69). */
  def normalizePath(p: Column): Column =
    regexp_replace(regexp_replace(p, "\\\\", "/"), "/+$", "")

  /** uuid::Uuid::new_v5(ns, name).to_string() — hyphenated — over an
    * arbitrary namespace (generalizes ParentUnits.uuid5Hex). */
  def uuid5Hyphenated(nsHex: String, name: Column): Column = {
    val h = sha1(concat(to_binary(lit(nsHex), lit("hex")),
      encode(name, "UTF-8")))
    val simple = concat(substring(h, 1, 12), lit("5"), substring(h, 14, 3),
      translate(substring(h, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"),
      substring(h, 18, 15))
    concat(substring(simple, 1, 8), lit("-"), substring(simple, 9, 4),
      lit("-"), substring(simple, 13, 4), lit("-"), substring(simple, 17, 4),
      lit("-"), substring(simple, 21, 12))
  }

  def documentId(tenant: Column, path: Column): Column =
    uuid5Hyphenated(DocNamespaceHex,
      concat(tenant, lit("|"), normalizePath(path)))

  def pointId(tenant: Column, branch: Column, path: Column,
              chunk: Column): Column =
    substring(sha2(concat_ws("|", tenant, branch, normalizePath(path),
      chunk), 256), 1, 32)

  def contentDocumentId(tenant: Column, content: Column): Column =
    substring(sha2(concat(tenant, lit("|"), content), 256), 1, 32)

  /** §3 `*Of` form — the registered output: normalized paths plus the
    * two sha256-derived ids (hard-oracled); the UUID document_id rides
    * the operator API + KATs, not the dump (DuckDB lacks sha1). */
  def documentIdsOf(rows: DataFrame): DataFrame =
    rows.select(col("tenant_id"), col("branch"), col("chunk_index"),
        col("file_path"),
        normalizePath(col("file_path")).as("normalized_path"),
        pointId(col("tenant_id"), col("branch"), col("file_path"),
          col("chunk_index")).as("point_id"),
        contentDocumentId(col("tenant_id"), col("content"))
          .as("content_doc_id"))
      .orderBy(col("tenant_id"), col("file_path"), col("branch"),
        col("chunk_index"))

  /** The identity axis over documents: per doc a path (with backslash
    * and trailing-slash arms), two branches, and two chunk ordinals —
    * the same content on both branches shares content_doc_id but
    * never point_id (branch isolation). */
  def idRows(spark: SparkSession, dir: String): DataFrame = {
    val idx = floor(col("doc_id") / 20).cast("long")
    val base = Tables.documents(spark, dir).select(
      col("source").as("tenant_id"), col("doc_id"),
      when(pmod(idx, lit(5)) === 0,
        concat(lit("C:\\w\\f"), idx, lit(".rs")))
        .when(pmod(idx, lit(5)) === 1, concat(lit("/a/b/f"), idx, lit(".md/")))
        .otherwise(concat(lit("src/f"), idx, lit(".py"))).as("file_path"),
      substring(col("text"), 1, 40).as("content"))
    base
      .crossJoin(broadcast(spark.range(2).select(
        concat(lit("b"), col("id")).as("branch"))))
      .crossJoin(broadcast(spark.range(2)
        .select(col("id").as("chunk_index"))))
  }

  def documentIds(spark: SparkSession, dir: String): DataFrame =
    documentIdsOf(idRows(spark, dir))
}
