package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Hierarchical library tenancy (library_hierarchy.rs): resolve a
  * document's `library_name / library_path / document_name` location
  * from its absolute path relative to a library root, plus the
  * prefix-matching used for path-scoped library search.
  *
  * Everything is a codegen'd projection over the corpus path axis —
  * no joins, no shuffle beyond the final ORDER BY; at 100 TB this is
  * a map-only pass the scanner fuses into the read.
  *
  * Faithful semantics:
  *  - `extract_library_path` (:57): `strip_prefix` returns None when
  *    the document is not under the root (the row is dropped), the
  *    document_name is the relative path's LAST component, and the
  *    library_path is its parent with `\` normalized to `/` (empty for
  *    root-level docs).
  *  - `full_path` (:32): `name/path/doc`, with the path segment
  *    omitted entirely when empty.
  *  - `normalize_path_prefix` (:103): trim whitespace, trim BOTH `/`
  *    ends, normalize `\`.
  *  - `path_matches_prefix` (:112): empty prefix matches everything;
  *    otherwise exact equality or a `prefix + "/"` boundary — `cs`
  *    matches `cs/x` but never `cs-advanced/x`.
  */
object LibraryPaths {

  /** path_matches_prefix as a column expression (both sides already
    * normalized). */
  def pathMatchesPrefix(path: Column, prefix: String): Column = {
    val norm = prefix.trim.stripPrefix("/").stripSuffix("/").replace('\\', '/')
    if (norm.isEmpty) lit(true)
    else {
      val p = regexp_replace(path, lit("\\\\"), lit("/"))
      p === norm || p.startsWith(norm + "/")
    }
  }

  /** extract_library_path + full_path over (library_name,
    * library_root, document_path) rows; not-under-root rows drop. */
  def locationsOf(docs: DataFrame): DataFrame = {
    val rel = regexp_replace(
      col("document_path").substr(length(col("library_root")) + 2, lit(1 << 20)),
      lit("\\\\"), lit("/"))
    val under = col("document_path").startsWith(concat(col("library_root"), lit("/")))
    val name = element_at(split(rel, "/"), -1)
    val path = when(size(split(rel, "/")) > 1,
      array_join(slice(split(rel, "/"), lit(1), size(split(rel, "/")) - 1), "/"))
      .otherwise(lit(""))
    docs.filter(under)
      .withColumn("library_path", path)
      .withColumn("document_name", name)
      .filter(col("document_name") =!= "")
      .withColumn("full_path",
        when(col("library_path") === "",
          concat(col("library_name"), lit("/"), col("document_name")))
          .otherwise(concat(col("library_name"), lit("/"), col("library_path"),
            lit("/"), col("document_name"))))
  }

  /** library_paths: locations for a derived library corpus — each
    * document files under `/libs/<source>` at depth doc_id%3 (0 =
    * root-level, exercising the empty-path arm), with doc_id%11==0
    * rows parked OUTSIDE the root (dropped, the strip_prefix None
    * arm), plus the `cs`-prefix match flag probing the segment
    * boundary (`cs`, `cs/…` match; `cs-extra/…` must not). */
  def libraryPaths(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("library_name"))
      .withColumn("library_root", concat(lit("/libs/"), col("library_name")))
      .withColumn("seg1",
        when(pmod(col("doc_id"), lit(9)) === 2, lit("cs"))
          .when(pmod(col("doc_id"), lit(9)) === 5, lit("cs-extra"))
          .otherwise(concat(lit("topic"), pmod(col("doc_id"), lit(4)))))
      .withColumn("document_path",
        when(pmod(col("doc_id"), lit(11)) === 0,
          concat(lit("/other/place/doc"), col("doc_id"), lit(".pdf")))
          .when(pmod(col("doc_id"), lit(3)) === 0,
            concat(col("library_root"), lit("/doc"), col("doc_id"), lit(".pdf")))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat(col("library_root"), lit("/"), col("seg1"),
              lit("/doc"), col("doc_id"), lit(".pdf")))
          .otherwise(
            concat(col("library_root"), lit("/"), col("seg1"), lit("/sub"),
              pmod(col("doc_id"), lit(5)), lit("/doc"), col("doc_id"), lit(".pdf"))))
    locationsOf(d)
      .withColumn("matches_cs", pathMatchesPrefix(col("library_path"), " cs/ "))
      .select(col("doc_id"), col("library_name"), col("library_path"),
        col("document_name"), col("full_path"), col("matches_cs"))
      .orderBy(col("doc_id"))
  }
}
