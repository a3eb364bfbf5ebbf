package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** State reconstruction from store points — the recovery CLI's
  * project-arm rebuild (cli/commands/recover_state/reconstruction.rs:22
  * reconstruct_project_state): given the scrolled points of a projects
  * collection, re-derive watch_folders (one per tenant, rooted at the
  * inferred project root), tracked_files (one per (file_path, branch)
  * group, attributes from the group's first point, chunk_count = group
  * size), and qdrant_chunks (one per point with a valid id,
  * content_hash = sha256(content)[..32], :396).
  *
  * Reference semantics reproduced exactly:
  *  - Grouping key (:297 group_points_by_file): file_path falling back
  *    to absolute_path, empty skipped; branch = branches[0] falling
  *    back to the scalar `branch` then "main" (an EMPTY branches array
  *    falls through, :307).
  *  - infer_project_root (:439): the longest common ancestor of the
  *    tenant's `absolute_path`-else-`file_path` values at COMPONENT
  *    granularity (the opposite fallback order to the grouping key — a
  *    faithful quirk); no paths → "/unknown-project"; a single path →
  *    its parent directory; zero common components →
  *    "/unknown-project". The twin computes the LCA as the common
  *    component prefix of the lexicographic MIN and MAX path (equal to
  *    the all-paths LCA), one aggregate instead of a sequential scan.
  *  - "First point" of a group is scroll order in the reference
  *    (nondeterministic); the twin totalizes it as (chunk_index,
  *    point_id) order and documents the choice.
  *  - Chunks with no extractable point id are skipped (:391) — so
  *    `n_chunks` can undercut `chunk_count`, exactly as the INSERT
  *    counts diverge in the reference.
  *
  * Output: one row per reconstructed tracked_file, carrying its watch
  * folder's inferred root and the chunk aggregates (count + an
  * order-stable digest of the chunk content hashes standing in for the
  * qdrant_chunks child rows).
  *
  * Shape: one groupBy per axis (tenant roots; file groups) over a
  * single points scan — shuffle ∝ points.
  */
object StateReconstruct {

  val UnknownProject = "/unknown-project" // reconstruction.rs:450

  /** Longest-common-ancestor of a tenant's paths via the min/max trick:
    * the component-prefix LCA of all paths equals that of the
    * lexicographic extremes. */
  private def lcaColumns(minP: Column, maxP: Column): Column = {
    val a = split(minP, "/")
    val b = split(maxP, "/")
    val eq = zip_with(a, b, (x, y) => x <=> y)
    // array_position yields 0 (not null) when no mismatch exists
    val pos = array_position(eq, false).cast("int")
    val prefixLen = when(pos === 0, least(size(a), size(b)))
      .otherwise(pos - 1)
    when(prefixLen === 0, lit(UnknownProject))
      .otherwise(array_join(slice(a, lit(1), prefixLen), "/"))
  }

  /** §3 `*Of` form. `points` columns: point_id (nullable), tenant_id,
    * file_path (nullable), absolute_path (nullable), branches
    * (nullable array), branch (nullable), chunk_index, content,
    * file_hash, language, file_type, base_point, relative_path,
    * extension. */
  def reconstructProjectsOf(points: DataFrame): DataFrame = {
    // Root inference axis: absolute_path else file_path (:443).
    val rootPaths = points
      .select(col("tenant_id"),
        coalesce(col("absolute_path"), col("file_path")).as("rp"))
      .filter(col("rp").isNotNull)
    val roots = rootPaths.groupBy(col("tenant_id"))
      .agg(count(lit(1)).as("n_paths"),
        min(col("rp")).as("min_p"), max(col("rp")).as("max_p"))
      .select(col("tenant_id"),
        when(col("n_paths") === 0, lit(UnknownProject))
          // single path → its parent ("/x.rs" parents to "/", like
          // Path::parent; a bare filename parents to "")
          .when(col("n_paths") === 1,
            when(col("min_p").rlike("^/[^/]*$"), lit("/"))
              .otherwise(regexp_replace(col("min_p"), "/?[^/]*$", "")))
          .otherwise(lcaColumns(col("min_p"), col("max_p")))
          .as("project_root"))
    // All tenants get a folder even with zero usable paths (the loop
    // runs per tenant group; an empty path set is /unknown-project).
    val allTenants = points.select(col("tenant_id")).distinct()
      .join(roots, Seq("tenant_id"), "left")
      .withColumn("project_root",
        coalesce(col("project_root"), lit(UnknownProject)))

    // File grouping key (:297): file_path else absolute_path, empty
    // (null) skipped; branches[0] else branch else 'main'.
    val keyed = points
      .withColumn("g_path", coalesce(col("file_path"), col("absolute_path")))
      .filter(col("g_path").isNotNull && col("g_path") =!= "")
      .withColumn("g_branch", coalesce(
        try_element_at(col("branches"), lit(1)), col("branch"), lit("main")))

    val grouped = keyed
      .groupBy(col("tenant_id"), col("g_path").as("file_path"),
        col("g_branch").as("branch"))
      .agg(
        count(lit(1)).as("chunk_count"),
        // first point by (chunk_index, point_id) — the deterministic
        // totalization of the reference's scroll order
        min(struct(col("chunk_index").as("ci"), col("point_id").as("pi"),
          col("file_hash").as("fh"), col("language").as("lg"),
          col("file_type").as("ft"), col("base_point").as("bp"),
          col("relative_path").as("rp"), col("extension").as("ex"))).as("f"),
        // qdrant_chunks: only points with an extractable id (:391)
        sum(when(col("point_id").isNotNull, 1L).otherwise(0L)).as("n_chunks"),
        md5(concat_ws("|", array_sort(collect_list(
          when(col("point_id").isNotNull, concat_ws(":",
            lpad(col("chunk_index").cast("string"), 6, "0"),
            substring(sha2(col("content"), 256), 1, 32))))))).as("chunks_digest"))

    grouped
      .join(broadcast(allTenants), Seq("tenant_id"))
      .select(col("tenant_id"), col("project_root"), col("file_path"),
        col("branch"), col("chunk_count"),
        coalesce(col("f.fh"), lit("")).as("file_hash"),
        col("f.lg").as("language"), col("f.ft").as("file_type"),
        col("f.bp").as("base_point"), col("f.rp").as("relative_path"),
        col("f.ex").as("extension"), col("n_chunks"), col("chunks_digest"))
  }

  /** The corpus points frame: the store pipeline's chunks (same
    * chunking and md5 point-id scheme as store_points) dressed with
    * the recovery payload fields — absolute/file path presence,
    * branches/branch/default fallbacks, and a missing-point-id residue
    * all cycle so every reconstruction arm is live. */
  def corpusPoints(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val chunks = Ingest.chunkWithMeta(docs, 200, 50, Seq("source"))
    val path = FileClassification.syntheticPathCol
    chunks
      .withColumn("pid0", md5(concat_ws("#", col("doc_id"),
        col("chunk_index"), col("chunk_text"))))
      .select(
        when(pmod(col("doc_id"), lit(31)) === 3 && col("chunk_index") === 0,
          lit(null).cast("string")).otherwise(col("pid0")).as("point_id"),
        col("source").as("tenant_id"),
        when(pmod(col("doc_id"), lit(23)) === 11, lit(null).cast("string"))
          .otherwise(path).as("file_path"),
        when(pmod(col("doc_id"), lit(19)) === 7, lit(null).cast("string"))
          .otherwise(path).as("absolute_path"),
        when(pmod(col("doc_id"), lit(5)) === 0, array(lit("feature"), lit("main")))
          .when(pmod(col("doc_id"), lit(5)) === 1,
            array().cast("array<string>"))
          .otherwise(lit(null).cast("array<string>")).as("branches"),
        when(pmod(col("doc_id"), lit(5)) === 2, lit("dev"))
          .otherwise(lit(null).cast("string")).as("branch"),
        col("chunk_index"),
        col("chunk_text").as("content"),
        md5(path).as("file_hash"),
        when(col("chunk_index") === 0, lit("python")).otherwise(lit("rust"))
          .as("language"),
        element_at(array(lit("code"), lit("text"), lit("docs")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("file_type"),
        md5(concat(path, lit("#0"))).as("base_point"),
        regexp_replace(path, "^/proj/[^/]+/", "").as("relative_path"),
        FileClassification.extensionOf(FileClassification.fileName(path))
          .as("extension"))
  }

  /** state_reconstruct query over the synthetic recovery scroll. */
  def stateReconstruct(spark: SparkSession, dir: String): DataFrame =
    reconstructProjectsOf(corpusPoints(spark, dir))
      .orderBy(col("tenant_id"), col("file_path"), col("branch"))
}
