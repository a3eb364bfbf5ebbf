package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The MCP `list` tool's folder-tree model (mcp-server tools/list/
  * tree.rs + renderers.rs, mirroring list-files/tree-builder.ts):
  * folder nodes built from a flat tracked-file list, submodule
  * stop-descent, per-node rollups, and the summary renderer's
  * extension aggregation.
  *
  * Faithful semantics:
  *  - insert_file (tree.rs:31): folder nodes exist only where a file's
  *    directory chain creates them; descent STOPS at a submodule
  *    folder — the submodule node itself is created, nothing below it
  *    ever exists, and the file is NOT attached (tree.rs:79-91), so a
  *    submodule's total_files is 0 and no file under any submodule
  *    prefix is counted anywhere.
  *  - compute_total_files (tree.rs:97): attached files in the subtree.
  *  - aggregate_extensions (renderers.rs:219): per-subtree counts
  *    keyed by `extension ?? "other"`, INSERTION-ordered — node files
  *    in input order, then children in BTreeMap BYTE order, files
  *    before children at every node. format_extension_summary
  *    (renderers.rs:249) sorts count-desc with the stable first-seen
  *    tiebreak, shows 4, folds the rest into `N other`, and renders
  *    `(empty)` for zero files.
  *
  * Relational shape: one explode of each file's ancestor-prefix chain
  * (shuffle ∝ files × depth — bounded by path depth, never quadratic),
  * then groupBys keyed by (folder[, ext]). The traversal order is
  * captured as ONE sortable string key (`dir#idx` — `#` < `/` < alnum
  * makes at-node files sort before children for alphanumeric segment
  * names, byte order matching BTreeMap), so first-seen ranks are
  * min() aggregates, not a sequential walk. The renderers' string
  * output is presentation; the tree TABLE is the operator (tree/
  * summary/flat walk the same nodes with depth/limit caps).
  */
object FileTree {

  /** Per-folder tree table over `(relative_path, extension, input_idx)`
    * files and `(sm_path, repo_name)` submodules. Segment names must
    * be alphanumeric for the single-string traversal key (corpus
    * guarantee; documented above). */
  def treeOf(files: DataFrame, submodules: DataFrame): DataFrame = {
    val segs = split(col("relative_path"), "/")
    val nDirs = size(segs) - 1
    val withDirs = files
      .withColumn("dir_segs", slice(segs, lit(1), nDirs))
      .withColumn("dir_path", array_join(col("dir_segs"), "/"))
      .withColumn("trav_key",
        concat(col("dir_path"), lit("#"),
          lpad(col("input_idx").cast("string"), 12, "0")))

    // Every proper ancestor prefix, depth 1..nDirs.
    val prefixes = withDirs
      .select(col("relative_path"), col("extension"), col("trav_key"),
        col("dir_path"), col("dir_segs"),
        posexplode_outer(expr(
          // sequence(1, 0) DESCENDS in Spark — guard the no-dir case
          "case when size(dir_segs) = 0 then array() else transform(sequence(1, size(dir_segs)), i -> array_join(slice(dir_segs, 1, i), '/')) end")))
      .withColumnRenamed("col", "prefix")
      .withColumn("depth", col("pos") + 1)
      .filter(col("prefix").isNotNull)

    val sm = submodules.select(col("sm_path"), col("repo_name"))
    // The shallowest submodule ancestor stops the descent.
    val smDepth = prefixes.join(sm, col("prefix") === col("sm_path"))
      .groupBy(col("relative_path"))
      .agg(min(col("depth")).as("sm_min_depth"))
    val marked = withDirs.join(smDepth, Seq("relative_path"), "left")

    // Folder nodes: prefixes at depth <= the submodule cut (inclusive).
    val created = prefixes
      .join(smDepth, Seq("relative_path"), "left")
      .filter(col("sm_min_depth").isNull || col("depth") <= col("sm_min_depth"))
      .select(col("prefix").as("folder_path"), col("depth")).distinct()
    val root = created.sparkSession.range(1)
      .select(lit(".").as("folder_path"), lit(0).as("depth"))
    val folders = root.unionAll(created)

    // Attached files (no submodule ancestor), exploded over their own
    // rollup chain: root + every ancestor.
    val attached = marked.filter(col("sm_min_depth").isNull)
      .select(col("relative_path"), col("extension"), col("trav_key"),
        col("dir_path"), col("dir_segs"),
        explode(expr(
          "concat(array('.'), case when size(dir_segs) = 0 then array() else transform(sequence(1, size(dir_segs)), i -> array_join(slice(dir_segs, 1, i), '/')) end)"))
          .as("folder_path"))

    val totals = attached.groupBy(col("folder_path"))
      .agg(count(lit(1)).as("total_files"),
        sum(when(col("folder_path") === "." && col("dir_path") === "", 1)
          .when(col("folder_path") === col("dir_path"), 1).otherwise(0))
          .as("n_direct_files"))

    // aggregate_extensions: count + first-seen traversal rank per ext.
    val perExt = attached
      .withColumn("ext_key", coalesce(col("extension"), lit("other")))
      .groupBy(col("folder_path"), col("ext_key"))
      .agg(count(lit(1)).as("cnt"), min(col("trav_key")).as("first_seen"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("folder_path"))
          .orderBy(col("cnt").desc, col("first_seen"))))
    val summaries = perExt
      .withColumn("n_ext", count(lit(1)).over(Window.partitionBy(col("folder_path"))))
      .withColumn("shown_sum",
        sum(when(col("rnk") <= 4, col("cnt")).otherwise(0))
          .over(Window.partitionBy(col("folder_path"))))
      .filter(col("rnk") <= 4)
      .groupBy(col("folder_path"))
      .agg(
        array_join(transform(array_sort(collect_list(
          struct(col("rnk"), concat(col("cnt"), lit(" "), col("ext_key")).as("part")))),
          x => x.getField("part")), ", ").as("shown"),
        max(col("n_ext")).as("n_ext"), max(col("shown_sum")).as("shown_sum"))

    folders
      .join(sm, col("folder_path") === col("sm_path"), "left")
      .join(totals, Seq("folder_path"), "left")
      .join(summaries, Seq("folder_path"), "left")
      .withColumn("is_submodule", col("repo_name").isNotNull)
      .withColumn("total_files", coalesce(col("total_files"), lit(0L)))
      .withColumn("n_direct_files", coalesce(col("n_direct_files"), lit(0L)))
      .withColumn("name",
        when(col("folder_path") === ".", lit("."))
          .otherwise(element_at(split(col("folder_path"), "/"), -1)))
      .withColumn("ext_summary",
        when(col("total_files") === 0, lit("(empty)"))
          .otherwise(concat(lit("("), col("total_files"), lit(" files: "), col("shown"),
            when(col("n_ext") > 4 && col("total_files") > col("shown_sum"),
              concat(lit(", "), col("total_files") - col("shown_sum"), lit(" other")))
              .otherwise(lit("")),
            lit(")"))))
      .select(col("folder_path"), col("name"), col("depth"), col("is_submodule"),
        col("repo_name"), col("n_direct_files"), col("total_files"), col("ext_summary"))
  }

  /** list_tree: the tree table over a derived tracked-file corpus —
    * three top dirs, optional mod/sub levels (some files at every
    * depth), a null-extension slice (→ `other`), and three live
    * submodules plus one no file ever touches (absent from the tree,
    * tree.rs node-creation rule). */
  def listTree(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val seg1 = element_at(array(lit("src"), lit("lib"), lit("docs")),
      (pmod(col("doc_id"), lit(3)) + 1).cast("int"))
    val seg2 = when(pmod(col("doc_id"), lit(4)) =!= 3,
      concat(lit("mod"), pmod(col("doc_id"), lit(5))))
    val seg3 = when(pmod(col("doc_id"), lit(8)) < 2,
      concat(lit("sub"), pmod(col("doc_id"), lit(2))))
    val ext = when(pmod(col("doc_id"), lit(4)) === 0, lit("rs"))
      .when(pmod(col("doc_id"), lit(4)) === 1, lit("py"))
      .when(pmod(col("doc_id"), lit(4)) === 2, lit("md"))
    val files = d.select(col("doc_id"),
      concat_ws("/",
        seg1, seg2, when(seg2.isNotNull, seg3),
        concat(lit("f"), col("doc_id"),
          when(ext.isNotNull, concat(lit("."), ext)).otherwise(lit(""))))
        .as("relative_path"),
      ext.as("extension"), col("doc_id").as("input_idx"))
    import spark.implicits._
    val submodules = Seq(
      ("lib/mod1", "repo-a"), ("src/mod2", "repo-b"),
      ("docs/mod3/sub1", "repo-c"), ("ghost/path", "repo-x"))
      .toDF("sm_path", "repo_name")
    treeOf(files, submodules).orderBy(col("folder_path"))
  }
}
