package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Parent-unit records + chunk→parent assignment + parent-context
  * expansion (daemon parent_unit/{types,code_parents}.rs, client
  * flow_collect.rs:307 expand_parent_context).
  *
  * Parent records store full structural units (code files, container
  * blocks) without vectors; chunks reference their nearest parent via
  * `parent_unit_id`, and search results expand that id into a
  * ParentContext. Faithful semantics:
  *  - `parent_point_id` (types.rs:130) is UUID v5 in the URL namespace
  *    over `parent:{doc_id}:{unit_type}:{locator}`, hex without
  *    dashes; the locator renders as serde_json's compact Display with
  *    BTreeMap-SORTED keys. Ported as a codegen'd sha1 over the
  *    namespace bytes ++ name with the version/variant nibbles patched
  *    (translate on nibble 17) — bit-identical to uuid::Uuid::new_v5
  *    (known-answer vectors in ParentUnitsSpec). DuckDB has no sha1,
  *    so point ids stay OUT of the oracle-gated outputs; the oracle
  *    pins the mapping through the equivalent (doc, unit_type,
  *    locator) identity instead (the id is a bijection of it).
  *  - `unit_hash` = sha256 hex (types.rs:121, DuckDB-checkable),
  *    `unit_char_len` = Rust `str::len()` = BYTES (octet_length).
  *  - `create_code_parents` (code_parents.rs:48): every CONTAINER
  *    chunk (class/struct/trait/interface/impl/module/enum) becomes a
  *    block parent; the name→id index takes the LAST container of a
  *    name (HashMap insert order — the struct-then-impl shadowing of
  *    test_create_code_parents_with_impl_block); a chunk maps to its
  *    `parent_symbol`'s block when one resolves, else to the file
  *    parent — containers themselves always map to the file parent.
  *
  * Relational shape: the chunk axis is corpus-sized; parents are a
  * projection + one groupBy-free window (last-wins rank per (doc,
  * name)); the mapping is a per-doc key-equality left join (shuffle ∝
  * chunks); the context expansion is the same join read back. No
  * driver-side anything; scales linearly in chunk count.
  */
object ParentUnits {

  val ContainerTypes = Seq("class", "struct", "trait", "interface", "impl",
    "module", "enum")

  /** uuid::Uuid::new_v5(NAMESPACE_URL, name).simple() as a column:
    * sha1(ns ++ name), version nibble → '5', variant nibble → IETF via
    * nibble translate, first 32 hex chars. */
  def uuid5Hex(name: Column): Column = {
    val ns = lit("6ba7b8119dad11d180b400c04fd430c8") // uuid::NAMESPACE_URL
    val h = sha1(concat(to_binary(ns, lit("hex")), encode(name, "UTF-8")))
    concat(substring(h, 1, 12), lit("5"), substring(h, 14, 3),
      translate(substring(h, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"),
      substring(h, 18, 15))
  }

  /** serde_json compact Display of the code_file locator. */
  def fileLocator(filePath: Column): Column =
    concat(lit("{\"file_path\":\""), filePath, lit("\"}"))

  /** serde_json compact Display of the code_block locator —
    * BTreeMap-sorted keys (block_kind, block_name, end_line,
    * file_path, start_line). */
  def blockLocator(filePath: Column, name: Column, kind: Column,
                   startLine: Column, endLine: Column): Column =
    concat(lit("{\"block_kind\":\""), kind,
      lit("\",\"block_name\":\""), name,
      lit("\",\"end_line\":"), endLine,
      lit(",\"file_path\":\""), filePath,
      lit("\",\"start_line\":"), startLine, lit("}"))

  /** The deterministic corpus chunk axis: per document a code-file of
    * semantic chunks over `source`-derived paths — a struct/impl pair
    * sharing a name (the last-wins shadow), a method under it, a
    * top-level function, an unresolvable `parent_symbol` (doc_id%2=0),
    * and a second container + method (doc_id%3=0). Content = 15-char
    * text slices. */
  def chunkAxis(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        concat(col("source"), lit("/f"), pmod(col("doc_id"), lit(7)), lit(".py"))
          .as("file_path"))
    val s = concat(lit("S"), col("doc_id"))
    val k = concat(lit("K"), col("doc_id"))
    val nullS = lit(null).cast("string")
    def chunk(idx: Int, tpe: String, name: Column, parent: Column,
              a: Int, b: Int, live: Column): Column =
      struct(lit(idx).as("idx"), lit(tpe).as("chunk_type"), name.as("symbol_name"),
        parent.as("parent_symbol"), lit(a).as("start_line"), lit(b).as("end_line"),
        live.as("live"))
    val rows = array(
      chunk(0, "struct", s, nullS, 1, 5, lit(true)),
      chunk(1, "impl", s, nullS, 7, 30, lit(true)),
      chunk(2, "method", lit("new"), s, 8, 15, lit(true)),
      chunk(3, "function", lit("helper"), nullS, 32, 35, lit(true)),
      chunk(4, "method", lit("gone"), lit("Missing"), 37, 39,
        pmod(col("doc_id"), lit(2)) === 0),
      chunk(5, "class", k, nullS, 41, 50, pmod(col("doc_id"), lit(3)) === 0),
      chunk(6, "method", lit("run"), k, 42, 48, pmod(col("doc_id"), lit(3)) === 0))
    d.select(col("doc_id"), col("text"), col("file_path"), explode(rows).as("c"))
      .filter(col("c.live"))
      .select(col("doc_id"), col("file_path"),
        col("c.idx").as("idx"), col("c.chunk_type").as("chunk_type"),
        col("c.symbol_name").as("symbol_name"),
        col("c.parent_symbol").as("parent_symbol"),
        col("c.start_line").as("start_line"), col("c.end_line").as("end_line"),
        col("text").substr(col("c.idx") * 15 + 1, lit(15)).as("content"),
        col("text"))
  }

  /** All parent records (file + block) with locators, hashes, and
    * point ids. */
  def parentRecordsOf(chunks: DataFrame): DataFrame = {
    val files = chunks.select(col("doc_id"), col("file_path"), col("text")).distinct()
      .select(col("doc_id"), lit("code_file").as("unit_type"), col("file_path"),
        lit(null).cast("string").as("block_name"),
        lit(null).cast("string").as("block_kind"),
        lit(null).cast("int").as("start_line"), lit(null).cast("int").as("end_line"),
        fileLocator(col("file_path")).as("locator"), col("text").as("unit_text"))
    val blocks = chunks.filter(col("chunk_type").isin(ContainerTypes: _*))
      .select(col("doc_id"), lit("code_block").as("unit_type"), col("file_path"),
        col("symbol_name").as("block_name"), col("chunk_type").as("block_kind"),
        col("start_line"), col("end_line"),
        blockLocator(col("file_path"), col("symbol_name"), col("chunk_type"),
          col("start_line"), col("end_line")).as("locator"),
        col("content").as("unit_text"))
    files.unionAll(blocks)
      .withColumn("unit_char_len", octet_length(col("unit_text")).cast("long"))
      .withColumn("unit_hash", sha2(col("unit_text"), 256))
      .withColumn("point_id", uuid5Hex(concat(lit("parent:"), col("doc_id"),
        lit(":"), col("unit_type"), lit(":"), col("locator"))))
  }

  /** create_code_parents' chunk→parent assignment: resolve
    * parent_symbol against the LAST same-named container, else the
    * file parent. Returns the chunk axis + parent record columns. */
  def chunkParentsOf(chunks: DataFrame): DataFrame = {
    val lastWins = Window.partitionBy(col("doc_id"), col("symbol_name"))
      .orderBy(col("idx").desc)
    val blockIndex = chunks.filter(col("chunk_type").isin(ContainerTypes: _*))
      .withColumn("rn", row_number().over(lastWins))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("symbol_name").as("parent_symbol"),
        lit("code_block").as("b_unit_type"),
        blockLocator(col("file_path"), col("symbol_name"), col("chunk_type"),
          col("start_line"), col("end_line")).as("b_locator"),
        octet_length(col("content")).cast("long").as("b_len"),
        sha2(col("content"), 256).as("b_hash"))
      .withColumn("b_point_id", uuid5Hex(concat(lit("parent:"), col("doc_id"),
        lit(":"), col("b_unit_type"), lit(":"), col("b_locator"))))
    val fileRecs = chunks.select(col("doc_id"), col("file_path"), col("text")).distinct()
      .select(col("doc_id"), lit("code_file").as("f_unit_type"),
        fileLocator(col("file_path")).as("f_locator"),
        octet_length(col("text")).cast("long").as("f_len"),
        sha2(col("text"), 256).as("f_hash"))
      .withColumn("f_point_id", uuid5Hex(concat(lit("parent:"), col("doc_id"),
        lit(":"), col("f_unit_type"), lit(":"), col("f_locator"))))
    chunks
      .join(blockIndex, Seq("doc_id", "parent_symbol"), "left")
      .join(fileRecs, Seq("doc_id"))
      .withColumn("parent_unit_type",
        coalesce(col("b_unit_type"), col("f_unit_type")))
      .withColumn("parent_locator", coalesce(col("b_locator"), col("f_locator")))
      .withColumn("parent_char_len", coalesce(col("b_len"), col("f_len")))
      .withColumn("parent_hash", coalesce(col("b_hash"), col("f_hash")))
      .withColumn("parent_point_id", coalesce(col("b_point_id"), col("f_point_id")))
  }

  /** parent_units: every parent record (oracle identity = locator;
    * point ids spec-pinned — see scaladoc). */
  def parentUnits(spark: SparkSession, dir: String): DataFrame =
    parentRecordsOf(chunkAxis(spark, dir))
      .select(col("doc_id"), col("unit_type"), col("file_path"),
        col("block_name"), col("block_kind"), col("start_line"), col("end_line"),
        col("locator"), col("unit_char_len"), col("unit_hash"))
      .orderBy(col("doc_id"), col("unit_type"), col("locator"))

  /** parent_context: expand_parent_context over every chunk — the
    * ParentContext payload its parent_unit_id retrieves. */
  def parentContext(spark: SparkSession, dir: String): DataFrame =
    chunkParentsOf(chunkAxis(spark, dir))
      .select(col("doc_id"), col("idx"), col("chunk_type"), col("symbol_name"),
        col("parent_unit_type"), col("parent_locator"),
        col("parent_char_len"), col("parent_hash"))
      .orderBy(col("doc_id"), col("idx"))
}
