package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ParentUnits._

/** Reference vectors from parent_unit/mod.rs tests + uuid-crate
  * known-answer vectors for the UUIDv5 port. */
class ParentUnitsSpec extends SparkSpec {

  /** (idx, chunk_type, symbol, parent_symbol, start, end, content) */
  private def chunks(doc: Long, rows: Seq[(Int, String, String, Option[String], Int, Int, String)]): DataFrame = {
    import spark.implicits._
    rows.map(r => (doc, "f.rs", r._1, r._2, r._3, r._4, r._5, r._6, r._7, "full file text"))
      .toDF("doc_id", "file_path", "idx", "chunk_type", "symbol_name",
        "parent_symbol", "start_line", "end_line", "content", "text")
  }

  private def parentsOf(df: DataFrame): Map[Int, (String, String)] =
    chunkParentsOf(df).collect()
      .map(r => r.getAs[Int]("idx") ->
        (r.getAs[String]("parent_unit_type"), r.getAs[String]("parent_point_id")))
      .toMap

  test("uuid v5 known answers (uuid::Uuid::new_v5, NAMESPACE_URL)") {
    import spark.implicits._
    val out = Seq(
      "parent:doc-1:pdf_page:{\"page\":1}",
      "parent:doc-1:code_file:{\"file_path\":\"src/main.rs\"}",
      "parent:d:code_block:{\"block_kind\":\"class\",\"block_name\":\"Foo\",\"end_line\":10,\"file_path\":\"f.rs\",\"start_line\":1}")
      .toDF("name").select(uuid5Hex(col("name"))).collect().map(_.getString(0))
    assert(out(0) == "68fac707398550bf94fe137cb0984641")
    assert(out(1) == "40b119c76fe05f839404d13e35aa92ac")
    assert(out(2) == "9c855709c38c5e10860f26a69d201cd3")
    assert(out.forall(_.length == 32), "UUID hex without dashes (test_parent_point_id_deterministic)")
  }

  test("point ids unique across locators and unit types (test_parent_point_id_unique_*)") {
    import spark.implicits._
    val ids = Seq(
      "parent:doc-1:pdf_page:{\"page\":1}",
      "parent:doc-1:pdf_page:{\"page\":2}",
      "parent:doc-1:epub_section:{\"page\":1}")
      .toDF("name").select(uuid5Hex(col("name"))).collect().map(_.getString(0))
    assert(ids.distinct.length == 3)
  }

  test("file-only chunks all map to the file parent (test_create_code_parents_file_only)") {
    val df = chunks(1L, Seq(
      (0, "function", "foo", None, 1, 3, "fn foo() {}"),
      (1, "function", "bar", None, 5, 8, "fn bar() {}")))
    val p = parentsOf(df)
    assert(p(0)._1 == "code_file" && p(1)._1 == "code_file")
    assert(p(0)._2 == p(1)._2)
    assert(parentRecordsOf(df).filter(col("unit_type") === "code_block").count() == 0)
  }

  test("methods map to their class block; the class and top-level fn map to the file (test_create_code_parents_with_class)") {
    val df = chunks(1L, Seq(
      (0, "class", "MyClass", None, 1, 20, "class MyClass { ... }"),
      (1, "method", "process", Some("MyClass"), 3, 8, "def process"),
      (2, "method", "validate", Some("MyClass"), 10, 15, "def validate"),
      (3, "function", "helper", None, 22, 25, "def helper")))
    val p = parentsOf(df)
    assert(p(0)._1 == "code_file", "the container itself references the file")
    assert(p(1)._1 == "code_block" && p(2)._1 == "code_block")
    assert(p(1)._2 == p(2)._2)
    assert(p(3)._1 == "code_file" && p(3)._2 == p(0)._2)
  }

  test("struct/impl name collision: LAST container wins the mapping, both records exist (test_create_code_parents_with_impl_block)") {
    val df = chunks(1L, Seq(
      (0, "struct", "Config", None, 1, 5, "struct Config {}"),
      (1, "impl", "Config", None, 7, 30, "impl Config { ... }"),
      (2, "method", "new", Some("Config"), 8, 15, "fn new"),
      (3, "method", "validate", Some("Config"), 17, 25, "fn validate")))
    assert(parentRecordsOf(df).filter(col("unit_type") === "code_block").count() == 2)
    val p = parentsOf(df)
    assert(p(2)._2 == p(3)._2 && p(2)._1 == "code_block")
    // the winning block is the impl (idx 1), not the struct
    val implId = chunkParentsOf(df).filter(col("idx") === 2)
      .select(col("parent_locator")).collect().head.getString(0)
    assert(implId.contains("\"block_kind\":\"impl\""))
    assert(p(2)._2 != p(0)._2)
  }

  test("multiple classes keep distinct block parents (test_create_code_parents_multiple_classes)") {
    val df = chunks(1L, Seq(
      (0, "class", "Foo", None, 1, 10, "class Foo"),
      (1, "method", "run", Some("Foo"), 3, 8, "def run"),
      (2, "class", "Bar", None, 12, 20, "class Bar"),
      (3, "method", "start", Some("Bar"), 14, 18, "def start")))
    val p = parentsOf(df)
    assert(p(1)._2 != p(3)._2)
    assert(p(0)._2 == p(2)._2 && p(0)._1 == "code_file")
  }

  test("container set (test_is_container_type)") {
    assert(ContainerTypes.toSet ==
      Set("class", "struct", "trait", "interface", "impl", "module", "enum"))
    assert(!ContainerTypes.contains("function") && !ContainerTypes.contains("method"))
  }

  test("record fields: sha256 unit_hash, byte length, locator shape (test_pdf_page_parent_creation analogue)") {
    val df = chunks(1L, Seq((0, "class", "C", None, 1, 9, "Page five content here.")))
    val blk = parentRecordsOf(df).filter(col("unit_type") === "code_block").collect().head
    assert(blk.getAs[Long]("unit_char_len") == 23L)
    assert(blk.getAs[String]("unit_hash").length == 64)
    assert(blk.getAs[String]("locator") ==
      "{\"block_kind\":\"class\",\"block_name\":\"C\",\"end_line\":9,\"file_path\":\"f.rs\",\"start_line\":1}")
  }

  test("corpus: every chunk resolves, unresolvable parent_symbol falls to the file") {
    val out = chunkParentsOf(chunkAxis(spark, sfDir)).collect()
    assert(out.forall(_.getAs[String]("parent_point_id") != null))
    val gone = out.filter(_.getAs[String]("symbol_name") == "gone")
    assert(gone.nonEmpty && gone.forall(_.getAs[String]("parent_unit_type") == "code_file"))
    val news = out.filter(_.getAs[String]("symbol_name") == "new")
    assert(news.forall(r => r.getAs[String]("parent_locator").contains("\"block_kind\":\"impl\"")))
  }
}
