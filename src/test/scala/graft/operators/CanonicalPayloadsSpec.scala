package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with canonicalize/tests.rs (the AC-CANON golden vectors)
  * plus corpus arm checks. */
class CanonicalPayloadsSpec extends SparkSpec {

  import CanonicalPayloads._

  test("store payload with empty metadata matches the TS golden (AC-CANON1a)") {
    assert(buildStorePayload("Hello world documentation",
      "deadbeef00112233445566778899aabb", "user_input", Seq.empty,
      "my-library") ==
      """{"content":"Hello world documentation","document_id":"deadbeef00112233445566778899aabb","library_name":"my-library","metadata":{},"source_type":"user_input"}""")
  }

  test("astral metadata keys sort by UTF-16 code units — surrogates after BMP (AC-CANON1b)") {
    val meta = Seq(
      "source_type" -> "web",
      "𐀀linear" -> "astral-a", // U+10000
      "😀emoji" -> "astral-b", // U+1F600
      "snowman☃" -> "bmp",
      "alpha" -> "first")
    val got = buildStorePayload("Library content with unicode",
      "aabb001122334455deadbeef00001111", "web", meta, "unicode-lib")
    assert(got ==
      "{\"content\":\"Library content with unicode\",\"document_id\":\"aabb001122334455deadbeef00001111\",\"library_name\":\"unicode-lib\",\"metadata\":{\"alpha\":\"first\",\"snowman☃\":\"bmp\",\"source_type\":\"web\",\"𐀀linear\":\"astral-a\",\"😀emoji\":\"astral-b\"},\"source_type\":\"web\"}")
  }

  test("priority:0 and the empty tags array are INCLUDED (AC-CANON1c)") {
    assert(buildRulePayload("add", "prefer-uv",
      Some("Always use uv for Python dependency management"), Some("global"),
      None, Some("Prefer uv"), Some(Seq.empty), Some(0L)) ==
      """{"action":"add","content":"Always use uv for Python dependency management","label":"prefer-uv","priority":0,"scope":"global","source_type":"rule","tags":[],"title":"Prefer uv"}""")
  }

  test("project scope with tags (AC-CANON1d); update with priority (AC-CANON1f); minimal remove (AC-CANON1g)") {
    assert(buildRulePayload("add", "prefer-bun", Some("Use bun instead of npm"),
      Some("project"), Some("proj_abc123"), Some("Prefer bun"),
      Some(Seq("tooling", "workflow")), Some(5L)) ==
      """{"action":"add","content":"Use bun instead of npm","label":"prefer-bun","priority":5,"project_id":"proj_abc123","scope":"project","source_type":"rule","tags":["tooling","workflow"],"title":"Prefer bun"}""")
    assert(buildRulePayload("update", "prefer-uv",
      Some("Updated: always use uv for Python"), Some("global"), None, None,
      None, Some(8L)) ==
      """{"action":"update","content":"Updated: always use uv for Python","label":"prefer-uv","priority":8,"scope":"global","source_type":"rule"}""")
    assert(buildRulePayload("remove", "old-rule", None, None, None, None,
      None, None) ==
      """{"action":"remove","label":"old-rule","source_type":"rule"}""")
  }

  test("empty-string title is DROPPED — JS truthiness, unlike the undefined checks (AC-CANON1e)") {
    assert(buildRulePayload("add", "no-stubs",
      Some("Never use stubs or placeholder code"), Some("global"), None,
      Some(""), None, None) ==
      """{"action":"add","content":"Never use stubs or placeholder code","label":"no-stubs","scope":"global","source_type":"rule"}""")
  }

  test("integers render without .0; escaping matches JSON.stringify (AC-CANON2 + escape rules)") {
    assert(stableStringify(JLong(0)) == "0")
    assert(stableStringify(JLong(-3)) == "-3")
    assert(stableStringify(JObj(Seq("n" -> JLong(42)))) == """{"n":42}""")
    // JSON.stringify escaping: `/` NOT escaped, C0 controls \uXXXX.
    assert(stableStringify(JStr("a/b")) == "\"a/b\"")
    assert(stableStringify(JStr("q\"w\\e\n\r\t\b\f" + 1.toChar)) ==
      "\"q\\\"w\\\\e\\n\\r\\t\\b\\f\\u0001\"")
    // Arrays preserve order; nested objects sort.
    assert(stableStringify(JArr(Seq(JLong(2), JLong(1)))) == "[2,1]")
    assert(stableStringify(JObj(Seq("b" -> JObj(Seq("z" -> JNull,
      "a" -> JBool(true)))))) == """{"b":{"a":true,"z":null}}""")
  }

  test("corpus: every truthiness arm live; keys are 32 lowercase hex") {
    val rows = canonicalPayloads(spark, sfDir).collect()
    val payloads = rows.map(_.getAs[String]("payload_json"))
    assert(payloads.exists(_.contains("\"tags\":[]")))
    assert(payloads.exists(_.contains("\"tags\":[\"tooling\"")))
    assert(payloads.exists(_.contains("\"priority\":0")))
    assert(payloads.exists(p => !p.contains("\"content\"")))
    assert(payloads.exists(_.contains("\\\"hi\\\"")))
    assert(payloads.exists(_.contains("\\n")))
    assert(payloads.exists(_.contains("\"metadata\":{}")))
    assert(rows.forall(_.getAs[String]("idempotency_key")
      .matches("^[0-9a-f]{32}$")))
    // Same inputs → same key (the idempotency contract).
    val byPayload = rows.groupBy(r => (r.getAs[String]("tenant_id"),
      r.getAs[String]("kind"), r.getAs[String]("payload_json")))
    byPayload.values.foreach(v =>
      assert(v.map(_.getAs[String]("idempotency_key")).distinct.length == 1))
  }
}
