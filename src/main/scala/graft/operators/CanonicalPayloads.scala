package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The MCP server's canonical queue-payload layer (mcp-server/src/
  * canonicalize/{stable_stringify,payload_builders}.rs — themselves
  * byte-parity ports of the TS `stableStringify` in
  * queue-operations.ts:36):
  *
  *  - stable_stringify: no whitespace; arrays order-preserved; object
  *    keys sorted by UTF-16 CODE UNIT sequence (JS Array.sort — astral
  *    keys sort by surrogate values, AFTER all BMP keys); integers
  *    without `.0`; JSON.stringify escaping (`/` NOT escaped,
  *    C0 controls as `\uXXXX`).
  *  - build_rule_payload: action/label/source_type always; content/
  *    scope/project_id/title under JS TRUTHINESS (empty string drops);
  *    tags whenever Some — `[]` is truthy in JS, so the EMPTY array is
  *    included; priority whenever present — `0` included (the
  *    `!== undefined` check, not truthiness).
  *  - build_store_payload: the five store fields with `metadata`
  *    ALWAYS present (even `{}`).
  *  - generate_idempotency_key (common/hashing.rs:26):
  *    sha256(`{type}|{op}|{tenant}|{collection}|{payload}`)[..16
  *    bytes] hex.
  *
  * The serializer is a recursive canonicalization with UTF-16 key
  * ordering — not expressible in builtin column functions — so it runs
  * as a scalar UDF over the payload columns (map-side, no shuffle; the
  * deep semantics — astral sort, control escapes, nesting — are
  * KAT-pinned in CanonicalPayloadsSpec against the reference's
  * AC-CANON vectors). The corpus axis keeps keys ASCII and flat so the
  * DuckDB oracle reconstructs the same bytes relationally.
  */
object CanonicalPayloads {

  // ── a tiny JSON AST (serde_json::Value stand-in) ──────────────────
  sealed trait JValue
  case object JNull extends JValue
  final case class JBool(b: Boolean) extends JValue
  final case class JLong(n: Long) extends JValue
  final case class JDouble(d: Double) extends JValue
  final case class JStr(s: String) extends JValue
  final case class JArr(items: Seq[JValue]) extends JValue
  final case class JObj(fields: Seq[(String, JValue)]) extends JValue

  /** compare_keys_utf16 (stable_stringify.rs:23). */
  def compareKeysUtf16(a: String, b: String): Int = {
    // Java String is UTF-16 internally; compareTo IS code-unit order.
    a.compareTo(b)
  }

  /** json_escape_string (stable_stringify.rs:129). */
  def jsonEscape(s: String): String = {
    val out = new StringBuilder("\"")
    s.foreach {
      case '"' => out.append("\\\"")
      case '\\' => out.append("\\\\")
      case '\n' => out.append("\\n")
      case '\r' => out.append("\\r")
      case '\t' => out.append("\\t")
      case '\b' => out.append("\\b")
      case '\f' => out.append("\\f")
      case c if c < 0x20 => out.append(f"\\u${c.toInt}%04x")
      case c => out.append(c)
    }
    out.append("\"").toString
  }

  /** stable_stringify (stable_stringify.rs:42). */
  def stableStringify(v: JValue): String = v match {
    case JNull => "null"
    case JBool(b) => b.toString
    case JLong(n) => n.toString
    case JDouble(d) =>
      // The float fallback (serde Display) — documented divergence
      // hazard in the reference; unreachable on the write path.
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
        d.toLong.toString
      else d.toString
    case JStr(s) => jsonEscape(s)
    case JArr(items) => items.map(stableStringify).mkString("[", ",", "]")
    case JObj(fields) =>
      fields.sortWith((a, b) => compareKeysUtf16(a._1, b._1) < 0)
        .map { case (k, value) => jsonEscape(k) + ":" + stableStringify(value) }
        .mkString("{", ",", "}")
  }

  /** build_rule_payload (payload_builders.rs:66). */
  def buildRulePayload(action: String, label: String, content: Option[String],
                       scope: Option[String], projectId: Option[String],
                       title: Option[String], tags: Option[Seq[String]],
                       priority: Option[Long]): String = {
    var fields = Seq[(String, JValue)](
      "action" -> JStr(action), "label" -> JStr(label),
      "source_type" -> JStr("rule"))
    def truthy(k: String, v: Option[String]): Unit =
      v.filter(_.nonEmpty).foreach(s => fields :+= (k -> JStr(s)))
    truthy("content", content)
    truthy("scope", scope)
    truthy("project_id", projectId)
    truthy("title", title)
    tags.foreach(t => fields :+= ("tags" -> JArr(t.map(JStr))))
    priority.foreach(p => fields :+= ("priority" -> JLong(p)))
    stableStringify(JObj(fields))
  }

  /** build_store_payload (payload_builders.rs:142). */
  def buildStorePayload(content: String, documentId: String,
                        sourceType: String, metadata: Seq[(String, String)],
                        libraryName: String): String =
    stableStringify(JObj(Seq(
      "content" -> JStr(content), "document_id" -> JStr(documentId),
      "library_name" -> JStr(libraryName),
      "metadata" -> JObj(metadata.map { case (k, v) => k -> JStr(v) }),
      "source_type" -> JStr(sourceType))))

  /** §3 `*Of` form: rule + store payload rows → canonical JSON + the
    * 32-hex idempotency key. The UDFs are pure scalar maps. */
  def canonicalPayloadsOf(rules: DataFrame, stores: DataFrame): DataFrame = {
    val ruleUdf = udf((action: String, label: String, content: String,
                       scope: String, projectId: String, title: String,
                       tags: Seq[String], priority: java.lang.Long) =>
      buildRulePayload(action, label, Option(content), Option(scope),
        Option(projectId), Option(title), Option(tags),
        Option(priority).map(_.longValue)))
    val storeUdf = udf((content: String, documentId: String,
                        sourceType: String, metaKeys: Seq[String],
                        metaVals: Seq[String], libraryName: String) =>
      buildStorePayload(content, documentId, sourceType,
        metaKeys.zip(metaVals), libraryName))

    val ruleRows = rules.select(lit("rule").as("kind"), col("id"),
        col("tenant_id"),
        ruleUdf(col("action"), col("label"), col("content"), col("scope"),
          col("project_id"), col("title"), col("tags"), col("priority"))
          .as("payload_json"))
      .withColumn("idempotency_key",
        substring(sha2(concat_ws("|", lit("text"), lit("add"),
          col("tenant_id"), lit("rules"), col("payload_json")), 256), 1, 32))
    val storeRows = stores.select(lit("store").as("kind"), col("id"),
        col("tenant_id"),
        storeUdf(col("content"), col("document_id"), col("source_type"),
          col("meta_keys"), col("meta_vals"), col("library_name"))
          .as("payload_json"))
      .withColumn("idempotency_key",
        substring(sha2(concat_ws("|", lit("text"), lit("add"),
          col("tenant_id"), lit("libraries"), col("payload_json")), 256),
          1, 32))
    ruleRows.select(col("kind"), col("id"), col("tenant_id"),
        col("payload_json"), col("idempotency_key"))
      .unionByName(storeRows.select(col("kind"), col("id"), col("tenant_id"),
        col("payload_json"), col("idempotency_key")))
      .orderBy(col("kind"), col("id"))
  }

  /** The corpus axes: rule inputs cycling every truthiness arm and an
    * escape-needing content slice; store inputs cycling metadata
    * shapes. ASCII + flat so the oracle rebuilds the bytes. */
  def canonicalPayloads(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"),
      col("source").as("tenant_id"))
    val m = pmod(col("doc_id"), lit(6))
    val rules = d.select(col("doc_id").as("id"), col("tenant_id"),
      element_at(array(lit("add"), lit("update"), lit("remove")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("action"),
      concat(lit("rule-"), pmod(col("doc_id"), lit(50))).as("label"),
      when(m === 0, lit(null).cast("string"))
        .when(m === 1, lit(""))
        .when(m === 2, concat(lit("say \"hi\" to "), col("tenant_id")))
        .when(m === 3, concat(lit("line1\nline2 \\ "), pmod(col("doc_id"), lit(9))))
        .otherwise(concat(lit("plain content "), pmod(col("doc_id"), lit(40))))
        .as("content"),
      when(pmod(col("doc_id"), lit(4)) === 0, lit(""))
        .when(pmod(col("doc_id"), lit(4)) === 1, lit("project"))
        .otherwise(lit("global")).as("scope"),
      when(pmod(col("doc_id"), lit(4)) === 1, col("tenant_id"))
        .otherwise(lit(null).cast("string")).as("project_id"),
      when(pmod(col("doc_id"), lit(5)) === 0, lit(""))
        .when(pmod(col("doc_id"), lit(5)) === 1,
          concat(lit("Title "), pmod(col("doc_id"), lit(7))))
        .otherwise(lit(null).cast("string")).as("title"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        array().cast("array<string>"))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          array(lit("tooling"), concat(lit("w"), pmod(col("doc_id"), lit(4)))))
        .otherwise(lit(null).cast("array<string>")).as("tags"),
      when(pmod(col("doc_id"), lit(7)) === 0, lit(0L))
        .when(pmod(col("doc_id"), lit(7)) === 1, pmod(col("doc_id"), lit(10)))
        .otherwise(lit(null).cast("long")).as("priority"))
    val stores = d.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id").as("id"), col("tenant_id"),
        concat(lit("content \"q\" "), pmod(col("doc_id"), lit(20)))
          .as("content"),
        lpad(pmod(col("doc_id"), lit(997)).cast("string"), 8, "0")
          .as("document_id"),
        lit("user_input").as("source_type"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          array().cast("array<string>"))
          .otherwise(array(lit("zeta"), lit("alpha"))).as("meta_keys"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          array().cast("array<string>"))
          .otherwise(array(lit("zv"), lit("av"))).as("meta_vals"),
        concat(lit("lib-"), pmod(col("doc_id"), lit(5))).as("library_name"))
    canonicalPayloadsOf(rules, stores)
  }
}
