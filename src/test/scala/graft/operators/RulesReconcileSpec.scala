package graft.operators

import graft.SparkSpec

/** Parity with rules_rebuild.rs: label dedup keeps the newest point,
  * content dedup across labels loses both the store point and the
  * mirror row, the deduped-state cascade, the bidirectional sync arms,
  * and the enqueue idempotency key scheme.
  */
class RulesReconcileSpec extends SparkSpec {

  import spark.implicits._

  private def points(rows: (String, String, String, String, String, String)*) =
    rows.toDF("point_id", "label", "content", "scope", "tenant", "updated_at")

  private def mirror(rows: (String, String, String, String)*) =
    rows.toDF("rule_id", "rule_text", "scope", "tenant_id")

  private def run(p: org.apache.spark.sql.DataFrame,
                  m: org.apache.spark.sql.DataFrame) =
    RulesReconcile.rulesReconcileOf(p, m).collect()
      .map(r => (r.getAs[String]("action"), r.getAs[String]("label"),
        r.getAs[String]("point_id"), r.getAs[String]("payload")))

  test("label dedup keeps the newest updated_at; older points delete") {
    val out = run(
      points(
        ("p1", "r1", "old", null, null, "2024-01-01T00:00:00Z"),
        ("p2", "r1", "new", null, null, "2024-01-02T00:00:00Z")),
      mirror(("r1", "new", null, null)))
    assert(out.contains(("delete_point", "r1", "p1", null)))
    assert(!out.exists(t => t._1 == "delete_point" && t._3 == "p2"))
    // winner content equals mirror → no update/insert/enqueue
    assert(out.count(_._1 != "delete_point") == 0)
  }

  test("content dup across labels: lex-min label kept, loser loses point AND mirror row") {
    val out = run(
      points(
        ("p1", "rA", "same", null, null, "2024-01-01T00:00:00Z"),
        ("p2", "rB", "same", null, null, "2024-01-01T00:00:00Z")),
      mirror(("rA", "same", null, null), ("rB", "same", null, null)))
    assert(out.contains(("delete_point", "rB", "p2", null)))
    assert(out.contains(("delete_mirror", "rB", null, null)))
    assert(!out.exists(t => t._1 == "delete_point" && t._2 == "rA"))
    // rB dropped from deduped state → its (pre-delete) mirror row enqueues
    assert(out.exists(t => t._1 == "enqueue" && t._2 == "rB"))
  }

  test("sync arms: store-only inserts, drifted content updates, mirror-only enqueues") {
    val out = run(
      points(
        ("p1", "rIns", "c1", null, "t1", "2024-01-01T00:00:00Z"),
        ("p2", "rUpd", "cNew", null, null, "2024-01-01T00:00:00Z")),
      mirror(("rUpd", "cOld", null, null), ("rEnq", "cM", null, null)))
    assert(out.contains(("insert_mirror", "rIns", null, "c1")))
    assert(out.contains(("update_mirror", "rUpd", null, "cNew")))
    assert(out.exists(t => t._1 == "enqueue" && t._2 == "rEnq"))
  }

  test("enqueue idempotency key: sha256('text|add|tid|rules|payload')[..32], global fallback") {
    val out = run(
      points(("p1", "rX", "c", null, null, "2024-01-01T00:00:00Z")),
      mirror(("rEnq", "body", "proj", null)))
    val key = out.find(t => t._1 == "enqueue" && t._2 == "rEnq").get._4
    val payload = """{"content":"body","label":"rEnq","scope":"proj"}"""
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"text|add|global|rules|$payload".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(key == hex.take(32))
    // null scope serializes as a JSON null, not the string "null" quoted
    val out2 = run(
      points(("p1", "rX", "c", null, null, "2024-01-01T00:00:00Z")),
      mirror(("rEnq", "body", null, "t9")))
    val key2 = out2.find(t => t._1 == "enqueue" && t._2 == "rEnq").get._4
    val payload2 = """{"content":"body","label":"rEnq","scope":null}"""
    val hex2 = md.digest(s"text|add|t9|rules|$payload2".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(key2 == hex2.take(32))
  }

  test("unlabeled points are skipped, never deleted or reconciled") {
    val out = run(
      points(
        ("p1", null, "c", null, null, "2024-01-01T00:00:00Z"),
        ("p2", "", "c", null, null, "2024-01-01T00:00:00Z")),
      mirror())
    assert(out.count(_._1 == "skip_unlabeled") == 2)
    assert(out.forall(t => t._1 == "skip_unlabeled"))
  }

  test("corpus query keeps all six action arms live") {
    val acts = RulesReconcile.rulesReconcile(spark, sfDir)
      .collect().map(_.getAs[String]("action")).toSet
    assert(acts == Set("delete_point", "delete_mirror", "insert_mirror",
      "update_mirror", "enqueue", "skip_unlabeled"))
  }
}
