package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.FallbackSearch._

/** Reference vectors from flow_fallback.rs (M1/M2 F-001 rules) and the
  * TS fallbackSearch contract it mirrors. */
class FallbackSearchSpec extends SparkSpec {

  private def cands(rows: Seq[(Long, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "tenant_id", "content", "title", "collection")
      .withColumn("ord", col("doc_id"))
  }

  private val three = Seq("projects", "libraries", "scratchpad")

  test("project_id_is_unresolved: None, empty, whitespace (M2)") {
    assert(projectIdIsUnresolved(None))
    assert(projectIdIsUnresolved(Some("")))
    assert(projectIdIsUnresolved(Some("   ")))
    assert(!projectIdIsUnresolved(Some("proj-a")))
  }

  test("f001 refusal reason is byte-faithful (search-qdrant.ts:404)") {
    assert(f001RefusalReason(Seq("projects", "scratchpad")) ==
      "Daemon unavailable and project scope unresolved - cannot run " +
        "cross-tenant fallback. Refused collections: projects, scratchpad")
  }

  test("unresolved project scope refuses EVERY collection (M1)") {
    val out = fallbackOf(cands(Seq((1L, "t1", "has vector", "n", "projects"))),
      three, "vector", "project", Some(" "))
    val rows = out.collect()
    assert(rows.length == 3 && rows.forall(_.getAs[String]("kind") == "refused"))
    assert(rows.forall(_.getAs[String]("status_reason").contains(
      "Refused collections: projects, libraries, scratchpad")))
  }

  test("group scope fails closed — refused, never scrolled") {
    val out = fallbackOf(cands(Seq((1L, "t1", "has vector", "n", "projects"))),
      three, "vector", "group", Some("t1"))
    assert(out.collect().forall(_.getAs[String]("kind") == "refused"))
  }

  test("resolved project scope: tenant-filtered substring scan at score parity") {
    val out = fallbackOf(cands(Seq(
      (1L, "t1", "has vector inside", "n", "projects"),
      (2L, "t2", "has vector inside", "n", "projects"),   // other tenant
      (3L, "t1", "no match here", "n", "projects"),
      (4L, "t1", "nothing", "Vector notes", "libraries"))), // title arm
      three, "vector", "project", Some("t1"))
    val rows = out.filter(col("kind") === "row").collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L))
    assert(rows.forall(_.getAs[String]("status_reason") == FallbackStatusReason))
  }

  test("case-insensitive match on content OR title") {
    val out = fallbackOf(cands(Seq(
      (1L, "t", "HAS VECTOR", "n", "projects"),
      (2L, "t", "nope", "my VeCtOr title", "projects"),
      (3L, "t", "nope", "nope", "projects"))),
      three, "Vector", "all", None)
    assert(out.filter(col("kind") === "row").collect()
      .map(_.getAs[Long]("doc_id")).toSet == Set(1L, 2L))
  }

  test("scroll cap precedes matching; global limit in collection order") {
    // 40 matching docs in one collection: scroll fetches limit*3=30,
    // match keeps 30, global take keeps limit=10 — doc order.
    val rows = (1L to 40L).map(i => (i, "t", "vector " + i, "n", "projects"))
    val out = fallbackOf(cands(rows), three, "vector", "all", None)
    val got = out.filter(col("kind") === "row").orderBy("rnk").collect()
    assert(got.length == 10)
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == (1L to 10L))
  }

  test("corpus: four scenarios, refusals and both match arms live") {
    val out = FallbackSearch.fallbackSearch(spark, sfDir).collect()
    val byScenario = out.groupBy(_.getAs[String]("scenario"))
    assert(byScenario("unresolved").forall(_.getAs[String]("kind") == "refused"))
    assert(byScenario("group").forall(_.getAs[String]("kind") == "refused"))
    assert(byScenario("all").forall(_.getAs[String]("kind") == "row"))
    assert(byScenario("resolved").forall(r => r.getAs[String]("kind") == "row"))
  }
}
