package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ScopedSearch._

/** Reference vectors from cross_project_search.rs tests. */
class ScopedSearchSpec extends SparkSpec {

  test("from_str_loose parsing (test_search_scope_from_str + default)") {
    assert(fromStrLoose("project") == "project")
    assert(fromStrLoose("group") == "group")
    assert(fromStrLoose("all") == "all")
    assert(fromStrLoose("GROUP") == "group")
    assert(fromStrLoose("unknown") == "project")
    assert(fromStrLoose("") == "project")
  }

  test("group members resolve across shared groups (test_resolve_scope_group_with_members)") {
    import spark.implicits._
    val groups = Seq(("grp-1", "proj-a"), ("grp-1", "proj-b"), ("grp-2", "proj-c"))
      .toDF("group_id", "tenant_id")
    val members = groupMembersOf(groups, "proj-a")
      .collect().map(_.getString(0)).toSet
    assert(members == Set("proj-a", "proj-b"))
  }

  test("no shared group yields empty member set (fallback precondition, test_resolve_scope_group_no_table)") {
    import spark.implicits._
    val groups = Seq(("grp-2", "proj-c")).toDF("group_id", "tenant_id")
    assert(groupMembersOf(groups, "proj-a").count() == 0)
  }

  test("decay multipliers and re-sort (test_apply_decay_reorders + defaults)") {
    import spark.implicits._
    // other .95*0.4=.38 < group .80*0.7=.56 < current .60*1.0=.60
    val scored = Seq((1L, 0.95), (2L, 0.80), (3L, 0.60)).toDF("doc_id", "score")
    val owners = Seq((1L, "proj-x"), (2L, "proj-b"), (3L, "proj-a"))
      .toDF("doc_id", "tenant_id")
    val members = Seq("proj-a", "proj-b").toDF("tenant_id")
    val out = scopedSearchOf(scored, owners, members, "proj-a")
    val all = out.filter(col("scope") === "all").orderBy("rnk")
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(all == Seq(3L, 2L, 1L), "current > group > other after decay")
  }

  test("scope filters: project = Single, group = Multiple, all = None") {
    import spark.implicits._
    val scored = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7)).toDF("doc_id", "score")
    val owners = Seq((1L, "proj-x"), (2L, "proj-b"), (3L, "proj-a"))
      .toDF("doc_id", "tenant_id")
    val members = Seq("proj-a", "proj-b").toDF("tenant_id")
    val out = scopedSearchOf(scored, owners, members, "proj-a").collect()
    val byScope = out.groupBy(_.getAs[String]("scope"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    assert(byScope("project") == Set(3L))
    assert(byScope("group") == Set(2L, 3L))
    assert(byScope("all") == Set(1L, 2L, 3L))
  }

  test("corpus query: tenant isolation per scope + fallback wiring") {
    val out = ScopedSearch.scopedSearch(spark, sfDir).collect()
    val proj = out.filter(_.getAs[String]("scope") == "project")
    assert(proj.nonEmpty && proj.forall(_.getAs[String]("tenant_id") == "src1"))
    val grp = out.filter(_.getAs[String]("scope") == "group")
      .map(_.getAs[String]("tenant_id")).toSet
    assert(grp.forall(t => t.stripPrefix("src").toInt % 5 == 1))
    assert(out.count(_.getAs[String]("scope") == "all") >= grp.size)
  }
}
