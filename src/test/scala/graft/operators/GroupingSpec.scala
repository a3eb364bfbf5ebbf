package graft.operators

import graft.SparkSpec

/** Parity with the reference's tag-affinity grouping semantics
  * (grouping/affinity/tag_affinity.rs + affinity_tests.rs): Jaccard of
  * distinct tag sets, threshold inclusion, and transitive component
  * building (A~B and B~C → one group).
  */
class GroupingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("connected components: transitivity merges chains, min label wins") {
    import spark.implicits._
    val edges = Seq(("p1", "p2"), ("p2", "p3"), ("p5", "p6")).toDF("a", "b")
    val out = Grouping.connectedComponents(edges).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("p1" -> "p1", "p2" -> "p1", "p3" -> "p1",
      "p5" -> "p5", "p6" -> "p5"))
  }

  test("connected components: a 40-node chain converges inside the round budget") {
    import spark.implicits._
    // plain min-label propagation would need 39 rounds; pointer jumping
    // must close this well inside the 16-round guard
    val edges = (0 until 39).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("a", "b")
    val out = Grouping.connectedComponents(edges).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.length == 40)
    assert(out.forall(_._2 == "n00"), "every chain node must reach the minimum label")
  }

  test("tag_affinity on the corpus: groups keyed by min member, jaccard-verified") {
    val rows = Grouping.tagAffinity(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.nonEmpty, "the self-similar corpus must produce affine tenants")
    val byGroup = rows.groupBy(_._2)
    byGroup.foreach { case (g, members) =>
      assert(members.map(_._1).min == g, s"group id $g must be its min member")
      assert(members.length >= 2, "groups come from pairwise affinities")
    }
    // spot-verify one edge: every group of >= 2 members implies at least
    // one pair whose true tag-set Jaccard clears the threshold
    val tags = KeywordTags.keywordTags(spark, sfDir)
    val tenants = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source").as("tenant_id"))
    val prof = tags.join(tenants, "doc_id")
      .select(col("tenant_id"), col("tag")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byGroup.foreach { case (_, members) =>
      val ms = members.map(_._1)
      val hasEdge = ms.toSeq.combinations(2).exists { pair =>
        val (a, b) = (prof(pair(0)), prof(pair(1)))
        val inter = a.intersect(b).size.toDouble
        inter / (a.size + b.size - inter) >= 0.25
      }
      assert(hasEdge, s"group ${ms.mkString(",")} must contain a direct affinity edge")
    }
  }
}
