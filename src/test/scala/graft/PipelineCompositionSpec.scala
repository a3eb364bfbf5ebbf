package graft

import org.apache.spark.sql.functions._

import graft.operators.{Grouping, KeywordTags, TagHierarchy}

/** The `*Of` composition contract (SURVEY §3): pipeline callers run the
  * expensive keyword pipeline ONCE, cache the tags frame, and feed it
  * to every downstream consumer — with results identical to the
  * standalone query entries that derive their own inputs.
  */
class PipelineCompositionSpec extends SparkSpec {

  test("one cached tags frame feeds tag_hierarchy and tag_affinity unchanged") {
    val tags = KeywordTags.keywordTags(spark, sfDir).cache()
    try {
      val tenants = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source").as("tenant_id"))

      val composedHier = TagHierarchy.tagHierarchyOf(spark, tags).collect()
      val composedAff = Grouping.tagAffinityOf(tags, tenants).collect()

      val standaloneHier = TagHierarchy.tagHierarchy(spark, sfDir).collect()
      val standaloneAff = Grouping.tagAffinity(spark, sfDir).collect()

      assert(composedHier.map(_.toString).toSeq ==
        standaloneHier.map(_.toString).toSeq,
        "composed tag_hierarchy must equal the standalone query")
      assert(composedAff.map(_.toString).toSeq ==
        standaloneAff.map(_.toString).toSeq,
        "composed tag_affinity must equal the standalone query")
    } finally tags.unpersist()
  }
}
