package graft

import org.apache.spark.sql.functions._

import graft.operators.{Elaborates, Explains, Grouping, KeywordTags, Narrative, TagHierarchy}

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

  test("one cached section axis feeds doc_explains and doc_elaborates unchanged") {
    // The narrative pipeline's shared upstream: a caller extracts
    // section spans once and feeds both the EXPLAINS scan and the
    // COVERS_TOPIC → ELABORATES pass from the same cached frame.
    val docs = Tables.documents(spark, sfDir).select(
      col("source").as("tenant_id"), col("doc_id"),
      Explains.corpusFilePath.as("file_path"),
      Narrative.syntheticMarkdown(col("text")).as("content"))
    val sections = Explains.routedSectionSpans(Explains.narrativeDocs(docs)).cache()
    try {
      val composedExplains = Explains
        .explainsOf(sections, Explains.corpusSymbols(spark, sfDir))
        .select(col("tenant_id"), col("doc_id"), col("section_index"),
          col("symbol"), col("node_id"), col("n_occ"), col("rnk"))
        .orderBy(col("doc_id"), col("section_index"), col("rnk"))
        .collect()
      val standaloneExplains = Explains.docExplains(spark, sfDir).collect()
      assert(composedExplains.map(_.toString).toSeq ==
        standaloneExplains.map(_.toString).toSeq,
        "composed doc_explains must equal the standalone query")

      // doc_elaborates_adjacent's standalone entry derives sections
      // through docSections (markdown-only, with depth); the composed
      // form here covers the elaboratesAdjacentOf contract over an
      // externally-supplied COVERS_TOPIC frame instead
      val covers = Narrative.docSections(spark, sfDir).select(
        concat(lit("sec:"), col("doc_id"), lit(":"), col("section_index"))
          .as("source_node_id"),
        concat(lit("concept-"), (col("doc_id") % 60).cast("string")).as("concept_id"),
        col("depth"))
      val composedElab = Elaborates.elaboratesAdjacentOf(covers)
        .orderBy(col("concept_id"), col("shallow_id"), col("deep_id")).collect()
      val standaloneElab = Elaborates.docElaboratesAdjacent(spark, sfDir).collect()
      assert(composedElab.map(_.toString).toSeq ==
        standaloneElab.map(_.toString).toSeq,
        "composed doc_elaborates must equal the standalone query")
    } finally sections.unpersist()
  }
}
