package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Project affinity grouping — tag-based Jaccard affinity
  * (grouping/affinity/tag_affinity.rs: per-project distinct tag
  * profiles → pairwise Jaccard ≥ 0.25 → connected-component groups,
  * build_tag_affinity_groups' A~B~C transitivity).
  *
  * Relational shape: profiles come from the keyword pipeline's tag
  * output joined to the tenant axis (source); |A∩B| is ONE key-equality
  * self-join on tag grouped per tenant pair (shuffle ∝ shared-tag
  * pairs, never tenants²·|tags|); Jaccard = inter/(|A|+|B|−inter) is
  * exact integer rationals, so the edge set is bit-identical across
  * engines. Components resolve by iterative min-label propagation over
  * the tiny tenant graph — a bounded DataFrame loop (the tenant axis is
  * thousands at most; iterations cap the diameter and the loop exits
  * early at fixpoint).
  */
object Grouping {

  /** Connected components via min-label propagation over (a, b) edges
    * with POINTER JUMPING: each round takes the min over the node's own
    * label, its neighbours' labels, and its label's label — the
    * shortcut halves chain lengths, so convergence is O(log diameter)
    * rounds, not O(diameter); the fixpoint check exits early and
    * `maxIters` (2^16-diameter headroom) is only a runaway guard.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 16): DataFrame = {
    val bidir = edges.select(col("a"), col("b"))
      .union(edges.select(col("b"), col("a")))
      .distinct().localCheckpoint()
    var labels = bidir.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      val nbrMin = bidir.join(labels, bidir("b") === labels("node"))
        .groupBy(col("a")).agg(min(col("label")).as("nbr_label"))
      val hop = labels.select(col("node").as("ln"), col("label").as("ll"))
      val next = labels
        .join(nbrMin, labels("node") === nbrMin("a"), "left")
        .join(hop, labels("label") === hop("ln"), "left")
        .select(col("node"),
          least(col("label"),
            coalesce(col("nbr_label"), col("label")),
            coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint()
      converged = next.join(labels.select(col("node"), col("label").as("prev")), "node")
        .filter(col("label") =!= col("prev")).isEmpty
      labels = next
      iter += 1
    }
    labels
  }

  /** tag_affinity query: tenants = `source`, profiles = the MMR tag
    * sets of each tenant's documents, groups keyed by the component's
    * minimum tenant id. Tenants with no qualifying affinity edge have
    * no group row (the reference builds groups from affinities only).
    */
  def tagAffinity(spark: SparkSession, dir: String,
                  threshold: Double = 0.25): DataFrame =
    tagAffinityOf(
      KeywordTags.keywordTags(spark, dir),
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source").as("tenant_id")),
      threshold)

  /** Affinity grouping over any pre-computed (doc_id, tag) assignment +
    * (doc_id, tenant_id) axis — callers that already ran the keyword
    * pipeline pass its output here instead of recomputing it.
    */
  def tagAffinityOf(tags: DataFrame, tenants: DataFrame,
                    threshold: Double = 0.25): DataFrame = {
    val prof = tags.join(tenants, "doc_id")
      .select(col("tenant_id"), col("tag")).distinct()
      .localCheckpoint()
    val sizes = prof.groupBy(col("tenant_id")).agg(count(lit(1)).as("sz"))
    val inter = prof.as("x").join(prof.as("y"),
        col("x.tag") === col("y.tag") && col("x.tenant_id") < col("y.tenant_id"))
      .groupBy(col("x.tenant_id").as("a"), col("y.tenant_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    val edges = inter
      .join(sizes.select(col("tenant_id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("tenant_id").as("b"), col("sz").as("szb")), "b")
      .withColumn("sim",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("sim") >= threshold)
      .select(col("a"), col("b"))
    connectedComponents(edges)
      .select(col("node").as("tenant_id"), col("label").as("group_id"))
      .orderBy(col("tenant_id"))
  }
}
