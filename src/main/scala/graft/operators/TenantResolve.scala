package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tenant-id ⇄ project-name resolution (cli/src/data/tenants.rs) — the
  * CLI's rule that name arguments accept partial input resolved by a
  * tiered cascade, where ambiguity is an ERROR listing candidates,
  * never a silent pick (tenants.rs:85 resolve_tenant_entries):
  *
  *   1. exact tenant id        (first match returns immediately)
  *   2. exact name             (path basename; clones can share one)
  *   3. unique tenant-id prefix
  *   4. unique name prefix
  *   5. unique name substring
  *
  * The first tier with ANY matches decides: one match resolves, more
  * than one is ambiguous (tenants.rs:96-131 — each tier bails on
  * ambiguity rather than falling through), and an input no tier
  * matches is unknown (the reference then lists every registered
  * project, tenants.rs:134).
  *
  * Relational shape: the probe set is tool-call arguments — tiny — so
  * it rides a broadcast against one scan of the registry; per-(probe,
  * tier) counts are a partial-aggregated groupBy on probe (shuffle ∝
  * probes), and the tier pick is a scalar min over five counters. At
  * 100 TB of registry the only full pass is the match scan.
  */
object TenantResolve {

  /** §3 `*Of` form over entries `(tenant_id, path)` and probes
    * `(input)`. Output per probe: `outcome` (resolved | ambiguous |
    * unknown), `tier` (1-5, 0 when unknown), `tenant_id` (only when
    * resolved), `n_candidates` (matches in the deciding tier). */
  def resolveOf(entries: DataFrame, probes: DataFrame): DataFrame = {
    // load_tenants (:33): name = path basename (trailing '/' trimmed).
    val named = entries.withColumn("name",
      coalesce(try_element_at(
        filter(split(col("path"), "/"), c => c =!= ""), lit(-1)),
        col("path")))

    // One scan × broadcast probes: per-pair lowest matching tier.
    val pairTier = named.join(broadcast(probes),
        col("tenant_id") === col("input") ||
          col("name") === col("input") ||
          col("tenant_id").startsWith(col("input")) ||
          col("name").startsWith(col("input")) ||
          col("name").contains(col("input")))
      .select(col("input"), col("tenant_id"), col("name"),
        when(col("tenant_id") === col("input"), 1)
          .when(col("name") === col("input"), 2)
          .when(col("tenant_id").startsWith(col("input")), 3)
          .when(col("name").startsWith(col("input")), 4)
          .otherwise(5).as("tier"))

    // Per probe: the deciding tier is the LOWEST with any matches; its
    // candidate count and (when unique) its single tenant.
    val decided = pairTier.groupBy(col("input"), col("tier"))
      .agg(count(lit(1)).as("n"), min(col("tenant_id")).as("the_tenant"))
      .groupBy(col("input"))
      .agg(min_by(struct(col("n"), col("the_tenant")), col("tier")).as("win"),
        min(col("tier")).as("tier"))
      .select(col("input"), col("tier"), col("win.n").as("n_candidates"),
        col("win.the_tenant").as("the_tenant"))

    probes.join(broadcast(decided), Seq("input"), "left")
      .select(col("input"),
        when(col("tier").isNull, lit("unknown"))
          .when(col("n_candidates") === 1, lit("resolved"))
          .otherwise(lit("ambiguous")).as("outcome"),
        coalesce(col("tier"), lit(0)).as("tier"),
        when(col("n_candidates") === 1, col("the_tenant")).as("tenant_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
      .orderBy(col("input"))
  }

  /** tenant_resolve over the TUI registry synthesis, with a probe set
    * exercising every arm: exact ids, an exact-name tie (the two
    * `docs` libraries), unique and ambiguous prefixes at both tiers, a
    * unique substring, and an unknown. */
  def tenantResolve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val entries = TuiViews.registry(spark, dir)
      .select(col("tenant_id"), col("path"))
    val probes = Seq(
      "src4",      // tier 1: exact tenant id
      "docs",      // tier 2 ambiguous: both library basenames
      "proj-7",    // tier 2: unique exact name
      "src1",      // tier 1 beats the src1x id-prefix family
      "src1x",     // unknown
      "proj-1",    // tier 2 exact beats proj-1x name prefixes
      "rules-",    // tier 4 ambiguous: rules-5, rules-14
      "oj-7",      // tier 5: unique substring
      "zzz")       // unknown
      .toDF("input")
    resolveOf(entries, probes)
  }
}
