package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Keyword tag selection — the reference's candidates → co-occurrence →
  * MMR-diverse tag set pipeline
  * (keyword_extraction/tag_selector.rs:81 `select_tags`, fed by the
  * lexical-candidate and co-occurrence stages of
  * keyword_extraction/pipeline.rs).
  *
  * Reference semantics kept 1:1: greedy MMR — each step picks the
  * remaining candidate maximising `λ·relevance − (1−λ)·max_sim` to the
  * already-selected set, rejecting candidates whose max similarity
  * exceeds the inter-tag cap; ties keep the earlier candidate in input
  * order (tag_selector.rs:118 strict `>`); selection stops when no
  * candidate passes the cap or `max_tags` is reached.
  *
  * Engine-exact conventions (so the DuckDB oracle hash-matches):
  *  - relevance = tf·(N−df) / (N·df) — integers through IEEE double
  *    ops in a fixed order, bit-identical across engines (a tf-idf
  *    surrogate; the reference's combined_score comes from its
  *    embedding rerank, a service this container doesn't have).
  *  - similarity = SQUARED cosine of term incidence vectors,
  *    cooc²/(df_a·df_b) — sqrt-free, so also bit-exact. The reference's
  *    0.80 cosine cap becomes 0.64 on the squared scale; the MMR
  *    diversity penalty runs on the squared value (documented
  *    deviation: penalty magnitude, not selection structure).
  *
  * Scale posture: candidates are a per-doc top-M window over the tf⋈df
  * join; the pair-similarity join runs over the incidence table
  * RESTRICTED to the candidate vocabulary (a semi-join), never the full
  * vocab cross product; the greedy fold is a per-row HOF over ≤ M
  * candidates — map-only after the collects.
  */
object KeywordTags {

  /** Per-doc MMR inputs: sorted candidate array + doc-local pair sims.
    * (doc_id, cands: array<struct<idx,term,rel>>,
    *  sims: array<struct<ta,tb,s>>)
    */
  def keywordTagInputs(spark: SparkSession, dir: String,
                       maxCandidates: Int = 12): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // tf feeds four lineages (relevance, df, incidence, cooc sims);
    // materialize once so the tokenize+shuffle pass isn't recomputed
    // per consumer — the dominant cost of a cold pipeline run.
    val tf = SparseSearch.termFreq(docs).localCheckpoint()
    val dfq = SparseSearch.docFreq(tf)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val scored = tf.join(dfq, "term").crossJoin(broadcast(nDocs))
      .withColumn("rel",
        col("tf").cast("double") * (col("n_docs") - col("df")) /
          (col("n_docs") * col("df")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("rel").desc, col("term"))
    val cand = scored
      .withColumn("idx", row_number().over(w))
      .filter(col("idx") <= maxCandidates)
      .select(col("doc_id"), col("term"), col("rel"), col("idx"))
      .localCheckpoint()

    // Global pair similarity over the candidate vocabulary only:
    // incidence restricted by semi-join, then the standard cooc shape.
    val vocab = cand.select(col("term")).distinct()
    val dt = tf.select(col("doc_id"), col("term")).join(vocab, Seq("term"), "left_semi")
    val cooc = dt.as("x").join(dt.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.term") < col("y.term"))
      .groupBy(col("x.term").as("ta"), col("y.term").as("tb"))
      .agg(count(lit(1)).as("c"))
    val sims = cooc
      .join(dfq.select(col("term").as("ta"), col("df").as("dfa")), "ta")
      .join(dfq.select(col("term").as("tb"), col("df").as("dfb")), "tb")
      .select(col("ta"), col("tb"),
        (col("c").cast("double") * col("c") / (col("dfa").cast("double") * col("dfb"))).as("s"))

    val docPairs = cand.as("a").join(cand.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .select(col("a.doc_id").as("doc_id"), col("a.term").as("ta"), col("b.term").as("tb"))
      .join(sims, Seq("ta", "tb"), "left")
      .select(col("doc_id"),
        struct(col("ta"), col("tb"), coalesce(col("s"), lit(0.0)).as("s")).as("p"))

    cand
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("idx"), col("term"), col("rel")))).as("cands"))
      .join(docPairs.groupBy(col("doc_id")).agg(collect_list(col("p")).as("sims")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("cands"),
        coalesce(col("sims"),
          array().cast("array<struct<ta:string,tb:string,s:double>>")).as("sims"))
  }

  /** The greedy MMR fold as a pure Column over (cands, sims) — one
    * selection step per `sequence` element; a step with no eligible
    * candidate appends nothing (empty slice), so selection freezes at
    * the reference's early-stop point.
    */
  def mmrSelection(maxTags: Int, lambda: Double, maxSimSq: Double): Column =
    aggregate(
      sequence(lit(1), lit(maxTags)),
      array().cast("array<string>"),
      (sel, _) => {
        val scored = transform(
          filter(col("cands"), c => !array_contains(sel, c("term"))),
          c => {
            val ms = coalesce(array_max(transform(sel, t =>
              coalesce(array_max(transform(
                filter(col("sims"), p =>
                  (p("ta") === c("term") && p("tb") === t) ||
                    (p("ta") === t && p("tb") === c("term"))),
                p => p("s"))), lit(0.0)))), lit(0.0))
            struct(ms.as("ms"), c("idx").as("idx"), c("term").as("term"), c("rel").as("rel"))
          })
        val ranked = transform(
          filter(scored, e => e("ms") <= lit(maxSimSq)),
          e => struct(
            (lit(lambda) * e("rel") - (lit(1) - lit(lambda)) * e("ms")).as("m"),
            (-e("idx")).as("ni"), e("term").as("term")))
        concat(sel, transform(slice(reverse(array_sort(ranked)), 1, 1), b => b("term")))
      })

  /** Run the selection over any (doc_id, cands, sims) frame — also fed
    * the reference's own select_tags test vectors by the parity specs.
    * Uses the native MmrSelect expression (plain loops); the column
    * fold above stays as its equality twin, KeywordTagsSpec-pinned.
    */
  def selectTagsDf(perDoc: DataFrame, maxTags: Int = 5,
                   lambda: Double = 0.7, maxSimSq: Double = 0.64): DataFrame =
    perDoc
      .select(col("doc_id"), posexplode(graft.GraftFunctions.mmrSelect(
        col("cands"), col("sims"), maxTags, lambda, maxSimSq)).as(Seq("ti", "tag")))
      .select(col("doc_id"), (col("ti") + 1).cast("int").as("tag_rank"), col("tag"))
      .orderBy(col("doc_id"), col("tag_rank"))

  /** The full pipeline: candidates → pair sims → MMR tag set per doc. */
  def keywordTags(spark: SparkSession, dir: String,
                  maxCandidates: Int = 12, maxTags: Int = 5,
                  lambda: Double = 0.7, maxSimSq: Double = 0.64): DataFrame =
    selectTagsDf(keywordTagInputs(spark, dir, maxCandidates), maxTags, lambda, maxSimSq)

  /** Keyword basket assignment (basket_assignment.rs:75
    * `assign_baskets`): every non-tag keyword goes to its most similar
    * selected tag — ties keep the earlier tag in selection order
    * (find_nearest_tag's strict `>`) — or to the `misc` basket when the
    * best similarity is under the floor. The reference's 0.40 cosine
    * floor becomes 0.16 on this pipeline's squared-cosine scale.
    *
    * Relational shape: per-doc keywords × per-doc tags is a ≤ M×T
    * key-equality join (doc_id), the similarity lookup rides the same
    * doc-local pair structs the MMR fold used, and the nearest tag is a
    * rank-1 window — no new corpus-wide state at any scale.
    */
  def keywordBaskets(spark: SparkSession, dir: String,
                     maxCandidates: Int = 12, maxTags: Int = 5,
                     lambda: Double = 0.7, maxSimSq: Double = 0.64,
                     minSimSq: Double = 0.16): DataFrame = {
    // Selection and assignment both run as native expressions over the
    // SAME per-doc row — no explode/join/window round trips (the
    // previous three-join + rank-window form is BasketAssign's
    // documented equality twin; KeywordTagsSpec's driver model and the
    // keyword_baskets oracle pin the output).
    keywordTagInputs(spark, dir, maxCandidates)
      .withColumn("tags", graft.GraftFunctions.mmrSelect(
        col("cands"), col("sims"), maxTags, lambda, maxSimSq))
      .select(col("doc_id"), explode(graft.GraftFunctions.basketAssign(
        col("cands"), col("sims"), col("tags"), minSimSq)).as("kb"))
      .select(col("doc_id"), col("kb.keyword").as("keyword"),
        col("kb.basket").as("basket"))
      .orderBy(col("doc_id"), col("keyword"))
  }
}
