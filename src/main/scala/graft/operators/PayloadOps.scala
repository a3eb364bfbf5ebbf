package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.TextFunctions._

/** Payload filtering, cross-collection search, and lexicon maintenance —
  * the remaining query surfaces of the reference.
  *
  *  - Qdrant filter maps (reference storage/search.rs:38
  *    `build_filter_from_json`): flat field→value maps become `must`
  *    equality conditions; arrays become match-any. Payloads here live
  *    in the events table's JSON `props` column.
  *  - Cross-collection search (reference
  *    storage/cross_collection_search.rs): per-collection top-k then a
  *    global merge, collections = `source`.
  *  - Hapax eviction (reference embedding/bm25.rs `evict_hapax`):
  *    the lexicon terms with document_frequency == 1.
  *  - Keyword co-occurrence graph (reference
  *    keyword_extraction/cooccurrence_graph.rs): doc-level term-pair
  *    counts.
  *  - Session windows via Spark's native `session_window` — the same
  *    operator Structured Streaming uses for stateful sessionization,
  *    here exercised in batch under the oracle.
  */
object PayloadOps {

  /** A Qdrant-style filter condition: field equals value, or field
    * matches any of several values.
    */
  sealed trait Match { def toColumn: Column }
  final case class MatchValue(field: Column, value: Any) extends Match {
    def toColumn: Column = field === lit(value)
  }
  final case class MatchAny(field: Column, values: Seq[Any]) extends Match {
    def toColumn: Column = field.isin(values: _*)
  }

  /** AND-combine `must` conditions (Filter::must semantics). */
  def mustFilter(conditions: Seq[Match]): Column =
    conditions.map(_.toColumn).reduce(_ && _)

  /** OR-combine `should` conditions (Filter::should semantics). */
  def shouldFilter(conditions: Seq[Match]): Column =
    conditions.map(_.toColumn).reduce(_ || _)

  /** Filtered event scan: must(event_type ∈ {click, view},
    * props.k ∈ {1..5}) — the JSON payload field is extracted and the
    * whole predicate is codegen'd into the scan stage.
    */
  def payloadFilter(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    val events = Tables.events(spark, dir).withColumn("k", k)
    events
      .filter(mustFilter(Seq(
        MatchAny(col("event_type"), Seq("click", "view")),
        MatchAny(col("k"), Seq(1, 2, 3, 4, 5)))))
      .select(col("event_id"), col("event_type"), col("k"))
      .orderBy(col("event_id"))
  }

  /** Per-collection (source) BM25 top-3 for a fixed query, then a
    * global merge ordered by collection — the cross-collection search
    * shape: local top-k limits what each collection ships to the merge.
    */
  def crossCollection(spark: SparkSession, dir: String,
                      query: String = "dup vector window fast", k: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // BM25 over the whole corpus (shared df stats — the reference keeps
    // per-collection stats; a single-lexicon variant is a groupBy swap),
    // then per-collection top-k. The join back to source is unhinted:
    // the scored side is ≤ |matching docs| rows, so AQE broadcasts it
    // while small and shuffles on doc_id beyond that — never a
    // corpus-wide broadcast.
    val scored = SparseSearch.bm25ScoresForQuery(spark, docs, query)
    val withSource = docs.select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
    val w = Window.partitionBy(col("source")).orderBy(col("score").desc, col("doc_id"))
    withSource.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("source"), col("doc_id"), col("rnk"))
      .orderBy(col("source"), col("rnk"))
  }

  /** Lexicon hapax legomena: terms appearing in exactly one document of
    * a collection (the eviction set of the reference's lexicon
    * compaction — the reference keeps one BM25 lexicon PER collection,
    * so eviction is per-collection too). One groupBy on (source, term).
    */
  def hapaxTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    SparseSearch.termFreq(docs)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("only_doc"))
      .filter(col("df") === 1)
      .select(col("source"), col("term"), col("only_doc"))
      .orderBy(col("source"), col("term"))
  }

  /** Term co-occurrence graph: distinct term pairs per document,
    * counted across the corpus, thresholded. One explode + one groupBy;
    * the pair space is bounded by per-doc distinct terms, not corpus
    * size.
    */
  def cooccurrence(spark: SparkSession, dir: String, minCount: Long = 50L): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(tokenizeSimple(col("text"))).as("ts"))
    val pairs = toks
      .select(col("doc_id"), explode(col("ts")).as("term_a"), col("ts"))
      .select(col("doc_id"), col("term_a"), explode(col("ts")).as("term_b"))
      .filter(col("term_a") < col("term_b"))
    pairs.groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minCount)
      .orderBy(col("term_a"), col("term_b"))
  }

  /** Memory-rule selection (reference: mcp-server/src/tools/rules/ +
    * session_init — rules carry a `priority` and are injected in
    * priority order until a token budget is exhausted): running-sum
    * window over (priority desc, id), cut at the budget.
    * Rules here = the `src0` collection; priority derived
    * deterministically from the id.
    */
  def rulesSelect(spark: SparkSession, dir: String, budget: Long = 500L): DataFrame = {
    val rules = Tables.documents(spark, dir)
      .filter(col("source") === "src0")
      .select(col("doc_id"),
        (col("doc_id") % 10).cast("int").as("priority"),
        size(split(col("text"), "\\s+")).as("n_tokens"))
    val w = Window.orderBy(col("priority").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rules
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .orderBy(col("priority").desc, col("doc_id"))
  }

  /** Native session-window aggregation (30-minute gap) — Spark's
    * streaming-stateful operator exercised in batch; row-for-row
    * equivalent to the lag/cumsum `sessionize` operator.
    */
  def sessionWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** `should` (OR) payload filter — the other half of the Qdrant filter
    * map (storage/search.rs:38: `should` conditions OR-combine, the tag
    * OR-filter shape): match events that are errors OR carry payload
    * k = 7. Same codegen'd-into-the-scan posture as [[payloadFilter]].
    */
  def payloadShould(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    Tables.events(spark, dir).withColumn("k", k)
      .filter(shouldFilter(Seq(
        MatchValue(col("event_type"), "error"),
        MatchValue(col("k"), 7))))
      .select(col("event_id"), col("event_type"), col("k"))
      .orderBy(col("event_id"))
  }

  /** Tenant-scoped search with cross-project relevance decay
    * (reference cross_project_search.rs:134 `apply_relevance_decay`,
    * RelevanceDecay defaults 1.0 / 0.7 / 0.4): the current project's
    * results keep their score, grouped projects decay by 0.7, everything
    * else by 0.4, then the list re-sorts by adjusted score. Tenants are
    * the derived project grouping of `source` (the test corpus carries
    * no tenant column — same derivation as diversity_rerank). The decay
    * is one multiply on an already-scored list; integer-rank output
    * keeps the oracle hash-stable.
    */
  def tenantSearchDecay(spark: SparkSession, dir: String,
                        query: String = "dup vector window fast",
                        currentTenant: String = "p1",
                        groupTenants: Seq[String] = Seq("p2"),
                        k: Int = 20,
                        currentMul: Double = 1.0, groupMul: Double = 0.7,
                        otherMul: Double = 0.4): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = SparseSearch.bm25ScoresForQuery(spark, docs, query)
    val tenants = docs.select(col("doc_id"),
      concat(lit("p"), expr("cast(substring(source, 4) as int) % 5")).as("tenant_id"))
    val adj = scored.join(tenants, "doc_id")
      .withColumn("adj_score", col("score") *
        when(col("tenant_id") === currentTenant, lit(currentMul))
          .when(col("tenant_id").isin(groupTenants: _*), lit(groupMul))
          .otherwise(lit(otherMul)))
    adj
      .orderBy(col("adj_score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("tenant_id"),
        row_number().over(Window.orderBy(col("adj_score").desc, col("doc_id"))).as("rnk"))
      .orderBy(col("rnk"))
  }

  /** Batch twin of the file-watcher debouncer (watching_queue/types.rs:160
    * `EventDebouncer`: per path only the LATEST event survives, and it is
    * released once the path has been quiet for the debounce window). Over
    * a closed log that is exactly: emit an event iff no later same-key
    * event follows within `debounceSec` — one lead window, no state. The
    * streaming twin with real incremental state is
    * [[graft.streaming.StreamOps.debounceOnce]]; StreamOpsSpec asserts
    * the two agree up to the watermark.
    */
  def debounceEvents(spark: SparkSession, dir: String,
                     debounceSec: Long = 600L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("next_us").isNull ||
        col("next_us") - unix_micros(col("ts")) > debounceSec * 1000000L)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }
}
