package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** Parity of the distributed MMR tag selection with a direct Scala
  * model of tag_selector.rs:81 `select_tags` (greedy MMR, strict-`>`
  * first-wins ties, inter-tag similarity cap), plus the reference's own
  * select_tags unit-test scenarios re-expressed on the squared-cosine
  * scale.
  */
case class Cand(idx: Int, term: String, rel: Double)
case class SimP(ta: String, tb: String, s: Double)
case class DocIn(doc_id: Long, cands: Seq[Cand], sims: Seq[SimP])

class KeywordTagsSpec extends SparkSpec {
  import spark.implicits._

  /** tag_selector.rs select_tags, verbatim loop semantics. */
  private def modelSelect(cands: Seq[(Int, String, Double)],
                          sims: Map[(String, String), Double],
                          maxTags: Int = 5, lambda: Double = 0.7,
                          maxSimSq: Double = 0.64): Seq[String] = {
    def simOf(a: String, b: String): Double =
      sims.getOrElse((a, b), sims.getOrElse((b, a), 0.0))
    val selected = scala.collection.mutable.ArrayBuffer[String]()
    var go = true
    while (selected.size < maxTags && go) {
      var bestMmr = Double.NegativeInfinity
      var best: Option[String] = None
      for ((_, t, rel) <- cands.sortBy(_._1) if !selected.contains(t)) {
        val ms = if (selected.isEmpty) 0.0 else selected.map(simOf(t, _)).max
        if (ms <= maxSimSq) {
          val mmr = lambda * rel - (1 - lambda) * ms
          if (mmr > bestMmr) { bestMmr = mmr; best = Some(t) }
        }
      }
      best match {
        case Some(t) => selected += t
        case None    => go = false
      }
    }
    selected.toSeq
  }

  private def runDf(docs: Seq[DocIn], maxTags: Int = 5): Map[Long, Seq[String]] =
    KeywordTags.selectTagsDf(docs.toDS.toDF, maxTags = maxTags)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }

  // reference: tag_selector.rs test_select_tags_basic — orthogonal
  // candidates: all selected, highest relevance first.
  test("MMR: orthogonal candidates all selected in relevance order") {
    val in = DocIn(1L, Seq(Cand(1, "vector_search", 0.9), Cand(2, "database", 0.7),
      Cand(3, "embedding", 0.6)), Nil)
    assert(runDf(Seq(in), maxTags = 3)(1L) == Seq("vector_search", "database", "embedding"))
  }

  // reference: tag_selector.rs test_select_tags_diversity — the near
  // duplicate of the top tag is rejected for the diverse third option.
  test("MMR: near-duplicate rejected in favour of a diverse candidate") {
    val in = DocIn(1L,
      Seq(Cand(1, "vector_search", 0.9), Cand(2, "vector_indexing", 0.85),
        Cand(3, "grpc_protocol", 0.6)),
      Seq(SimP("vector_search", "vector_indexing", 0.98),
        SimP("vector_search", "grpc_protocol", 0.0),
        SimP("vector_indexing", "grpc_protocol", 0.0)))
    assert(runDf(Seq(in), maxTags = 2)(1L) == Seq("vector_search", "grpc_protocol"))
  }

  // reference: tag_selector.rs test_select_tags_all_identical_vectors —
  // only the first survives when everything is maximally similar.
  test("MMR: identical candidates collapse to the top one") {
    val in = DocIn(1L,
      Seq(Cand(1, "tag_a", 0.9), Cand(2, "tag_b", 0.8), Cand(3, "tag_c", 0.7)),
      Seq(SimP("tag_a", "tag_b", 1.0), SimP("tag_a", "tag_c", 1.0),
        SimP("tag_b", "tag_c", 1.0)))
    assert(runDf(Seq(in), maxTags = 3)(1L) == Seq("tag_a"))
  }

  /** basket_assignment.rs:75 assign_baskets / find_nearest_tag, on the
    * squared-similarity scale: nearest tag by strict `>` (ties keep the
    * earlier tag), under-floor keywords go to misc.
    */
  private def modelBaskets(cands: Seq[(Int, String, Double)],
                           sims: Map[(String, String), Double],
                           tags: Seq[String],
                           minSimSq: Double = 0.16): Map[String, String] = {
    def simOf(a: String, b: String): Double =
      sims.getOrElse((a, b), sims.getOrElse((b, a), 0.0))
    cands.map(_._2).filterNot(tags.contains).map { kw =>
      if (tags.isEmpty) kw -> "misc"
      else {
        var bestSim = Double.NegativeInfinity
        var best = tags.head
        tags.foreach { t =>
          val s = simOf(kw, t)
          if (s > bestSim) { bestSim = s; best = t }
        }
        kw -> (if (bestSim >= minSimSq) best else "misc")
      }
    }.toMap
  }

  test("keyword_baskets: under-floor keyword lands in misc, others on nearest tag") {
    val in = DocIn(1L,
      Seq(Cand(1, "tag_a", 0.9), Cand(2, "tag_b", 0.8),
        Cand(3, "kw_near_a", 0.5), Cand(4, "kw_orphan", 0.4)),
      Seq(SimP("tag_a", "tag_b", 0.0),
        SimP("kw_near_a", "tag_a", 0.5), SimP("kw_near_a", "tag_b", 0.2),
        SimP("kw_orphan", "tag_a", 0.05), SimP("kw_orphan", "tag_b", 0.1)))
    // with orthogonal tags both are selected; the two keywords remain
    val perDoc = Seq(in).toDS.toDF
    val tags = KeywordTags.selectTagsDf(perDoc, maxTags = 2).collect()
      .sortBy(_.getInt(1)).map(_.getString(2)).toSeq
    assert(tags == Seq("tag_a", "tag_b"))
    val expected = modelBaskets(
      in.cands.map(c => (c.idx, c.term, c.rel)),
      in.sims.map(p => (p.ta, p.tb) -> p.s).toMap, tags)
    assert(expected == Map("kw_near_a" -> "tag_a", "kw_orphan" -> "misc"))
  }

  test("keyword_baskets on the corpus matches the Scala reference model per doc") {
    val inputs = KeywordTags.keywordTagInputs(spark, sfDir).collect()
    val tagsByDoc = KeywordTags.keywordTags(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    val expected = inputs.flatMap { r =>
      val id = r.getLong(0)
      val cands = r.getSeq[Row](1).map(c => (c.getInt(0), c.getString(1), c.getDouble(2)))
      val sims = r.getSeq[Row](2)
        .map(p => (p.getString(0), p.getString(1)) -> p.getDouble(2)).toMap
      modelBaskets(cands, sims, tagsByDoc.getOrElse(id, Nil))
        .map { case (kw, b) => (id, kw) -> b }
    }.toMap
    val got = KeywordTags.keywordBaskets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    assert(got.keySet == expected.keySet,
      s"coverage differs: got ${got.size} vs ${expected.size}")
    val bad = expected.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(bad.isEmpty, s"mismatches (first 3): ${bad.take(3)}")
  }

  test("keyword_tags on the corpus matches the Scala reference model per doc") {
    val inputs = KeywordTags.keywordTagInputs(spark, sfDir).collect()
    val expected = inputs.map { r =>
      val cands = r.getSeq[Row](1).map(c => (c.getInt(0), c.getString(1), c.getDouble(2)))
      val sims = r.getSeq[Row](2)
        .map(p => (p.getString(0), p.getString(1)) -> p.getDouble(2)).toMap
      r.getLong(0) -> modelSelect(cands, sims)
    }.toMap.filter(_._2.nonEmpty)
    val got = KeywordTags.keywordTags(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    assert(got.keySet == expected.keySet,
      s"doc coverage differs: ${got.keySet.size} vs ${expected.keySet.size}")
    val bad = expected.collect { case (id, exp) if got(id) != exp => (id, exp, got(id)) }
    assert(bad.isEmpty, s"mismatched docs (first 3): ${bad.take(3)}")
    assert(expected.nonEmpty && expected.values.exists(_.size > 1),
      "corpus must produce multi-tag docs (non-vacuous)")
  }

  // The native MmrSelect expression must equal the higher-order column
  // fold it replaced, per doc per rank, on the real corpus inputs.
  test("MMR: native expression equals the column fold on the corpus") {
    import org.apache.spark.sql.functions._
    val inputs = KeywordTags.keywordTagInputs(spark, sfDir).localCheckpoint()
    val viaExpr = inputs.select(col("doc_id"),
      graft.GraftFunctions.mmrSelect(col("cands"), col("sims"), 5, 0.7, 0.64).as("tags"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaFold = inputs.select(col("doc_id"),
      KeywordTags.mmrSelection(5, 0.7, 0.64).as("tags"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaExpr == viaFold,
      s"first diff: ${viaExpr.find { case (k, v) => viaFold.get(k) != Some(v) }}")
  }
}
