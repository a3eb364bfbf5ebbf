package graft.operators

import graft.SparkSpec

/** Parity of quasi_summary with a direct Scala model of
  * quasi_summary.rs `summarize_code` + `bm25_chunk_weight` (per-doc
  * chunk BM25 salience, k1=1.2 / b=0.75, stable top-3 gist).
  */
class QuasiSummarySpec extends SparkSpec {

  private val stopwords = Set(
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from", "has",
    "he", "in", "is", "it", "its", "of", "on", "or", "that", "the", "to",
    "was", "were", "will", "with", "this", "but", "they", "have", "had",
    "what", "when", "where", "who", "which", "why", "how")

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9_]+").toSeq
      .filter(t => t.length > 1 && !stopwords.contains(t))

  /** bm25_chunk_weight (quasi_summary.rs:41), per-doc. */
  private def modelWeights(chunks: Seq[(Int, String)],
                           k1: Double = 1.2, b: Double = 0.75): Map[Int, Double] = {
    val toks = chunks.map { case (ci, t) => ci -> tokenize(t) }
    val n = toks.size.toDouble
    val avgLen = toks.map(_._2.size.toDouble).sum / n
    val cdf = toks.flatMap(_._2.distinct).groupBy(identity).view.mapValues(_.size).toMap
    toks.map { case (ci, terms) =>
      if (terms.isEmpty) ci -> 1.0
      else {
        val tf = terms.groupBy(identity).view.mapValues(_.size).toMap
        val len = terms.size.toDouble
        val w = tf.map { case (term, f) =>
          val df = cdf(term).toDouble
          val idf = math.max(math.log((n - df + 0.5) / (df + 0.5)), 0.0)
          idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * (len / avgLen)))
        }.sum
        ci -> math.max(w, 0.01)
      }
    }.toMap
  }

  test("quasi_summary gist matches the reference salience model per doc") {
    val chunks = Ingest.chunkDocuments(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
    val expected = chunks.groupBy(_._1).map { case (id, cs) =>
      val ws = modelWeights(cs.map(c => (c._2, c._3)).toSeq)
      val top = ws.toSeq.sortBy { case (ci, w) => (-w, ci) }.take(3)
      id -> top.zipWithIndex.map { case ((ci, w), i) => (i + 1, ci) }
    }
    val got = TextAnalysis.quasiSummary(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1)).map(r => (r.getInt(1), r.getInt(2))).toSeq
      }
    assert(got.keySet == expected.keySet)
    val bad = expected.collect { case (id, exp) if got(id) != exp => (id, exp, got(id)) }
    assert(bad.isEmpty, s"gist mismatches (first 3): ${bad.take(3)}")
  }

  test("quasi_summary weights are positive and at most gist_chunks rows per doc") {
    val rows = TextAnalysis.quasiSummary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) > 0.0))
    rows.groupBy(_.getLong(0)).values.foreach(g => assert(g.length <= 3))
  }
}
