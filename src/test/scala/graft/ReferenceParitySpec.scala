package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphAlgorithms, SparseSearch}

/** Parity with the reference implementation's OWN unit-test vectors —
  * inputs and expected outputs lifted from its test suites (cited per
  * case), run through graft's operators.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  private def penaltyOf(rows: Seq[(String, Double, String, String)]): Map[String, Double] =
    SparseSearch.applyDiversityPenalty(rows.toDF("id", "score", "project", "file")
      .select(col("id"), col("score"), col("file"), col("project")))
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Double]("adj_score")).toMap

  // reference: source_diversity/tests.rs test_penalty_same_file_penalized
  test("diversity penalty: same-file run compounds 0.85^n") {
    val adj = penaltyOf(Seq(
      ("r1", 0.90, "proj-a", "/src/main.rs"),
      ("r2", 0.85, "proj-a", "/src/main.rs"),
      ("r3", 0.80, "proj-a", "/src/main.rs")))
    assert(math.abs(adj("r1") - 0.90) < 1e-4)
    assert(math.abs(adj("r2") - 0.7225) < 1e-4)  // 0.85 * 0.85
    assert(math.abs(adj("r3") - 0.578) < 1e-3)   // 0.80 * 0.85^2
  }

  // reference: source_diversity/tests.rs test_penalty_same_project_different_file
  test("diversity penalty: same project, different file compounds 0.92^n") {
    val adj = penaltyOf(Seq(
      ("r1", 0.90, "proj-a", "/src/main.rs"),
      ("r2", 0.85, "proj-a", "/src/lib.rs"),
      ("r3", 0.80, "proj-a", "/src/utils.rs")))
    assert(math.abs(adj("r1") - 0.90) < 1e-4)
    assert(math.abs(adj("r2") - 0.782) < 1e-3)        // 0.85 * 0.92
    assert(math.abs(adj("r3") - 0.80 * 0.8464) < 1e-3) // 0.80 * 0.92^2
  }

  // reference: source_diversity/tests.rs test_penalty_different_projects_no_penalty
  test("diversity penalty: distinct projects are never penalized") {
    val adj = penaltyOf(Seq(
      ("r1", 0.90, "proj-a", "/a/main.rs"),
      ("r2", 0.85, "proj-b", "/b/main.rs"),
      ("r3", 0.80, "proj-c", "/c/main.rs")))
    assert(adj("r1") == 0.90 && adj("r2") == 0.85 && adj("r3") == 0.80)
  }

  // reference: source_diversity/tests.rs test_penalty_reorders_results —
  // after penalties the list re-sorts: same1 > same2 > diff1 > same3.
  test("diversity penalty: re-sort interleaves penalized runs") {
    val ranked = Seq(
      ("same1", 0.90, "proj-a", "/src/main.rs"),
      ("same2", 0.89, "proj-a", "/src/main.rs"),
      ("same3", 0.88, "proj-a", "/src/main.rs"),
      ("diff1", 0.75, "proj-b", "/other/file.rs"))
      .toDF("id", "score", "project", "file")
      .select(col("id"), col("score"), col("file"), col("project"))
    val order = SparseSearch.applyDiversityPenalty(ranked)
      .orderBy(col("adj_score").desc, col("id"))
      .collect().map(_.getAs[String]("id")).toSeq
    assert(order == Seq("same1", "same2", "diff1", "same3"), order.mkString(","))
  }

  // penalty.rs state machine: a file-tier row does NOT reset the project
  // run (same file implies same project), and the project run resumes on
  // the next different-file same-project row.
  test("diversity penalty: project run survives intervening file-tier rows") {
    val adj = penaltyOf(Seq(
      ("r1", 0.90, "proj-a", "/f1"),
      ("r2", 0.85, "proj-a", "/f2"),   // P run 1 → 0.92
      ("r3", 0.80, "proj-a", "/f2"),   // F run 1 → 0.85
      ("r4", 0.75, "proj-a", "/f3")))  // P run 2 → 0.92^2
    assert(math.abs(adj("r2") - 0.85 * 0.92) < 1e-6)
    assert(math.abs(adj("r3") - 0.80 * 0.85) < 1e-6)
    assert(math.abs(adj("r4") - 0.75 * 0.92 * 0.92) < 1e-6)
  }

  // reference: embedding/tests.rs test_bm25_idf_common_vs_rare_terms —
  // 10 docs, "function" in all, "quantum" in one → rare term ranks the
  // doc containing it first.
  test("BM25: rare term outweighs common term (reference corpus)") {
    val docs = (0 until 10).map { i =>
      val text = if (i == 0) "function code quantum" else "function code"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val top = SparseSearch.bm25TopKDocs(spark, docs, "function quantum", 3).collect()
    assert(top.head.getLong(0) == 0L, "doc with the rare term must rank first")
  }

  // reference: embedding/tests.rs test_bm25_idf_zero_for_universal_terms —
  // a term present in EVERY doc has IDF clamped to 0, so a query of only
  // universal terms scores nothing.
  test("BM25: universal terms are clamped to zero score") {
    val docs = (0 until 5).map(i => (i.toLong, "thee code")).toDF("doc_id", "text")
    val top = SparseSearch.bm25TopKDocs(spark, docs, "thee code", 5).collect()
    assert(top.isEmpty, s"universal-term query must score 0 everywhere, got ${top.length} rows")
  }

  // reference: graph/algorithms/tests.rs test_pagerank_chain_scores_sum_to_one
  test("PageRank: chain graph scores sum to 1 and rank tail highest") {
    val edgeDf = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val pr = GraphAlgorithms.pageRankEdges(edgeDf, iterations = 30, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-3, s"sum = ${pr.values.sum}")
    assert(pr("d") > pr("c") && pr("c") > pr("b") && pr("b") > pr("a"),
      s"chain must rank downstream higher: $pr")
  }

  // reference: graph/algorithms/tests.rs test_pagerank_diamond — b and c
  // are symmetric, d collects both.
  test("PageRank: diamond graph symmetry (b == c, d highest)") {
    val edgeDf = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")).toDF("src", "dst")
    val pr = GraphAlgorithms.pageRankEdges(edgeDf, iterations = 30, damping = 0.85)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr("b") - pr("c")) < 1e-6)
    assert(pr("d") > pr("b") && pr("d") > pr("a"))
  }

  // reference: graph/algorithms/tests.rs test_communities_two_disconnected_clusters
  test("communities: two disconnected clusters get two labels") {
    val edgeDf = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1")).toDF("src", "dst")
    val cs = GraphAlgorithms.communitiesEdges(edgeDf, iterations = 10, minSize = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cs("a1") == cs("a2") && cs("a2") == cs("a3"))
    assert(cs("b1") == cs("b2") && cs("b2") == cs("b3"))
    assert(cs("a1") != cs("b1"))
  }

  // reference: client/src/search/expansion.rs merge_sparse_vectors —
  // expansion entries only added when absent, scaled by the weight.
  test("sparse expansion merge: add-if-absent at weight 0.5") {
    val merged = SparseSearch.mergeSparseVectors(
      Map("a" -> 1.0, "b" -> 2.0), Map("b" -> 9.0, "c" -> 4.0), 0.5)
    assert(merged == Map("a" -> 1.0, "b" -> 2.0, "c" -> 2.0))
  }

  private def betweennessBothPaths(edges: Seq[(String, String)],
                                   maxSamples: Int): (Map[String, Double], Map[String, Double]) = {
    val e = edges.toDF("src", "dst")
    def run(budget: Long) =
      GraphAlgorithms.betweennessEdges(spark, e, maxSamples, budget)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // Large budget → broadcast path; zero budget → forces the
    // fully-distributed frontier path on the same graph.
    (run(256L << 20), run(0L))
  }

  // reference: betweenness.rs test_betweenness_chain_middle_higher —
  // chain 0-1-2-3-4. Exact normalized scores: raw(n1)=raw(n3)=6,
  // raw(n2)=8, normalizer (5-1)(5-2)/2=6, clamped at 1.0.
  test("betweenness: chain parity — broadcast and frontier paths agree exactly") {
    val chain = Seq("n0" -> "n1", "n1" -> "n2", "n2" -> "n3", "n3" -> "n4")
    val (bc, fr) = betweennessBothPaths(chain, maxSamples = 64)
    val expected = Map("n0" -> 0.0, "n1" -> 1.0, "n2" -> 1.0, "n3" -> 1.0, "n4" -> 0.0)
    assert(bc == expected, s"broadcast path: $bc")
    assert(fr == expected, s"frontier path: $fr")
  }

  // reference: betweenness.rs test_betweenness_with_sampling — k=2
  // sources on the chain. Sample scale n/k=2.5: raw(n3)=2 →
  // 2·2.5/6 = 0.833333 (un-clamped, so this pins the normalizer).
  test("betweenness: sampled chain (k=2) applies the n/k sample scale on both paths") {
    val chain = Seq("n0" -> "n1", "n1" -> "n2", "n2" -> "n3", "n3" -> "n4")
    val (bc, fr) = betweennessBothPaths(chain, maxSamples = 2)
    assert(bc == fr, s"paths disagree: broadcast=$bc frontier=$fr")
    assert(bc("n3") == 0.833333, s"expected sample-scaled 0.833333, got ${bc("n3")}")
    assert(bc("n0") == 0.0 && bc("n4") == 0.0)
  }

  // reference: betweenness.rs test_betweenness_bridge_node_higher — two
  // triangles {0,1,2} and {3,4,5} with bridge 1-3.
  test("betweenness: bridge nodes outrank triangle interiors on both paths") {
    val tri = Seq(
      "n0" -> "n1", "n0" -> "n2", "n1" -> "n2",
      "n3" -> "n4", "n3" -> "n5", "n4" -> "n5",
      "n1" -> "n3")
    val (bc, fr) = betweennessBothPaths(tri, maxSamples = 64)
    assert(bc == fr, s"paths disagree: broadcast=$bc frontier=$fr")
    assert(bc("n1") > bc("n0") && bc("n3") > bc("n4"),
      s"bridge endpoints must outrank interiors: $bc")
  }

  // reference: storage/search.rs:368 — RRF hand-computed fusion.
  test("RRF formula: w/(60+rank) summed per id (hand-computed vector)") {
    // dense ranks: x=1, y=2; sparse ranks: y=1, z=2 (weights 1.0)
    val expected = Map(
      "x" -> 1.0 / 61.0,
      "y" -> (1.0 / 62.0 + 1.0 / 61.0),
      "z" -> 1.0 / 62.0)
    // y must fuse highest, then x, then z
    val order = expected.toSeq.sortBy(-_._2).map(_._1)
    assert(order == Seq("y", "x", "z"))
    assert(math.abs(expected("y") - 0.0325291) < 1e-5)
  }
}
