package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** corpus_pipeline — the composed training-data pipeline ledger. */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("cleanedTextOf and boilerplateLinesOf cannot drift: md5 + counts agree") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
    val rewrite = Boilerplate.cleanedTextOf(docs, 3)
      .select(col("doc_id"), md5(col("text")).as("m"),
        col("n_lines"), col("boiler_lines"))
    val report = Boilerplate.boilerplateLinesOf(docs, 3)
      .select(col("doc_id"), col("cleaned_md5").as("m"),
        col("n_lines"), col("boiler_lines"))
    assert(rewrite.orderBy(col("doc_id")).collect().toSeq ==
      report.orderBy(col("doc_id")).collect().toSeq,
      "the rewrite form's cleaned text must hash to the report form's cleaned_md5")
  }

  test("ledger invariants on the corpus: funnel discipline, packing tiling, sampling") {
    val rows = CorpusPipeline.corpusPipeline(spark, sfDir).collect()
    val nCand = Tables.documents(spark, sfDir).filter(col("doc_id") >= 50).count()
    assert(rows.length == nCand, "one ledger row per candidate doc")

    case class L(docId: Long, repKeep: Long, lmKeep: Long, cont: Long,
                 clusterId: Long, clusterSize: Long, dupKept: Long,
                 finalKeep: Long, nTokens: Long, seqFirst: Long,
                 seqLast: Long, tokOff: Long, sampleRank: Long)
    val ls = rows.map(r => L(r.getLong(0), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
      r.getLong(10), r.getLong(11), r.getLong(12), r.getLong(13), r.getLong(14)))

    for (l <- ls) {
      val gated = l.repKeep == 1 && l.lmKeep == 1
      assert((l.cont >= 0) == gated,
        s"doc ${l.docId}: contamination evaluated iff both gates passed")
      val surv = gated && l.cont == 0
      assert((l.dupKept >= 0) == surv && (l.clusterId >= 0) == surv,
        s"doc ${l.docId}: dedup evaluated iff uncontaminated survivor")
      assert((l.finalKeep == 1) == (l.dupKept == 1),
        s"doc ${l.docId}: final_keep is exactly the dedup keep verdict")
      assert((l.nTokens > 0) == (l.finalKeep == 1),
        s"doc ${l.docId}: packed iff finally kept")
      assert((l.sampleRank >= 1) <= (l.finalKeep == 1),
        s"doc ${l.docId}: only final keeps are sampled")
      if (l.clusterSize > 0)
        assert(l.clusterSize >= 2, s"doc ${l.docId}: real clusters have >= 2 members")
    }

    // packing tiling: reconstruct each kept doc's global stream offset
    // from (seq_first, tok_off) and assert the offsets are exactly the
    // running prefix sum of token counts in doc_id order — an
    // end-to-end check the oracle's window can't fake.
    val kept = ls.filter(_.finalKeep == 1).sortBy(_.docId)
    assert(kept.nonEmpty, "pipeline keeps at least one doc at this SF")
    var st = 0L
    for (l <- kept) {
      assert(l.seqFirst * 512 + l.tokOff == st,
        s"doc ${l.docId}: stream offset ${l.seqFirst * 512 + l.tokOff} != prefix sum $st")
      assert(l.seqLast == (st + l.nTokens - 1) / 512,
        s"doc ${l.docId}: seq_last mismatch")
      st += l.nTokens
    }

    // per-source audit sample: ranks 1..quota, each at most once
    val bySrc = rows.filter(_.getLong(14) >= 1)
    assert(bySrc.nonEmpty, "the audit sample is non-empty")
    assert(bySrc.forall(_.getLong(14) <= 25), "sample ranks bounded by the quota")
  }

  test("corpus_pipeline_fast: dual-path agreement with the md5 flagship ledger") {
    // The production composition (xxhash64 pair family) has no DuckDB
    // oracle BY DESIGN (§5: murmur3/xxhash64 are not
    // DuckDB-reproducible; re-oracling the fast hashes would test the
    // port). Its certificate is THIS dual-path check against the
    // hash-green flagship: every pair-family-INDEPENDENT column must be
    // bit-identical, and the family-dependent verdicts must agree
    // outside the families' legitimate borderline band (different hash
    // families flip candidate pairs whose Jaccard sits at the
    // threshold — the same adjudication as dedup_minhash vs its md5
    // twin in DedupSpec).
    val slow = CorpusPipeline.corpusPipeline(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val fast = CorpusPipeline.corpusPipelineFast(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(slow.keySet == fast.keySet, "one ledger row per candidate doc, both paths")

    // columns upstream of (or independent from) the pair family:
    // n_lines, boiler_lines, rep_keep, lm_keep, contaminated
    for ((id, s) <- slow; f = fast(id); i <- Seq(1, 2, 3, 4, 5))
      assert(s.getLong(i) == f.getLong(i),
        s"doc $id col $i: pair-family-independent columns must be bit-identical " +
          s"(slow ${s.getLong(i)} fast ${f.getLong(i)})")

    // family-dependent verdicts: docs BOTH paths leave unclustered are
    // trivially kept by both; overall keep agreement carries the
    // DedupSpec recall floor between the two minhash families.
    val survivors = slow.keys.filter(id => slow(id).getLong(8) >= 0).toSeq
    assert(survivors.nonEmpty, "the funnel reaches the dedup stage at this SF")
    for (id <- survivors
         if slow(id).getLong(7) == 0 && fast(id).getLong(7) == 0)
      assert(slow(id).getLong(8) == 1 && fast(id).getLong(8) == 1,
        s"doc $id: unclustered docs are kept on both paths")
    val agree = survivors.count(id => slow(id).getLong(8) == fast(id).getLong(8))
    assert(agree.toDouble / survivors.size >= 0.9,
      s"dup-keep agreement ${agree.toDouble / survivors.size} below the 0.9 floor " +
        s"($agree/${survivors.size})")

    // docs kept by BOTH paths tokenize identically (token counts are
    // text-only); stream offsets/sample ranks legitimately differ with
    // the keep set, so they are covered by the fast path's own
    // invariants below, not cross-path equality.
    val commonKeeps = survivors.filter(id =>
      slow(id).getLong(9) == 1 && fast(id).getLong(9) == 1)
    assert(commonKeeps.nonEmpty, "the two paths share final keeps")
    for (id <- commonKeeps)
      assert(slow(id).getLong(10) == fast(id).getLong(10),
        s"doc $id: n_tokens must match for docs kept by both paths")

    // fast-path self-invariants: funnel discipline + the packing
    // prefix-sum tiling, re-run on the fast path's own keep set.
    for ((id, f) <- fast) {
      val gated = f.getLong(3) == 1 && f.getLong(4) == 1
      assert((f.getLong(5) >= 0) == gated, s"doc $id: fast-path funnel discipline")
      val surv = gated && f.getLong(5) == 0
      assert((f.getLong(8) >= 0) == surv, s"doc $id: fast-path dedup attribution")
      assert((f.getLong(9) == 1) == (f.getLong(8) == 1), s"doc $id: fast final_keep")
    }
    val keptF = fast.values.filter(_.getLong(9) == 1).toSeq.sortBy(_.getLong(0))
    var st = 0L
    for (f <- keptF) {
      assert(f.getLong(11) * 512 + f.getLong(13) == st,
        s"doc ${f.getLong(0)}: fast-path stream offset != prefix sum $st")
      st += f.getLong(10)
    }
  }

  test("corpus_pipeline_fast_capped: dual-path agreement with the uncapped fast ledger") {
    // The decade-3 production composition (W=8 capped pair family,
    // registered round 12). Same certificate shape as the fast-vs-
    // flagship check: columns upstream of the pair family bit-identical
    // to the uncapped fast path's (stages 1-3 share code paths exactly,
    // so any diff is a wiring bug), dup-keep agreement >= 0.9 on the
    // survivors (the capped family's chain-break caveat makes this a
    // measured floor), and the funnel/packing self-invariants re-run on
    // the capped path's own keep set.
    val fast = CorpusPipeline.corpusPipelineFast(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val capped = CorpusPipeline.corpusPipelineFastCapped(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(fast.keySet == capped.keySet, "one ledger row per candidate doc, both paths")

    for ((id, s) <- fast; c = capped(id); i <- Seq(1, 2, 3, 4, 5))
      assert(s.getLong(i) == c.getLong(i),
        s"doc $id col $i: pair-family-independent columns must be bit-identical " +
          s"(fast ${s.getLong(i)} capped ${c.getLong(i)})")

    val survivors = fast.keys.filter(id => fast(id).getLong(8) >= 0).toSeq
    assert(survivors.nonEmpty, "the funnel reaches the dedup stage at this SF")
    // the capped pair set is a SUBSET of the uncapped one (DedupSpec),
    // so a doc BOTH paths leave unclustered is kept by both; and a doc
    // the capped path clusters, the uncapped path must cluster too.
    for (id <- survivors) {
      if (fast(id).getLong(7) == 0)
        assert(capped(id).getLong(7) == 0,
          s"doc $id: capped path clustered a doc the uncapped path left unclustered")
      if (fast(id).getLong(7) == 0 && capped(id).getLong(7) == 0)
        assert(fast(id).getLong(8) == 1 && capped(id).getLong(8) == 1,
          s"doc $id: unclustered docs are kept on both paths")
    }
    val agree = survivors.count(id => fast(id).getLong(8) == capped(id).getLong(8))
    assert(agree.toDouble / survivors.size >= 0.9,
      s"dup-keep agreement ${agree.toDouble / survivors.size} below the 0.9 floor " +
        s"($agree/${survivors.size})")

    for ((id, c) <- capped) {
      val gated = c.getLong(3) == 1 && c.getLong(4) == 1
      assert((c.getLong(5) >= 0) == gated, s"doc $id: capped-path funnel discipline")
      val surv = gated && c.getLong(5) == 0
      assert((c.getLong(8) >= 0) == surv, s"doc $id: capped-path dedup attribution")
      assert((c.getLong(9) == 1) == (c.getLong(8) == 1), s"doc $id: capped final_keep")
    }
    val keptC = capped.values.filter(_.getLong(9) == 1).toSeq.sortBy(_.getLong(0))
    assert(keptC.nonEmpty, "the capped path keeps documents")
    var stc = 0L
    for (c <- keptC) {
      assert(c.getLong(11) * 512 + c.getLong(13) == stc,
        s"doc ${c.getLong(0)}: capped-path stream offset != prefix sum $stc")
      stc += c.getLong(10)
    }
  }

  test("fixture: every funnel arm is reachable and correctly attributed") {
    // evalMax=2: docs 0,1 are the benchmark. dfThreshold=2 so the
    // shared FOOTER line in two source-a docs is boilerplate.
    val docs = Seq(
      // benchmark doc: its word-3-gram "omega sigma theta" contaminates doc 6
      (0L, "a", "omega sigma theta marker one"),
      (1L, "a", "benchmark filler two"),
      // 2: clean survivor (common words keep its lm score high)
      (2L, "a", "the fox and the dog\nFOOTER"),
      // 3: near-dup pair with 4 (long shared text), FOOTER boilerplate
      (3L, "a", "the quick brown fox jumps over the lazy dog again and again tonight\nFOOTER"),
      (4L, "a", "the quick brown fox jumps over the lazy dog again and again tonite"),
      // 5: repetition-gate failure (duplicate 3-grams dominate)
      (5L, "b", "spam spam spam spam spam spam spam spam"),
      // 6: contaminated — carries the benchmark 3-gram amid common words
      (6L, "b", "the omega sigma theta and the dog"),
      // 7: lm-gate failure — all words OOV singletons under a tiny vocab
      (7L, "b", "zzq wwk vvx uuy ttz rrq qqp oon"))
      .toDF("doc_id", "source", "text")

    val out = CorpusPipeline.corpusPipelineOf(docs.localCheckpoint(),
      evalMax = 2L, dfThreshold = 2, vocabSize = 8, lmThreshold = -1.45,
      ngram = 3, bands = 12, rowsPerBand = 3, jaccardThreshold = 0.6,
      seqLen = 5, quota = 1)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out.keySet == Set(2L, 3L, 4L, 5L, 6L, 7L), "candidates only")

    // doc 2: boilerplate counted, all gates pass, kept, packed, sampled
    val d2 = out(2L)
    assert(d2.getLong(2) == 1, "doc 2 FOOTER line is boilerplate")
    assert(d2.getLong(3) == 1 && d2.getLong(4) == 1, "doc 2 passes both gates")
    assert(d2.getLong(5) == 0 && d2.getLong(9) == 1, "doc 2 clean and kept")
    assert(d2.getLong(10) == 5, "doc 2 packs its 5 cleaned tokens")

    // docs 3/4: near-dup cluster — 3's cleaned text (FOOTER removed)
    // equals 4's text except the last word, so their shingle Jaccard
    // clears 0.6; exactly one representative survives.
    val (d3, d4) = (out(3L), out(4L))
    assert(d3.getLong(6) == d4.getLong(6) && d3.getLong(6) > 0,
      "docs 3 and 4 share a near-dup cluster")
    assert(d3.getLong(7) == 2 && d4.getLong(7) == 2, "cluster size 2")
    assert(d3.getLong(9) + d4.getLong(9) == 1, "exactly one of the pair is kept")

    // doc 5: repetition gate fails, funnel stops (sentinels from there)
    val d5 = out(5L)
    assert(d5.getLong(3) == 0, "doc 5 fails the repetition gate")
    assert(d5.getLong(5) == -1 && d5.getLong(8) == -1 && d5.getLong(10) == -1,
      "doc 5 never reaches decontamination, dedup, or packing")

    // doc 6: gates pass, flagged contaminated, funnel stops
    val d6 = out(6L)
    assert(d6.getLong(3) == 1 && d6.getLong(4) == 1, "doc 6 passes the gates")
    assert(d6.getLong(5) == 1, "doc 6 shares a benchmark 3-gram")
    assert(d6.getLong(8) == -1 && d6.getLong(9) == 0, "doc 6 is dropped before dedup")

    // doc 7: lm gate fails (OOV floor under the tiny vocab)
    val d7 = out(7L)
    assert(d7.getLong(4) == 0, "doc 7 fails the lm gate")
    assert(d7.getLong(5) == -1, "doc 7 never reaches decontamination")

    // sampling: quota 1 per source over final keeps
    val sampled = out.values.filter(_.getLong(14) >= 1).toSeq
    assert(sampled.forall(_.getLong(14) == 1) && sampled.nonEmpty,
      "per-source quota-1 sample over the keeps")
  }
}
