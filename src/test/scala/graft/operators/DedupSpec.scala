package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {

  test("dedup_exact maps every doc to itself when corpus has no dupes") {
    val rows = Dedup.dedupExact(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("canonical_id") == r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("is_dup") == 0)
    }
  }

  test("ngram_jaccard pairs match a driver-side recomputation") {
    val got = Dedup.ngramJaccard(spark, sfDir, probeMax = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val texts = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def grams(s: String): Set[String] = s.sliding(3).toSet
    for (a <- texts.keys; b <- texts.keys if a < b) {
      val (ga, gb) = (grams(texts(a)), grams(texts(b)))
      val j = (ga intersect gb).size.toDouble / (ga union gb).size
      if (j >= 0.5)
        assert(math.abs(got((a, b)) - j) < 1e-3, s"pair ($a,$b)")
      else assert(!got.contains((a, b)), s"pair ($a,$b) should be below threshold")
    }
  }

  test("dedup_simhash_lsh: exact subset of the radius-complete pair set, recall floor 0.9") {
    // The recall-trading bit-sampling LSH (Indyk-Motwani) against the
    // pigeonhole radius-complete twin at the same radius and hash
    // family: the verify stage makes every LSH pair a true within-
    // radius pair (subset), and the 24-table/16-bit configuration's
    // theoretical recall at h=7 is 1-(1-C(53,16)/C(60,16))^24 ~ 0.97;
    // measured on this corpus: 306/316 = 0.968. Floor pinned at 0.9.
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairSet(Dedup.dedupSimhashOracleOf(docs))
    val lsh = pairSet(Dedup.dedupSimhashLshOf(docs))
    assert(lsh.subsetOf(full), "LSH pairs must all be true within-radius pairs")
    assert(full.nonEmpty && lsh.size >= 0.9 * full.size,
      s"recall ${lsh.size.toDouble / full.size} below the 0.9 floor " +
        s"(${lsh.size}/${full.size})")
    // The decade-3 key-width point (w=20, t=64): candidate tail
    // 64·n²/2^20 — 6× below the registered config's 24·n²/2^16 — at
    // analytic h=7 worst-case recall 1−(1−C(53,20)/C(60,20))^64 ≈
    // 0.958 (hypergeometric: a table misses a pair iff its 20 sampled
    // positions all avoid the ≤7 flipped bits). Real corpora sit above
    // the worst case (most true pairs have h < 7). Same 0.9 floor.
    val wide = pairSet(Dedup.dedupSimhashLshOf(docs,
      maxHamming = 7, tables = 64, bitsPerTable = 20))
    assert(wide.subsetOf(full), "wide-key LSH pairs must be within radius")
    assert(wide.size >= 0.9 * full.size,
      s"wide-key recall ${wide.size.toDouble / full.size} below the 0.9 floor " +
        s"(${wide.size}/${full.size})")
  }

  test("bucket-window-capped minhash: verified subset, cluster keep-set agreement") {
    // The W-capped fast family (the decade-3 one-box form — candidates
    // k·W per bucket instead of k²): every emitted pair must be a pair
    // the full family also emits with the same jaccard (the verify
    // stage is shared, so the cap can only REMOVE candidates), and the
    // clustering consumer's keep/drop decisions over the capped pairs
    // must agree with the full family's on ≥90 % of clustered docs
    // (inside one true cluster the W-overlap chain keeps members
    // connected; disagreement is confined to bucket-straddling edges).
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = pairs(Dedup.dedupMinhashOf(docs))
    val capped = pairs(Dedup.dedupMinhashCappedOf(docs, window = 2))
    assert(capped.nonEmpty, "capped family finds pairs on this corpus")
    for ((k, j) <- capped)
      assert(full.get(k).contains(j), s"capped pair $k not in the full pair set")
    val prio = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("keep_rank"))
    def keeps(p: org.apache.spark.sql.DataFrame) =
      Dedup.dedupClustersOf(p.select(col("a"), col("b")), prio)
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val kf = keeps(Dedup.dedupMinhashOf(docs))
    val kc = keeps(Dedup.dedupMinhashCappedOf(docs, window = 2))
    val commonDocs = kf.keySet intersect kc.keySet
    assert(commonDocs.nonEmpty)
    val agree = commonDocs.count(d => kf(d) == kc(d))
    assert(agree.toDouble / commonDocs.size >= 0.9,
      s"keep agreement ${agree.toDouble / commonDocs.size} below 0.9 " +
        s"($agree/${commonDocs.size})")
  }

  test("capped md5 oracle twin: verified subset of the full md5 pair set, cap binds") {
    // dedup_minhash_capped_oracle (registered round 12, hard DuckDB
    // oracle) must relate to dedup_minhash_oracle exactly as the
    // xxhash64 capped form relates to its full family: every capped
    // pair is a full-family pair with the SAME verified jaccard (the
    // W-window can only remove candidates), and at a tight window the
    // cap actually removes cross-rep pairs on this corpus (a cap that
    // never binds certifies nothing).
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = pairs(Dedup.dedupMinhashOracleOf(docs))
    val capped = pairs(Dedup.dedupMinhashCappedOracleOf(docs, window = 2))
    assert(capped.nonEmpty, "capped md5 twin finds pairs on this corpus")
    for ((k, j) <- capped)
      assert(full.get(k).contains(j),
        s"capped md5 pair $k (j=$j) not in the full md5 pair set")
    assert(capped.size < full.size,
      s"window=2 must bind on this corpus (capped ${capped.size} = full ${full.size})")
  }

  test("multi-pass capped minhash: deterministic superset of single-pass, " +
    "independent seeds recover coverage, twin families agree on the relation") {
    // The passes knob (round 13): P independent band-seed passes over
    // one shingle scan. Contract pins — (1) SUPERSET: every P=1 pair
    // appears in the P=2 set with the same verified jaccard (candidates
    // are the union of per-pass W-window sets and the estimate takes
    // the max over passes, so adding a pass can only ADD pairs);
    // (2) the pass actually RECOVERS pairs at a tight window on this
    // corpus (a knob that never binds certifies nothing); (3) the md5
    // twin — whose generated DuckDB oracle is the verify-gate
    // certificate — satisfies the same relation, so the cross-engine
    // certification covers the arithmetic this spec pins.
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val p1 = pairs(Dedup.dedupMinhashCappedOf(docs, window = 2))
    val p2 = pairs(Dedup.dedupMinhashCappedOf(docs, window = 2, passes = 2))
    for ((k, j) <- p1)
      assert(p2.get(k).contains(j),
        s"P=1 pair $k (j=$j) missing from the P=2 set — superset violated")
    assert(p2.size > p1.size,
      s"passes=2 must recover pairs at window=2 on this corpus " +
        s"(P=2 ${p2.size} vs P=1 ${p1.size})")
    p2.values.foreach(j => assert(j >= 0.6, "multi-pass pair below threshold"))
    val q1 = pairs(Dedup.dedupMinhashCappedOracleOf(docs, window = 2))
    val q2 = pairs(Dedup.dedupMinhashCappedOracleOf(docs, window = 2, passes = 2))
    for ((k, j) <- q1)
      assert(q2.get(k).contains(j),
        s"md5 twin: P=1 pair $k missing from the P=2 set — superset violated")
    assert(q2.size >= q1.size)
  }

  test("dedup_minhash finds high-jaccard pairs and verifies them exactly") {
    val rows = Dedup.dedupMinhash(spark, sfDir).collect()
    assert(rows.nonEmpty, "expected near-dup pairs in this self-similar corpus")
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.6)
      assert(r.getLong(0) < r.getLong(1))
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.distinct.length == pairs.length)
  }

  // The exact-dup pre-pass (LSH on canonical reps + group expansion)
  // must be invisible in the output: duplicating documents adds exactly
  // the implied pairs (dup<->original at jaccard 1.0, dup<->every
  // partner of the original at the original's jaccard) and changes
  // nothing else.
  test("dedup_minhash: exact-dup pre-pass expansion matches all-members semantics") {
    val base = Tables.documents(spark, sfDir).filter(col("doc_id") < 120)
      .select(col("doc_id"), col("text"))
    val withoutDups = Dedup.dedupMinhashOf(base).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // duplicate docs 0..9 under ids 10000..10009
    val dups = base.filter(col("doc_id") < 10)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
    val got = Dedup.dedupMinhashOf(base.unionByName(dups)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = scala.collection.mutable.Map[(Long, Long), Double]()
    expected ++= withoutDups
    for (d <- 0L until 10L) {
      expected((d, d + 10000L)) = 1.0 // dup of original
      // dup inherits every partnership of its original
      for (((a, b), j) <- withoutDups) {
        if (a == d) expected((math.min(b, d + 10000L), math.max(b, d + 10000L))) = j
        if (b == d) expected((math.min(a, d + 10000L), math.max(a, d + 10000L))) = j
      }
      // dups of two paired originals pair with each other too
      for (e <- 0L until 10L if d < e && withoutDups.contains((d, e)))
        expected((d + 10000L, e + 10000L)) = withoutDups((d, e))
    }
    assert(got == expected.toMap,
      s"extra=${(got.keySet -- expected.keySet).take(5)} " +
        s"missing=${(expected.keySet -- got.keySet).take(5)}")
  }

  // Recall FLOOR at 0.9 — load-bearing since the round-9 coefficient
  // fix (Dedup.minhashCoeffs scaladoc): the small-multiplier family
  // measured 0.744 full-corpus recall vs brute-force truth where
  // MinHash theory promises ~0.95; full-range multipliers measure
  // 0.953 (xxhash64 values) / 0.994 (md5-nibble values) at sf0.01,
  // with zero false positives (exact verify). A future regression of
  // the hash family below theory fails here.
  test("dedup_minhash recall vs exact ngram pairs stays above 0.9") {
    val exact = Dedup.ngramJaccard(spark, sfDir, probeMax = 50L, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Dedup.dedupMinhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = (exact intersect approx).size.toDouble / exact.size
      assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
    }
  }

  // graft_shingle_hashes (one-pass byte-level expression) must equal
  // the composed sequence→substr→xxhash64→distinct→sort column on the
  // real corpus, plus its short-string corners.
  test("dedup_minhash: shingle-hash expression equals the composed form") {
    import spark.implicits._
    val composed = org.apache.spark.sql.functions.expr(
      "array_sort(array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)), i -> xxhash64(substr(text, i, 3)))))")
    val corpus = Tables.documents(spark, sfDir).select(col("text"))
      .unionByName(Seq("", "a", "ab", "abc", "ααβγδ", "aaaa").toDF("text"))
    val rows = corpus
      .select(graft.GraftFunctions.shingleHashes(col("text")).as("e"),
        composed.as("c"))
      .filter(not(col("e") <=> col("c")))
      .count()
    assert(rows == 0L)
  }

  // graft minhash signature (one-traversal expression) must equal the
  // composed array_min(transform(...)) per position, on the real
  // corpus's hashed shingle arrays.
  test("dedup_minhash: signature expression equals per-position array_min") {
    val shingles = org.apache.spark.sql.functions.expr(
      "array_distinct(transform(sequence(1, greatest(length(text) - 2, 1)), i -> substr(text, i, 3)))")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        array_sort(array_distinct(transform(shingles, s => xxhash64(s)))).as("sh"))
      .filter(size(col("sh")) > 0)
    val coeffs = Dedup.minhashCoeffs(36)
    val p = 2147483647L
    val composedCols = coeffs.toSeq.map { case (a, b) =>
      array_min(transform(col("sh"), h => pmod(pmod(h, lit(p)) * a + b, lit(p))))
    }
    val viaExpr = docs.select(col("doc_id"),
      graft.GraftFunctions.minhashSignature(col("sh"),
        coeffs.map(_._1), coeffs.map(_._2)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val viaComposed = docs.select(col("doc_id"),
      array(composedCols: _*).cast("array<int>").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(viaExpr == viaComposed)
  }

  // graft_simhash64 (one-pass map-side expression) must equal the
  // explode → per-bit ±1 sum → sign aggregation it replaced,
  // bit-for-bit, on the real corpus.
  test("dedup_simhash: expression signature equals the aggregation formulation") {
    import graft.functions.TextFunctions.tokenizeSimple
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenizeSimple(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val viaExpr = docs.select(col("doc_id"),
      graft.GraftFunctions.simhash64(col("toks")).as("simhash"))
    val bitCols = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
    }
    val viaAgg = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
      .groupBy(col("doc_id"))
      .agg(bitCols.head.as("b0"),
        bitCols.tail.zipWithIndex.map { case (c, i) => c.as(s"b${i + 1}") }: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << j))
          .reduce(_ + _).as("simhash"))
    val e = viaExpr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = viaAgg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e == a, s"first diff: ${e.find { case (k, v) => a.get(k) != Some(v) }}")
  }

  test("dedup_simhash pairs are within the hamming budget and symmetric-free") {
    val rows = Dedup.dedupSimhash(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getInt(2) <= 7)
      assert(r.getLong(0) < r.getLong(1))
    }
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.distinct.length == pairs.length)
  }

  // The pigeonhole blocking is parametric in the radius (maxHamming+1
  // disjoint chunks, wider chunks at tighter radii): the pair set must
  // equal the brute-force n² hamming join at EVERY radius, not just the
  // default 8×8-bit shape.
  test("simhash blocking is radius-complete at non-default radii (brute-force parity)") {
    import graft.functions.TextFunctions.tokenizeSimple
    val sims = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenizeSimple(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), graft.GraftFunctions.simhash64(col("toks")).as("simhash"))
    val l = sims.select(col("doc_id").as("a"), col("simhash").as("sa"))
    val r = sims.select(col("doc_id").as("b"), col("simhash").as("sb"))
    for (h <- Seq(0, 3, 7, 11)) {
      val blocked = Dedup.dedupSimhash(spark, sfDir, maxHamming = h)
        .select(col("a"), col("b"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val brute = l.crossJoin(r).filter(col("a") < col("b"))
        .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= h)
        .select(col("a"), col("b"))
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(blocked == brute, s"radius $h: blocked pair set != brute force")
    }
  }

  // The md5-nibble oracle twin (dedup_simhash_oracle): the
  // graft_simhash_bits expression must equal the explode → per-bit ±1
  // sum → sign aggregation over the SAME md5-derived hashes,
  // bit-for-bit, on the real corpus (the SimHash64 parity pin, for the
  // precomputed-hash variant).
  test("dedup_simhash_oracle: simhash_bits equals the aggregation formulation") {
    import graft.functions.TextFunctions.tokenizeSimple
    val hashExpr = "CAST(conv(substr(md5(tok), 1, 15), 16, 10) AS BIGINT)"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokenizeSimple(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
    val viaExpr = docs.select(col("doc_id"),
      graft.GraftFunctions.simhashBits(
        expr(s"transform(toks, t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT))"))
        .as("simhash"))
    val bitCols = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
    }
    val viaAgg = docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("h", expr(hashExpr))
      .groupBy(col("doc_id"))
      .agg(bitCols.head.as("b0"),
        bitCols.tail.zipWithIndex.map { case (c, i) => c.as(s"b${i + 1}") }: _*)
      .select(col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L)).otherwise(lit(0L)) * lit(1L << j))
          .reduce(_ + _).as("simhash"))
    val e = viaExpr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = viaAgg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e == a, s"first diff: ${e.find { case (k, v) => a.get(k) != Some(v) }}")
  }

  // Cross-variant contract, MEASURED (round-9 adjudication): the two
  // hash families (xxhash64 fast path vs md5-nibble oracle path) agree
  // wherever the signal is unambiguous — identical token MULTISETS
  // give hamming 0 under both (simhash is order-invariant, so both
  // must pair such docs) — but their hamming-≤7 pair sets legitimately
  // DIFFER on borderline pairs (different random projections ⇒
  // different noise: at sf0.01, 408 xxhash64 pairs vs 316 md5 pairs
  // with 37 shared; at hamming ≤ 2, 13 vs 13 with 8 shared). The
  // operator contract is per-hash-family; the oracle-gated registered
  // variant is the md5 one, and this spec pins the unambiguous core
  // rather than asserting an equivalence that is measurably false.
  test("dedup_simhash variants: identical token multisets pair at hamming 0 in both") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta theta kappa"),
      (2L, "zeta epsilon delta gamma beta alpha kappa theta"),
      (3L, "alpha beta gamma delta epsilon omega sigma phi")
    ).toDF("doc_id", "text")
    val oraclePairs = Dedup.dedupSimhashOracleOf(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(oraclePairs.get((1L, 2L)) == Some(0),
      s"md5 variant must pair the identical-multiset docs at 0: $oraclePairs")
    // fast path: equal xxhash64 simhashes for the same multiset
    import graft.functions.TextFunctions.tokenizeSimple
    val sims = docs
      .select(col("doc_id"), graft.GraftFunctions.simhash64(
        tokenizeSimple(col("text"))).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) == sims(2L))
    assert(sims(1L) != sims(3L))
  }

  test("dedup_embedding returns the 20 most-similar pairs ranked") {
    val rows = Dedup.dedupEmbedding(spark, sfDir).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getInt(2)).toSeq == (1 to 20))
  }

  test("dedup_clusters: fixture components, sizes, and keep rule") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val prio = Seq((1L, 10L), (2L, 30L), (3L, 30L), (5L, 5L), (6L, 9L))
      .toDF("doc_id", "keep_rank")
    val rows = Dedup.dedupClustersOf(pairs, prio).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 5L, 6L))
    // component {1,2,3}: cluster_id 1, size 3, kept = doc 2 (rank tie
    // 30/30 between 2 and 3 resolves to the lower doc_id)
    assert(rows(1L) == ((1L, 3L, 0)))
    assert(rows(2L) == ((1L, 3L, 1)))
    assert(rows(3L) == ((1L, 3L, 0)))
    // component {5,6}: kept = doc 6 (higher rank)
    assert(rows(5L) == ((5L, 2L, 0)))
    assert(rows(6L) == ((5L, 2L, 1)))
  }

  test("dedup_clusters: corpus invariants vs the registered pair set") {
    val pairs = Dedup.dedupMinhashOracle(spark, sfDir)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val out = Dedup.dedupClusters(spark, sfDir).collect()
    val cluster = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every near-dup pair is co-clustered
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    }
    // exactly one kept doc per cluster; cluster_id is the component min;
    // cluster_size counts the member rows
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.count(_.getInt(3) == 1) == 1, s"cluster $cid keep count")
      assert(members.map(_.getLong(0)).min == cid, s"cluster $cid id not min")
      assert(members.forall(_.getLong(2) == members.length), s"cluster $cid size")
    }
    // the kept doc maximizes text length (ties to the lowest doc_id)
    val lens = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (cid, members) =>
      val kept = members.find(_.getInt(3) == 1).get.getLong(0)
      val best = members.map(_.getLong(0)).sortBy(d => (-lens(d), d)).head
      assert(kept == best, s"cluster $cid kept $kept, expected $best")
    }
  }

  // The budget gate must be output-invariant: the driver union-find and
  // the distributed pointer-jumping propagation label every doc with
  // the same component minimum, so the full cluster output is
  // row-identical across paths.
  test("dedup_clusters: compact and distributed component paths agree") {
    def run(): Seq[(Long, Long, Long, Int)] =
      Dedup.dedupClusters(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val compact = run()
    sys.props("graft.forceDistributed") = "1"
    try {
      val distributed = run()
      assert(compact == distributed)
    } finally sys.props.remove("graft.forceDistributed")
  }
}
