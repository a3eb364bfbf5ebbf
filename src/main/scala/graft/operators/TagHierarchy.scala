package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical tag deduplication + 3-level hierarchy
  * (keyword_extraction/canonical_tags/mod.rs:18 `build_hierarchy`):
  * near-duplicate tags merge at similarity > 0.85 into level-3
  * canonical tags (greedy single-linkage, first tag claims its
  * look-alikes; label = member closest to the cluster centroid), then
  * average-linkage agglomerative clustering builds level 2 (threshold
  * 0.70) and level 1 (0.50), summing doc counts and re-labeling by
  * centroid proximity at every level (clustering.rs).
  *
  * Tag vectors: the reference embeds tag phrases with its embedding
  * service; this container has none, so the honest stand-in is each
  * tag's DOCUMENT-INCIDENCE vector (which doc carries the tag), whose
  * cosine is the same similarity the MMR tag selection already uses.
  * A production deployment swaps the incidence maps for real phrase
  * embeddings; the clustering core is vector-agnostic.
  *
  * Scale posture mirrors Leiden's: the cluster does the corpus-sized
  * work (tag extraction, incidence aggregation); the reference's
  * deliberately sequential hierarchy runs driver-side ONLY while the
  * estimated heap bytes of the collected vocabulary fit
  * `driverByteBudget` (the shared
  * [[GraphAlgorithms.estimatedAdjacencyBytes]] estimator). Past the
  * budget, [[tagHierarchyBucketed]] pre-merges near-duplicates inside
  * hash buckets EXECUTOR-side (each bucket sized to the budget) and
  * clusters only the top canonical representatives by doc count on the
  * driver — a documented approximation (cross-bucket near-duplicates
  * stay distinct; representatives past the collect cap root their own
  * hierarchy), never a wedged driver.
  */
object TagHierarchy {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  case class TagVec(phrase: String, vector: Map[Int, Double], docCount: Long)

  /** Sparse cosine (encoder-agnostic twin of semantic_rerank
    * cosine_similarity). */
  def cosine(a: Map[Int, Double], b: Map[Int, Double]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
    var dot = 0.0
    small.foreach { case (k, v) => dot += v * big.getOrElse(k, 0.0) }
    val na = math.sqrt(a.valuesIterator.map(v => v * v).sum)
    val nb = math.sqrt(b.valuesIterator.map(v => v * v).sum)
    val denom = na * nb
    if (denom > 0) dot / denom else 0.0
  }

  private def centroid(vs: Seq[Map[Int, Double]]): Map[Int, Double] = {
    val n = vs.size.toDouble
    vs.flatten.groupMapReduce(_._1)(_._2)(_ + _).map { case (k, s) => k -> s / n }
  }

  case class Canon(label: String, members: Seq[Int],
                   centroid: Map[Int, Double], docCount: Long)

  /** merge_duplicates (clustering.rs:10): greedy single-linkage at
    * `threshold`, label = member closest to centroid (ties keep the
    * LATER member — Rust's max_by returns the last maximum, mirrored
    * here by the (similarity, index) tuple max). */
  def mergeDuplicates(tags: IndexedSeq[TagVec], threshold: Double): Seq[Canon] = {
    val n = tags.length
    val assigned = Array.fill(n)(false)
    val clusters = scala.collection.mutable.ArrayBuffer[Seq[Int]]()
    for (i <- 0 until n if !assigned(i)) {
      val members = scala.collection.mutable.ArrayBuffer(i)
      assigned(i) = true
      for (j <- i + 1 until n if !assigned(j)) {
        if (cosine(tags(i).vector, tags(j).vector) > threshold) {
          members += j; assigned(j) = true
        }
      }
      clusters += members.toSeq
    }
    clusters.toSeq.map { members =>
      val c = centroid(members.map(m => tags(m).vector))
      val labelIdx = members.maxBy(m => (cosine(tags(m).vector, c), m))
      Canon(tags(labelIdx).phrase, members, c, members.map(m => tags(m).docCount).sum)
    }
  }

  /** cluster_tags (clustering.rs:83): average-linkage agglomerative
    * merging while the best pair's average similarity meets the
    * threshold. Returns (parents, parentOf) where parentOf(i) is the
    * parent index of input cluster i.
    *
    * Average linkage is maintained INCREMENTALLY: linkSum(i)(j) holds
    * the summed pairwise similarity of the two clusters' member
    * cross-product, which composes additively on merge
    * (Σ over (A∪B)×K = Σ over A×K + Σ over B×K), and the pair count is
    * |A|·|B| — so each iteration is one O(active²) scan of cached
    * averages instead of the reference's O(n²·|A|·|B|) member rescan.
    */
  def clusterLevel(inputs: IndexedSeq[Canon], threshold: Double): (Seq[Canon], Array[Int]) = {
    val n = inputs.length
    if (n == 0) return (Nil, Array.empty)
    val linkSum = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0.0 else cosine(inputs(i).centroid, inputs(j).centroid)
    }
    val sizes = Array.fill(n)(1L)
    val active = Array.fill(n)(true)
    val members = Array.tabulate(n)(i => scala.collection.mutable.ArrayBuffer(i))
    var nActive = n
    var go = true
    while (go) {
      var bestSim = Double.NegativeInfinity
      var bestA = -1; var bestB = -1
      for (i <- 0 until n if active(i); j <- i + 1 until n if active(j)) {
        val avg = linkSum(i)(j) / (sizes(i) * sizes(j))
        if (avg > bestSim) { bestSim = avg; bestA = i; bestB = j }
      }
      if (bestSim < threshold || bestA < 0) go = false
      else {
        for (k <- 0 until n if active(k) && k != bestA && k != bestB) {
          linkSum(bestA)(k) += linkSum(bestB)(k)
          linkSum(k)(bestA) = linkSum(bestA)(k)
        }
        members(bestA) ++= members(bestB)
        sizes(bestA) += sizes(bestB)
        active(bestB) = false
        nActive -= 1
        if (nActive <= 1) go = false
      }
    }
    val parentOf = new Array[Int](n)
    val out = scala.collection.mutable.ArrayBuffer[Canon]()
    for (i <- 0 until n if active(i)) {
      val ms = members(i).toSeq
      val c = centroid(ms.map(m => inputs(m).centroid))
      val labelIdx = ms.maxBy(m => (cosine(inputs(m).centroid, c), m))
      val parentIdx = out.length
      ms.foreach(m => parentOf(m) = parentIdx)
      out += Canon(inputs(labelIdx).label, ms, c, ms.map(m => inputs(m).docCount).sum)
    }
    (out.toSeq, parentOf)
  }

  /** build_hierarchy (mod.rs:18) over a tag vocabulary: returns one row
    * per ORIGINAL tag with its canonical level-3/2/1 labels.
    */
  def buildHierarchy(tags: IndexedSeq[TagVec],
                     mergeThreshold: Double = 0.85,
                     level2Threshold: Double = 0.70,
                     level1Threshold: Double = 0.50): Seq[(String, String, String, String, Long)] = {
    if (tags.isEmpty) return Nil
    val level3 = mergeDuplicates(tags, mergeThreshold).toIndexedSeq
    val (level2, p3) = clusterLevel(level3, level2Threshold)
    val (level1, p2) = clusterLevel(level2.toIndexedSeq, level1Threshold)
    level3.indices.flatMap { ci =>
      val l3 = level3(ci)
      val l2 = level2(p3(ci))
      val l1 = level1(p2(p3(ci)))
      l3.members.map(m => (tags(m).phrase, l3.label, l2.label, l1.label, l3.docCount))
    }
  }

  /** tag_hierarchy query: canonical hierarchy over the corpus's MMR tag
    * vocabulary with document-incidence vectors.
    */
  def tagHierarchy(spark: SparkSession, dir: String): DataFrame =
    tagHierarchyOf(spark, KeywordTags.keywordTags(spark, dir))

  /** tag_hierarchy_cert query (round-15 board #1 — the graph_leiden_cert
    * posture for the last non-multimodal rows-only entry): one row per
    * LEVEL-3 cluster of the emitted hierarchy, `(seed, n_members,
    * doc_count, cert)`, where seed = the cluster's minimum member tag.
    *
    * Cross-engine pin: the DuckDB oracle recomputes the ENTIRE level-3
    * partition independently — the keyword-pipeline tag assignment, the
    * incidence cosines, and the reference's greedy single-linkage merge
    * replayed as an iterative recursive CTE (one seed claimed per
    * round, restricted to the collision subgraph) — so the hash pins
    * cluster membership, sizes, and summed doc counts, not just
    * counts. The incidence cosine is bit-stable across engines:
    * dot = |docs_a ∩ docs_b| (an exact integer double), norms are
    * sqrt of exact integers, and both engines evaluate
    * `k / (sqrt(n_a) · sqrt(n_b))` with the same three IEEE roundings,
    * so every `> threshold` merge decision is identical — the same
    * exact-representability argument as graph_leiden_cert's −0.5, but
    * holding on EVERY corpus because incidence vectors are 0/1.
    *
    * `cert` is the Spark-MEASURED quality contract the oracle pins to
    * `true` (it cannot replay the FP-order-sensitive parts —
    * centroid cosines — bit-stably): one hierarchy row per vocabulary
    * tag; per-cluster level-2/level-1/doc_count consistency; every
    * non-seed member within `mergeThreshold` of its seed; greedy
    * soundness (distinct seeds pairwise ≤ threshold, no member
    * claimable by an earlier seed); doc counts = Σ member incidence
    * counts; labels centroid-closest at every level (±1e-9 FP
    * tolerance); and the average-linkage TERMINATION invariant at
    * levels 2 and 1 — every pair of surviving clusters' average
    * cross-centroid similarity sits below its threshold (the exact
    * stop condition of clustering.rs:83's loop).
    *
    * EXERCISING THRESHOLDS: at the reference defaults (0.85/0.70/0.50)
    * this corpus's MMR vocabulary is degenerate — the max incidence
    * cosine is 0.58 at sf0.1, so no level-3 merge ever fires and the
    * cert would certify nothing (the ann_lsh_cert hard-probe
    * precedent). The registered cert therefore runs the same machinery
    * at (0.3, 0.15, 0.05), where the corpus produces real multi-member
    * clusters and real level-2/1 merges at every test SF; the
    * reference-default behavior stays covered by TagHierarchySpec's
    * reference test vectors.
    *
    * Scale posture: an INSTRUMENT (like graph_leiden_cert) — the
    * invariant audit collects the vocabulary driver-side exactly as the
    * operator's compact path does, and is priced in the instrument
    * band, not the operator band.
    */
  def tagHierarchyCert(spark: SparkSession, dir: String,
                       mergeThreshold: Double = 0.3,
                       level2Threshold: Double = 0.15,
                       level1Threshold: Double = 0.05): DataFrame = {
    import spark.implicits._
    val asg = KeywordTags.keywordTags(spark, dir)
      .select(col("doc_id"), col("tag")).localCheckpoint()
    val emitted = tagHierarchyOf(spark, asg, mergeThreshold = mergeThreshold,
        level2Threshold = level2Threshold, level1Threshold = level1Threshold)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))
      .toSeq
    val vocab = asg.groupBy(col("tag"))
      .agg(collect_set(col("doc_id")).as("docs"), count(lit(1)).as("doc_count"))
      .orderBy(col("tag"))
      .collect()
      .map(r => TagVec(r.getString(0),
        r.getSeq[Long](1).map(d => d.toInt -> 1.0).toMap, r.getLong(2)))
      .toIndexedSeq
    val cert = hierarchyInvariants(vocab, emitted,
      mergeThreshold, level2Threshold, level1Threshold)
    emitted.groupBy(_._2).toSeq
      .map { case (_, ms) => (ms.map(_._1).min, ms.size.toLong, ms.head._5, cert) }
      .sortBy(_._1)
      .toDF("seed", "n_members", "doc_count", "cert")
  }

  /** The Spark-measured half of [[tagHierarchyCert]]: every portable
    * quality invariant of an emitted hierarchy `(tag, canonical,
    * level2, level1, doc_count)` against the vocabulary it was built
    * from. Package-visible so the spec can feed it deliberately
    * broken hierarchies.
    */
  private[operators] def hierarchyInvariants(
      vocab: IndexedSeq[TagVec],
      rows: Seq[(String, String, String, String, Long)],
      mergeThreshold: Double, level2Threshold: Double,
      level1Threshold: Double): Boolean = {
    val eps = 1e-9
    val vecOf = vocab.map(t => t.phrase -> t.vector).toMap
    val dfOf = vocab.map(t => t.phrase -> t.docCount).toMap

    val oneRowPerTag = rows.size == vocab.size &&
      rows.map(_._1).sorted == vocab.map(_.phrase).toList.sorted

    if (!oneRowPerTag) return false
    val clusters = rows.groupBy(_._2).toSeq.sortBy(_._1)
    val consistent = clusters.forall { case (canon, ms) =>
      ms.map(_._3).distinct.size == 1 && ms.map(_._4).distinct.size == 1 &&
        ms.map(_._5).distinct.size == 1 && ms.exists(_._1 == canon)
    }
    if (!consistent) return false

    val memberSets = clusters.map { case (canon, ms) =>
      (canon, ms.map(_._1).sorted.toIndexedSeq, ms.head._5)
    }
    val seeds = memberSets.map(_._2.min).sorted
    // greedy single-linkage soundness: members within threshold of
    // their seed; seeds pairwise independent; no member claimable by
    // an EARLIER seed (all three follow from mergeDuplicates'
    // iteration order and would each catch a membership corruption)
    val memberOverThr = memberSets.forall { case (_, ms, _) =>
      val s = ms.min
      ms.filter(_ != s).forall(m => cosine(vecOf(s), vecOf(m)) > mergeThreshold)
    }
    val seedsIndependent = seeds.combinations(2).forall {
      case Seq(a, b) => cosine(vecOf(a), vecOf(b)) <= mergeThreshold
    }
    val noEarlierClaim = memberSets.forall { case (_, ms, _) =>
      val s = ms.min
      ms.filter(_ != s).forall(m =>
        seeds.takeWhile(_ < s).forall(s2 =>
          cosine(vecOf(s2), vecOf(m)) <= mergeThreshold))
    }
    val docCountsOk = memberSets.forall { case (_, ms, dc) =>
      ms.map(dfOf).sum == dc
    }
    // labels centroid-closest (±eps: centroid cosines sum non-integer
    // doubles, so recomputation order may differ by ulps)
    val labelsOk3 = memberSets.forall { case (canon, ms, _) =>
      val c = centroid(ms.map(vecOf))
      cosine(vecOf(canon), c) >= ms.map(m => cosine(vecOf(m), c)).max - eps
    }

    // level-2/1: average-linkage termination + centroid-closest labels
    val cent3 = memberSets.map { case (canon, ms, _) =>
      canon -> centroid(ms.map(vecOf))
    }.toMap
    val level2Groups = rows.map(r => (r._2, r._3)).distinct.groupBy(_._2).toSeq
      .map { case (l2, cs) => (l2, cs.map(_._1).sorted) }.sortBy(_._1)
    val l2Term = level2Groups.combinations(2).forall {
      case Seq((_, as), (_, bs)) =>
        val sims = for (a <- as; b <- bs) yield cosine(cent3(a), cent3(b))
        sims.sum / sims.size < level2Threshold + eps
    }
    val l2Labels = level2Groups.forall { case (l2, cs) =>
      val c2 = centroid(cs.map(cent3))
      cs.contains(l2) &&
        cosine(cent3(l2), c2) >= cs.map(c => cosine(cent3(c), c2)).max - eps
    }
    val cent2 = level2Groups.map { case (l2, cs) =>
      l2 -> centroid(cs.map(cent3))
    }.toMap
    val level1Groups = rows.map(r => (r._3, r._4)).distinct.groupBy(_._2).toSeq
      .map { case (l1, l2s) => (l1, l2s.map(_._1).sorted) }.sortBy(_._1)
    val l1Term = level1Groups.combinations(2).forall {
      case Seq((_, as), (_, bs)) =>
        val sims = for (a <- as; b <- bs) yield cosine(cent2(a), cent2(b))
        sims.sum / sims.size < level1Threshold + eps
    }
    val l1Labels = level1Groups.forall { case (l1, l2s) =>
      val c1 = centroid(l2s.map(cent2))
      l2s.contains(l1) &&
        cosine(cent2(l1), c1) >= l2s.map(x => cosine(cent2(x), c1)).max - eps
    }

    memberOverThr && seedsIndependent && noEarlierClaim && docCountsOk &&
      labelsOk3 && l2Term && l2Labels && l1Term && l1Labels
  }

  // Encoder-visible row shapes for the bucketed path (codegen'd
  // (de)serializers cannot access private members).
  case class TagDocs(bucket: Int, phrase: String, docs: Seq[Long], docCount: Long)
  case class BucketCanon(label: String, phrases: Seq[String],
                         centroid: Map[Int, Double], docCount: Long)

  /** Hierarchy over any pre-computed (doc_id, tag) assignment — callers
    * that already ran the keyword pipeline (or hold reference-style
    * concept tags from elsewhere) pass it here so it is not recomputed.
    *
    * The per-tag incidence aggregation runs in the cluster; the
    * collected vocabulary is gated by `driverByteBudget` twice — via the
    * shared byte estimator AND the 8·n² linkSum-matrix size (many small
    * tags pass a byte gate while the n×n clustering matrix alone would
    * wedge the driver) — with [[tagHierarchyBucketed]] past either.
    */
  def tagHierarchyOf(spark: SparkSession, tags: DataFrame,
                     driverByteBudget: Long = 64L << 20,
                     mergeThreshold: Double = 0.85,
                     level2Threshold: Double = 0.70,
                     level1Threshold: Double = 0.50): DataFrame = {
    import spark.implicits._
    val perTag = tags.groupBy(col("tag"))
      .agg(collect_set(col("doc_id")).as("docs"), count(lit(1)).as("doc_count"))
      .localCheckpoint()
    // Map[Int,Double] incidence entries carry boxed key+value on top of
    // the id chars the shared estimator measures.
    val (nTags, estBytes) = GraphAlgorithms.estimatedAdjacencyBytes(
      perTag.select(col("tag").as("u"), col("docs").as("nbrs")), entryExtraBytes = 32L)
    // Driver-side cost is quadratic in tag COUNT as well as linear in
    // bytes: clusterLevel allocates an n×n Double linkSum matrix and
    // mergeDuplicates does O(n²) cosines — a vocabulary of many SMALL
    // tags passes the byte gate while 8·n² alone dwarfs it. Both gates
    // must hold for the compact path.
    val matrixBytes = 8L * nTags * nTags
    if (estBytes <= GraphAlgorithms.gatedBudget(driverByteBudget) &&
        matrixBytes <= GraphAlgorithms.gatedBudget(driverByteBudget)) {
      val vocab = perTag.orderBy(col("tag"))
        .collect()
        .map { r =>
          TagVec(r.getString(0),
            r.getSeq[Long](1).map(d => d.toInt -> 1.0).toMap,
            r.getLong(2))
        }.toIndexedSeq
      buildHierarchy(vocab, mergeThreshold, level2Threshold, level1Threshold)
        .toDF("tag", "canonical", "level2", "level1", "doc_count")
        .orderBy(col("tag"))
    } else {
      log.info(s"tag_hierarchy: vocabulary ~$estBytes bytes / matrix ~$matrixBytes bytes " +
        s"($nTags tags) over budget $driverByteBudget — bucketed pre-merge path")
      tagHierarchyBucketed(spark, perTag, nTags, estBytes, driverByteBudget,
        mergeThreshold, level2Threshold, level1Threshold)
    }
  }

  /** The over-budget path: hash tags into ceil(est/budget) buckets so
    * each bucket's vocabulary fits the byte budget, run the reference's
    * merge_duplicates inside each bucket EXECUTOR-side (level 3), then
    * collect only the top canonical representatives by doc count —
    * capped so the collected centroids stay inside the budget — and
    * run levels 2/1 on those. Representatives past the cap (and their
    * member tags) root their own hierarchy (level2 = level1 =
    * canonical): a documented truncation of the COARSE levels only —
    * every tag still gets its level-3 canonical assignment.
    */
  private def tagHierarchyBucketed(spark: SparkSession, perTag: DataFrame,
                                   nTags: Long, estBytes: Long, budget: Long,
                                   mergeThreshold: Double,
                                   level2Threshold: Double,
                                   level1Threshold: Double): DataFrame = {
    import spark.implicits._
    // Bucket count sized so each bucket fits the budget in BYTES and its
    // executor-side O(bucket²) merge stays bounded in COUNT: the count
    // term needs numBuckets ≥ nTags·sqrt(8/budget) so that
    // 8·(nTags/numBuckets)² ≤ budget.
    val countBuckets = math.ceil(nTags * math.sqrt(8.0 / budget)).toLong
    val numBuckets = math.max(2L, math.max((estBytes + budget - 1) / budget, countBuckets)).toInt
    val canons = perTag
      .select(pmod(xxhash64(col("tag")), lit(numBuckets)).cast("int").as("bucket"),
        col("tag").as("phrase"), col("docs"), col("doc_count").as("docCount"))
      .as[TagDocs]
      .groupByKey(_.bucket)
      .flatMapGroups { (_, it) =>
        val bucketTags = it.map(t =>
            TagVec(t.phrase, t.docs.map(d => d.toInt -> 1.0).toMap, t.docCount))
          .toIndexedSeq.sortBy(_.phrase)
        mergeDuplicates(bucketTags, mergeThreshold).iterator.map(c =>
          BucketCanon(c.label, c.members.map(m => bucketTags(m).phrase),
            c.centroid, c.docCount))
      }
      .localCheckpoint()

    // Collect cap, the min of three bounds: (a) bytes — budget over the
    // mean per-REPRESENTATIVE size, which is the mean per-tag size times
    // the measured merge factor (a representative's centroid is the
    // union of its members' incidence maps, so it is ~members× larger
    // than one tag); (b) count — clusterLevel on the collected reps
    // allocates an 8·reps² linkSum matrix, so reps ≤ sqrt(budget/8);
    // (c) a floor of 64 so tiny budgets still produce a hierarchy.
    val nCanons = canons.count()
    val meanTagBytes = math.max(1L, estBytes / math.max(1L, nTags))
    val mergeFactor = math.max(1L, nTags / math.max(1L, nCanons))
    val byteCap = budget / (meanTagBytes * mergeFactor)
    val matrixCap = math.sqrt(budget / 8.0).toLong
    val repCap = math.max(64L, math.min(byteCap, matrixCap)).toInt
    if (nCanons > repCap) {
      log.info(s"tag_hierarchy: $nCanons representatives exceed collect cap $repCap — " +
        s"${nCanons - repCap} truncated to flat level2=level1=canonical hierarchies " +
        s"(byteCap=$byteCap, matrixCap=$matrixCap, mergeFactor=$mergeFactor)")
    }
    val reps = canons.orderBy(col("docCount").desc, col("label")).limit(repCap)
      .collect().toIndexedSeq
    val level3 = reps.indices.map(i =>
      Canon(reps(i).label, Seq(i), reps(i).centroid, reps(i).docCount))
    val (level2, p3) = clusterLevel(level3, level2Threshold)
    val (level1, p2) = clusterLevel(level2.toIndexedSeq, level1Threshold)
    val labelRows = level3.indices.map { i =>
      (level3(i).label, level2(p3(i)).label, level1(p2(p3(i))).label)
    }
    val labelMap = labelRows.toDF("canonical", "l2", "l1")

    canons.flatMap(c => c.phrases.map(p => (p, c.label, c.docCount)))
      .toDF("tag", "canonical", "doc_count")
      .join(broadcast(labelMap), Seq("canonical"), "left")
      .select(col("tag"), col("canonical"),
        coalesce(col("l2"), col("canonical")).as("level2"),
        coalesce(col("l1"), col("canonical")).as("level1"),
        col("doc_count"))
      .orderBy(col("tag"))
  }
}
