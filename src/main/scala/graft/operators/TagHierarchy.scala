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
  * A production deployment swaps `tagVectors` for real phrase
  * embeddings; the clustering core is vector-agnostic.
  *
  * Scale posture mirrors Leiden's compact path: the cluster does the
  * corpus-sized work (tag extraction, incidence aggregation); the
  * hierarchy itself is the reference's deliberately sequential,
  * deterministic algorithm over the TAG VOCABULARY — thousands of rows
  * per tenant, never corpus-sized — run driver-side on the collected
  * compact vectors.
  */
object TagHierarchy {

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
    */
  def clusterLevel(inputs: IndexedSeq[Canon], threshold: Double): (Seq[Canon], Array[Int]) = {
    val n = inputs.length
    if (n == 0) return (Nil, Array.empty)
    val sim = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0.0 else cosine(inputs(i).centroid, inputs(j).centroid)
    }
    val active = Array.fill(n)(true)
    val members = Array.tabulate(n)(i => scala.collection.mutable.ArrayBuffer(i))
    var go = true
    while (go) {
      var bestSim = Double.NegativeInfinity
      var bestA = -1; var bestB = -1
      for (i <- 0 until n if active(i); j <- i + 1 until n if active(j)) {
        var s = 0.0; var cnt = 0
        members(i).foreach(a => members(j).foreach { b => s += sim(a)(b); cnt += 1 })
        val avg = if (cnt > 0) s / cnt else 0.0
        if (avg > bestSim) { bestSim = avg; bestA = i; bestB = j }
      }
      if (bestSim < threshold || bestA < 0) go = false
      else {
        members(bestA) ++= members(bestB)
        active(bestB) = false
        if (active.count(identity) <= 1) go = false
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
  def tagHierarchy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tags = KeywordTags.keywordTags(spark, dir)
    val perTag = tags.groupBy(col("tag"))
      .agg(collect_set(col("doc_id")).as("docs"), count(lit(1)).as("doc_count"))
      .orderBy(col("tag"))
      .collect()
      .map { r =>
        TagVec(r.getString(0),
          r.getSeq[Long](1).map(d => d.toInt -> 1.0).toMap,
          r.getLong(2))
      }.toIndexedSeq
    buildHierarchy(perTag)
      .toDF("tag", "canonical", "level2", "level1", "doc_count")
      .orderBy(col("tag"))
  }
}
