package graft.operators

import graft.SparkSpec

/** Parity with the reference's canonical_tags test vectors
  * (canonical_tags/tests.rs), run through the vector-agnostic
  * clustering core with dense vectors expressed as sparse maps.
  */
class TagHierarchySpec extends SparkSpec {
  import TagHierarchy._

  private def dense(vs: Double*): Map[Int, Double] =
    vs.zipWithIndex.collect { case (v, i) if v != 0.0 => i -> v }.toMap

  // reference: tests.rs test_merge_duplicates_similar
  test("merge_duplicates merges near-identical tags, sums doc counts") {
    val tags = IndexedSeq(
      TagVec("vector search", dense(0.95, 0.31, 0.0), 5),
      TagVec("vector indexing", dense(0.95, 0.30, 0.0), 3),
      TagVec("grpc protocol", dense(0.0, 0.0, 1.0), 2))
    val merged = mergeDuplicates(tags, 0.85)
    assert(merged.size == 2, s"labels: ${merged.map(_.label)}")
    val vc = merged.find(_.members.size == 2).get
    assert(vc.docCount == 8, "doc counts must sum")
  }

  // reference: tests.rs test_merge_duplicates_all_different
  test("merge_duplicates keeps orthogonal tags separate") {
    val tags = IndexedSeq(
      TagVec("alpha", dense(1.0, 0.0, 0.0), 1),
      TagVec("beta", dense(0.0, 1.0, 0.0), 1),
      TagVec("gamma", dense(0.0, 0.0, 1.0), 1))
    assert(mergeDuplicates(tags, 0.85).size == 3)
    assert(mergeDuplicates(IndexedSeq.empty, 0.85).isEmpty)
  }

  // reference: tests.rs test_build_hierarchy_basic — 6 tags in 3
  // natural pairs collapse monotonically up the levels.
  test("build_hierarchy: levels shrink monotonically over the 3-group fixture") {
    val tags = IndexedSeq(
      TagVec("rust async", dense(0.9, 0.1, 0, 0, 0, 0), 3),
      TagVec("tokio runtime", dense(0.85, 0.15, 0, 0, 0, 0), 2),
      TagVec("database query", dense(0, 0, 0.9, 0.1, 0, 0), 4),
      TagVec("sql storage", dense(0, 0, 0.85, 0.15, 0, 0), 1),
      TagVec("grpc service", dense(0, 0, 0, 0, 0.9, 0.1), 2),
      TagVec("rest api", dense(0, 0, 0, 0, 0.1, 0.9), 3))
    val rows = buildHierarchy(tags)
    assert(rows.size == 6, "every input tag keeps a row")
    val l3 = rows.map(_._2).distinct.size
    val l2 = rows.map(_._3).distinct.size
    val l1 = rows.map(_._4).distinct.size
    assert(l3 <= 6 && l2 <= l3 && l1 <= l2,
      s"levels must shrink monotonically: l3=$l3 l2=$l2 l1=$l1")
    // the two near-duplicate pairs sit at ~0.995 cosine → merged at L3
    val byTag = rows.map(r => r._1 -> r._2).toMap
    assert(byTag("rust async") == byTag("tokio runtime"),
      "near-duplicate pair must share a canonical tag")
    assert(byTag("database query") == byTag("sql storage"))
  }

  // Over-budget path: a synthetic vocabulary large enough (via a tiny
  // byte budget) to force the bucketed executor-side pre-merge.
  test("tag_hierarchy bucketed path: covers the vocabulary, merges in-bucket duplicates") {
    import spark.implicits._
    // 120 tags, all with IDENTICAL incidence (docs 1..3): inside every
    // hash bucket everything merges into one canonical tag.
    val tags = (0 until 120).flatMap(i => (1L to 3L).map(d => (d, f"tag$i%03d")))
      .toDF("doc_id", "tag")
    val out = TagHierarchy.tagHierarchyOf(spark, tags, driverByteBudget = 2048L)
    assert(out.columns.toSeq ==
      Seq("tag", "canonical", "level2", "level1", "doc_count"))
    val rows = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq == (0 until 120).map(i => f"tag$i%03d"),
      "every input tag appears exactly once")
    val canonCount = rows.map(_._2).distinct.length
    assert(canonCount < 120,
      s"identical-incidence tags sharing a bucket must merge (got $canonCount canons)")
    // doc_count sums the per-tag incidence counts (3 each) over members.
    rows.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.head._5 == members.length * 3L,
        s"canon $canon doc_count ${members.head._5} != ${members.length} members × 3")
      assert(members.map(_._1).contains(canon), "label must be a member phrase")
    }
  }

  test("tag_hierarchy bucketed path matches compact path on an orthogonal vocabulary") {
    import spark.implicits._
    // Orthogonal incidence (each tag on its own doc): no merges at any
    // level on either path, so both reduce to tag = canonical = l2 = l1.
    val tags = (0 until 40).map(i => (1000L + i, s"t$i")).toDF("doc_id", "tag")
    val compact = TagHierarchy.tagHierarchyOf(spark, tags).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).sortBy(_._1)
    val bucketed = TagHierarchy.tagHierarchyOf(spark, tags, driverByteBudget = 1024L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).sortBy(_._1)
    assert(compact.toSeq == bucketed.toSeq)
    compact.foreach { r =>
      assert(r._1 == r._2 && r._2 == r._3 && r._3 == r._4 && r._5 == 1L)
    }
  }

  test("tag_hierarchy on the corpus: total doc_count conserved per canonical tag") {
    val tags = KeywordTags.keywordTags(spark, sfDir).collect()
    val rows = TagHierarchy.tagHierarchy(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.length == rows.length, "one row per tag")
    assert(rows.map(_._1).toSet == tags.map(_.getString(2)).toSet,
      "hierarchy must cover exactly the tag vocabulary")
    // the level-3 doc_count is the sum of its members' per-tag doc counts
    val perTag = tags.groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    rows.groupBy(_._2).foreach { case (canon, members) =>
      val expected = members.map(m => perTag(m._1)).sum
      assert(members.head._5 == expected,
        s"canonical $canon doc_count ${members.head._5} != sum $expected")
    }
    // parent labels must themselves be members of the vocabulary
    rows.foreach { r =>
      assert(perTag.contains(r._2) && perTag.contains(r._3) && perTag.contains(r._4))
    }
  }

  // round-15 board #1: the cert's Spark-measured invariant audit must
  // accept a genuinely-built hierarchy and reject each corruption class.
  test("hierarchyInvariants: true on a built hierarchy, false on every corruption class") {
    val tags = IndexedSeq(
      TagVec("rust async", dense(0.9, 0.1, 0, 0, 0, 0), 3),
      TagVec("tokio runtime", dense(0.85, 0.15, 0, 0, 0, 0), 2),
      TagVec("database query", dense(0, 0, 0.9, 0.1, 0, 0), 4),
      TagVec("sql storage", dense(0, 0, 0.85, 0.15, 0, 0), 1),
      TagVec("grpc service", dense(0, 0, 0, 0, 0.9, 0.1), 2),
      TagVec("rest api", dense(0, 0, 0, 0, 0.1, 0.9), 3))
    val rows = buildHierarchy(tags)
    assert(hierarchyInvariants(tags, rows, 0.85, 0.70, 0.50),
      "a genuinely-built hierarchy must pass its own invariants")

    // (a) dropped row
    assert(!hierarchyInvariants(tags, rows.tail, 0.85, 0.70, 0.50))
    // (b) doc_count corrupted consistently across a cluster
    val rustCanon = rows.find(_._1 == "rust async").get._2
    val badDc = rows.map(r => if (r._2 == rustCanon) r.copy(_5 = r._5 + 1) else r)
    assert(!hierarchyInvariants(tags, badDc, 0.85, 0.70, 0.50))
    // (c) member moved into a cluster it is nowhere near: rewrite
    // "grpc service" onto the rust cluster (all parent columns too, so
    // the consistency check passes and the SIMILARITY check must catch
    // it)
    val rustRow = rows.find(_._1 == "rust async").get
    val badMove = rows.map(r =>
      if (r._1 == "grpc service")
        (r._1, rustRow._2, rustRow._3, rustRow._4, rustRow._5)
      else r)
    assert(!hierarchyInvariants(tags, badMove, 0.85, 0.70, 0.50))
    // (d) label swapped to a non-centroid-closest member: relabel the
    // merged rust cluster by its OTHER member
    val other = rows.filter(r => r._2 == rustCanon && r._1 != rustCanon)
      .map(_._1).head
    val badLabel = rows.map(r =>
      if (r._2 == rustCanon)
        (r._1, other,
          if (r._3 == rustCanon) other else r._3,
          if (r._4 == rustCanon) other else r._4, r._5)
      else r)
    assert(!hierarchyInvariants(tags, badLabel, 0.85, 0.70, 0.50))
  }

  test("tag_hierarchy_cert: per-cluster rows, cert = true, membership partitions the vocabulary") {
    val out = TagHierarchy.tagHierarchyCert(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.nonEmpty, "cert must emit one row per level-3 cluster")
    assert(out.forall(_._4), "the measured quality contract must hold")
    val vocabSize = KeywordTags.keywordTags(spark, sfDir)
      .select("tag").distinct().count()
    assert(out.map(_._2).sum == vocabSize,
      "cluster sizes must partition the vocabulary")
    assert(out.map(_._1).distinct.length == out.length, "seeds are unique")
    // the exercising thresholds must actually exercise: at least one
    // multi-member cluster at every test SF (measured: 5 at sf0.01,
    // 2 at sf0.1; sf0.001 pinned here)
    assert(out.exists(_._2 > 1), "at least one real merge must fire")
  }
}
