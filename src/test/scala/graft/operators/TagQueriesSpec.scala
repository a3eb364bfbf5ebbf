package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity with tag_queries.rs (tokenize_query semantics, the LIKE-OR
  * top-10 probe, basket fetch, and the hierarchy read). */
class TagQueriesSpec extends SparkSpec {

  import spark.implicits._
  import TagQueries._

  test("tokenize_query: lowercase, ws split, ASCII charset strip, len>=3 (tag_queries.rs:48)") {
    assert(tokenizeQuery("Vector dup Wind QA z.") == Seq("vector", "dup", "wind"))
    // Punctuation stripped inside tokens; `_`/`-` kept; short drops.
    assert(tokenizeQuery("Dup-Search  ab c!! under_score") ==
      Seq("dup-search", "under_score"))
    assert(tokenizeQuery("  ") == Seq.empty)
    // Non-ASCII word chars are STRIPPED (the TS regex has no `u` flag).
    assert(tokenizeQuery("café naïve") == Seq("caf", "nave"))
  }

  test("matching tags: LIKE-any-token, concept-only store, top-10 by score with the tag/tag_id totalizer (tag_queries.rs get_matching_tags)") {
    val rows = tagMatch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ranks = rows.map(_.getAs[Int]("rk")).distinct.sorted
    assert(ranks.last <= 10)
    // Every matched tag contains one of the probe tokens.
    assert(rows.forall { r =>
      val t = r.getAs[String]("tag").toLowerCase
      t.contains("vector") || t.contains("dup") || t.contains("wind")
    })
    // Scores are non-increasing in rank.
    val byRank = rows.groupBy(_.getAs[Int]("rk"))
      .map { case (k, v) => k -> v.head.getAs[Double]("score") }
      .toSeq.sortBy(_._1).map(_._2)
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    // The partial token arm is live: `wind` pulls a longer tag.
    assert(rows.exists(r => r.getAs[String]("tag") != "wind" &&
      r.getAs[String]("tag").contains("wind")) ||
      rows.forall(r => !r.getAs[String]("tag").contains("wind")))
  }

  test("baskets ride the matched ids: per-tag keyword rows from the owning doc's top-3 (tag_queries.rs get_keyword_baskets_for_tags)") {
    val rows = tagMatch(spark, sfDir).collect()
    // ≤ 3 basket keywords per matched tag row.
    val perTag = rows.groupBy(r => r.getAs[Long]("tag_id"))
    assert(perTag.values.forall(v => v.length <= 3 && v.nonEmpty))
    // Basket keywords arrive sorted (the totalized Vec order).
    perTag.values.foreach { v =>
      val ks = v.sortBy(_.getAs[String]("basket_keyword"))
        .map(_.getAs[String]("basket_keyword"))
      assert(ks.sorted.sameElements(ks))
    }
  }

  test("empty token set returns the empty frame (tag_queries.rs get_matching_tags empty guard)") {
    val out = tagMatchOf(tagsWithIds(spark, sfDir), basketsFor(spark, sfDir),
      "a b ?!", "projects", None)
    assert(out.columns.isEmpty || out.count() == 0)
  }

  test("hierarchy read: level-major name order, parent names via LEFT JOIN with the dangling arm, child counts (tag_queries.rs get_tag_hierarchy)") {
    val rows = tagTree(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // ORDER BY level ASC, name ASC.
    val key = rows.map(r => (r.getAs[Long]("level"), r.getAs[String]("name")))
    assert(key.sortBy(identity).sameElements(key))
    // Some parents resolve, roots and dangling ids read NULL.
    assert(rows.exists(_.getAs[String]("parent_name") != null))
    assert(rows.exists(_.getAs[String]("parent_name") == null))
    // Child counts: the sum of child_count equals the number of rows
    // whose parent resolved within the collection slice.
    val canon = canonicalTags(spark, sfDir)
      .filter(col("collection") === "projects")
    val ids = canon.select(col("canonical_id")).as[Long].collect().toSet
    val resolvedChildren = canon.filter(col("parent_id").isNotNull)
      .select(col("parent_id")).as[Long].collect().count(ids.contains)
    assert(rows.map(_.getAs[Long]("child_count")).sum == resolvedChildren)
  }
}
