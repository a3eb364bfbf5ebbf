package graft.operators

import graft.SparkSpec

/** ELABORATES parity with the reference's own unit vectors
  * (idle/tasks/elaborates_maintenance.rs:206-340, cited per case).
  */
class ElaboratesSpec extends SparkSpec {
  import spark.implicits._

  private def edgesOf(records: Seq[(String, String, String)]): Seq[(String, String)] =
    Elaborates.elaboratesOf(
      records.toDF("source_node_id", "concept_id", "depth"))
      .orderBy("shallow_id", "deep_id")
      .collect()
      .map(r => (r.getAs[String]("shallow_id"), r.getAs[String]("deep_id")))
      .toSeq

  // elaborates_maintenance.rs:217 two_nodes_different_depth_creates_elaborates
  test("elaborates: shallow links to deep, with the reference edge shape") {
    val out = Elaborates.elaboratesOf(Seq(
      ("intro-node", "concept-1", "introductory"),
      ("rigorous-node", "concept-1", "rigorous"))
      .toDF("source_node_id", "concept_id", "depth")).collect()
    assert(out.length == 1)
    val e = out.head
    assert(e.getAs[String]("shallow_id") == "intro-node")
    assert(e.getAs[String]("deep_id") == "rigorous-node")
    assert(e.getAs[String]("edge_type") == "elaborates")
    assert(e.getAs[String]("tenant_id") == "__global__")
    assert(e.getAs[String]("source_file") == "elaborates_task")
  }

  // elaborates_maintenance.rs:236 two_nodes_same_depth_no_edge
  test("elaborates: same depth produces no edges") {
    assert(edgesOf(Seq(
      ("node-a", "concept-1", "intermediate"),
      ("node-b", "concept-1", "intermediate"))).isEmpty)
  }

  // elaborates_maintenance.rs:249 three_nodes_different_depths — note the
  // ordinal order puts qualitative (0) below introductory (1) below
  // rigorous (3).
  test("elaborates: three depths produce all shallow->deep pairs") {
    val pairs = edgesOf(Seq(
      ("qualitative-node", "concept-1", "qualitative"),
      ("intro-node", "concept-1", "introductory"),
      ("rigorous-node", "concept-1", "rigorous"))).toSet
    assert(pairs == Set(
      ("qualitative-node", "intro-node"),
      ("qualitative-node", "rigorous-node"),
      ("intro-node", "rigorous-node")))
  }

  // elaborates_maintenance.rs:278 single_node_no_edges
  test("elaborates: a lone covering node produces nothing") {
    assert(edgesOf(Seq(("lonely", "concept-1", "reference"))).isEmpty)
  }

  // elaborates_maintenance.rs:287 multiple_nodes_at_two_depths — 2x2
  // cross product, and reference (ordinal 4) is DEEPER than
  // qualitative (0).
  test("elaborates: two depth buckets cross-product shallow x deep") {
    val pairs = edgesOf(Seq(
      ("qual-a", "concept-1", "qualitative"),
      ("qual-b", "concept-1", "qualitative"),
      ("ref-a", "concept-1", "reference"),
      ("ref-b", "concept-1", "reference")))
    assert(pairs.size == 4)
    assert(pairs.forall { case (s, d) => s.startsWith("qual-") && d.startsWith("ref-") })
  }

  // elaborates_maintenance.rs:109 — unparseable depth metadata drops the
  // record entirely.
  test("elaborates: unparseable depth drops the coverage record") {
    assert(edgesOf(Seq(
      ("bad", "concept-1", "unknown-depth"),
      ("deep", "concept-1", "reference"))).isEmpty)
  }

  // concepts never mix: same depths across DIFFERENT concepts stay apart
  test("elaborates: edges never cross concepts") {
    val pairs = edgesOf(Seq(
      ("a", "concept-1", "qualitative"),
      ("b", "concept-2", "reference")))
    assert(pairs.isEmpty)
  }

  private def adjacentOf(records: Seq[(String, String, String)]): Set[(String, String)] =
    Elaborates.elaboratesAdjacentOf(
      records.toDF("source_node_id", "concept_id", "depth"))
      .collect()
      .map(r => (r.getAs[String]("shallow_id"), r.getAs[String]("deep_id")))
      .toSet

  /** Transitive closure over node pairs (small fixtures only). */
  private def closure(pairs: Set[(String, String)]): Set[(String, String)] = {
    var acc = pairs
    var grown = true
    while (grown) {
      val next = acc ++ (for {
        (a, b) <- acc; (c, d) <- acc if b == c
      } yield (a, d))
      grown = next.size != acc.size
      acc = next
    }
    acc
  }

  // The §4 scale lever: the adjacent materialization's transitive
  // closure regenerates elaboratesOf exactly — including across a
  // GAP in the ordinal scale (no intermediate/rigorous level) where
  // "next present ordinal" must bridge qualitative straight to
  // reference, and with multi-node levels (closure goes through every
  // intermediate node, so no pair is lost).
  test("elaborates: adjacent materialization closure == full pair set") {
    val fixtures = Seq(
      // gap in ordinals: 0, 1, 4 present
      Seq(("q", "c1", "qualitative"), ("i", "c1", "introductory"),
        ("r", "c1", "reference")),
      // multi-node levels + two concepts
      Seq(("q-a", "c1", "qualitative"), ("q-b", "c1", "qualitative"),
        ("m-a", "c1", "intermediate"), ("r-a", "c1", "rigorous"),
        ("r-b", "c1", "rigorous"),
        ("x", "c2", "introductory"), ("y", "c2", "reference")),
      // adjacent-only degenerates to the full set at two levels
      Seq(("s", "c1", "qualitative"), ("d", "c1", "reference")))
    for (fx <- fixtures) {
      val full = edgesOf(fx).toSet
      val adj = adjacentOf(fx)
      assert(adj.subsetOf(full), s"adjacent must be a subset: $fx")
      assert(closure(adj) == full, s"closure(adjacent) != full for $fx")
    }
  }

  // adjacent edges skip no PRESENT level: with three populated levels
  // the shallowest never links directly to the deepest
  test("elaborates: adjacent links stop at the next present level") {
    val adj = adjacentOf(Seq(
      ("q", "c1", "qualitative"),
      ("m", "c1", "intermediate"),
      ("ref", "c1", "reference")))
    assert(adj == Set(("q", "m"), ("m", "ref")))
  }

  private def virtualOf(records: Seq[(String, String, String)],
                        concepts: Seq[String],
                        salts: Int = 4): Set[(String, String, String)] =
    Elaborates.elaboratesVirtualOf(
      records.toDF("source_node_id", "concept_id", "depth"), concepts, salts)
      .collect()
      .map(r => (r.getAs[String]("concept_id"),
        r.getAs[String]("shallow_id"), r.getAs[String]("deep_id")))
      .toSet

  // The decade-3 query form: edge-identical to materialize-then-filter
  // on every fixture the closure lock uses — including the ordinal-gap
  // fixture (the chain closure must bridge 0→1→4 to reach the 0→4
  // pair) and multi-node levels (every shallow×deep pair exactly once,
  // no duplicate per intermediate path). Also pins: no duplicates from
  // the salt replication, and untouched concepts contribute nothing.
  test("elaborates: virtual concept-predicate form == full set filtered") {
    val fixtures = Seq(
      Seq(("q", "c1", "qualitative"), ("i", "c1", "introductory"),
        ("r", "c1", "reference")),
      Seq(("q-a", "c1", "qualitative"), ("q-b", "c1", "qualitative"),
        ("m-a", "c1", "intermediate"), ("r-a", "c1", "rigorous"),
        ("r-b", "c1", "rigorous"),
        ("x", "c2", "introductory"), ("y", "c2", "reference")),
      Seq(("s", "c1", "qualitative"), ("d", "c1", "reference"),
        ("bad", "c1", "unknown-depth")))
    for (fx <- fixtures; concepts <- Seq(Seq("c1"), Seq("c2"), Seq("c1", "c2"))) {
      val fullRows = Elaborates.elaboratesOf(
        fx.toDF("source_node_id", "concept_id", "depth"))
        .collect()
        .map(r => (r.getAs[String]("concept_id"),
          r.getAs[String]("shallow_id"), r.getAs[String]("deep_id")))
      val expected = fullRows.filter(t => concepts.contains(t._1)).toSet
      // duplicate check needs the multiset: collect vs set sizes
      val virtRows = Elaborates.elaboratesVirtualOf(
        fx.toDF("source_node_id", "concept_id", "depth"), concepts, 4)
        .collect()
      assert(virtRows.length == expected.size,
        s"virtual emitted duplicates or dropped pairs for $fx / $concepts")
      assert(virtualOf(fx, concepts) == expected, s"virtual != filtered full for $fx / $concepts")
    }
  }

  // the virtual edge rows carry the exact reference edge shape
  test("elaborates: virtual form keeps the reference edge shape") {
    val out = Elaborates.elaboratesVirtualOf(Seq(
      ("intro-node", "concept-1", "introductory"),
      ("rigorous-node", "concept-1", "rigorous"))
      .toDF("source_node_id", "concept_id", "depth"), Seq("concept-1"), 4)
      .collect()
    assert(out.length == 1)
    val e = out.head
    assert(e.getAs[String]("shallow_id") == "intro-node")
    assert(e.getAs[String]("deep_id") == "rigorous-node")
    assert(e.getAs[String]("edge_type") == "elaborates")
    assert(e.getAs[String]("tenant_id") == "__global__")
    assert(e.getAs[String]("source_file") == "elaborates_task")
  }

  // round-15 board #7: the sink (nosort) form the README routes 100 TB
  // writers to must be the SAME edge set as the registered sorted form
  // — the presentation sort is the ONLY difference.
  test("elaborates: virtual sorted and sink (nosort) forms are the same edge set") {
    val sorted = Elaborates.docElaboratesVirtual(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val sink = Elaborates.docElaboratesVirtual(spark, sfDir, ordered = false)
      .collect().map(_.toSeq)
    assert(sink.length == sorted.size, "sink form must not duplicate or drop edges")
    assert(sink.toSet == sorted, "sink form must emit exactly the sorted form's edges")
  }
}
