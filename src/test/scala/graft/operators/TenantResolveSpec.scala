package graft.operators

import graft.SparkSpec

/** The tenants.rs resolution cascade on the reference's own fixture
  * (tenants.rs tests: entries() with the main-docker / workspace-
  * qdrant-mcp / two-clones-named-tool registry). */
class TenantResolveSpec extends SparkSpec {

  import spark.implicits._

  private lazy val entries = Seq(
    ("7166665a005b", "/Users/x/.config/main-docker"),
    ("4ed81466dec7", "/Users/x/dev/projects/mcp/workspace-qdrant-mcp"),
    ("aaaa00000001", "/Users/x/dev/a/tool"),
    ("bbbb00000002", "/Users/x/dev/b/tool"))
    .toDF("tenant_id", "path")

  private def resolve(inputs: String*): Map[String, (String, Int, String, Long)] =
    TenantResolve.resolveOf(entries, inputs.toDF("input")).collect()
      .map(r => r.getAs[String]("input") ->
        ((r.getAs[String]("outcome"), r.getAs[Int]("tier"),
          r.getAs[String]("tenant_id"), r.getAs[Long]("n_candidates"))))
      .toMap

  test("exact tenant id wins (tenants.rs exact_tenant_id_wins)") {
    assert(resolve("7166665a005b")("7166665a005b") ==
      (("resolved", 1, "7166665a005b", 1L)))
  }

  test("exact name resolves; duplicate names are ambiguous (exact_name_resolves / exact_name_duplicate_is_ambiguous)") {
    val r = resolve("main-docker", "tool")
    assert(r("main-docker") == (("resolved", 2, "7166665a005b", 1L)))
    assert(r("tool") == (("ambiguous", 2, null, 2L)))
  }

  test("unique prefixes resolve at both tiers; ambiguous prefix errors (tenant_id_prefix_resolves / name_prefix_resolves / ambiguous_prefix_lists_candidates)") {
    val r = resolve("7166", "main-", "to")
    assert(r("7166") == (("resolved", 3, "7166665a005b", 1L)))
    assert(r("main-") == (("resolved", 4, "7166665a005b", 1L)))
    assert(r("to") == (("ambiguous", 4, null, 2L)))
  }

  test("unique name substring resolves; unknown input is unknown (name_substring_resolves / unknown_input_lists_registered)") {
    val r = resolve("qdrant", "nope-nothing")
    assert(r("qdrant") == (("resolved", 5, "4ed81466dec7", 1L)))
    assert(r("nope-nothing") == (("unknown", 0, null, 0L)))
  }
}
