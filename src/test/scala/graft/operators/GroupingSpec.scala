package graft.operators

import graft.SparkSpec

/** Parity with the reference's tag-affinity grouping semantics
  * (grouping/affinity/tag_affinity.rs + affinity_tests.rs): Jaccard of
  * distinct tag sets, threshold inclusion, and transitive component
  * building (A~B and B~C → one group).
  */
class GroupingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("connected components: transitivity merges chains, min label wins") {
    import spark.implicits._
    val edges = Seq(("p1", "p2"), ("p2", "p3"), ("p5", "p6")).toDF("a", "b")
    val out = Grouping.connectedComponents(edges).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(out == Map("p1" -> "p1", "p2" -> "p1", "p3" -> "p1",
      "p5" -> "p5", "p6" -> "p5"))
  }

  test("connected components: a 40-node chain converges inside the round budget") {
    import spark.implicits._
    // plain min-label propagation would need 39 rounds; pointer jumping
    // must close this well inside the 16-round guard
    val edges = (0 until 39).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("a", "b")
    val out = Grouping.connectedComponents(edges).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.length == 40)
    assert(out.forall(_._2 == "n00"), "every chain node must reach the minimum label")
  }

  test("tag_affinity on the corpus: groups keyed by min member, jaccard-verified") {
    val rows = Grouping.tagAffinity(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.nonEmpty, "the self-similar corpus must produce affine tenants")
    val byGroup = rows.groupBy(_._2)
    byGroup.foreach { case (g, members) =>
      assert(members.map(_._1).min == g, s"group id $g must be its min member")
      assert(members.length >= 2, "groups come from pairwise affinities")
    }
    // spot-verify one edge: every group of >= 2 members implies at least
    // one pair whose true tag-set Jaccard clears the threshold
    val tags = KeywordTags.keywordTags(spark, sfDir)
    val tenants = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source").as("tenant_id"))
    val prof = tags.join(tenants, "doc_id")
      .select(col("tenant_id"), col("tag")).distinct().collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byGroup.foreach { case (_, members) =>
      val ms = members.map(_._1)
      val hasEdge = ms.toSeq.combinations(2).exists { pair =>
        val (a, b) = (prof(pair(0)), prof(pair(1)))
        val inter = a.intersect(b).size.toDouble
        inter / (a.size + b.size - inter) >= 0.25
      }
      assert(hasEdge, s"group ${ms.mkString(",")} must contain a direct affinity edge")
    }
  }

  test("extract_git_org: the reference's URL parse vectors (git_org.rs tests)") {
    import spark.implicits._
    val vectors = Seq(
      "https://github.com/ChrisGVE/my-repo.git" -> "github.com/chrisgve",
      "git@github.com:ChrisGVE/workspace-qdrant-mcp.git" -> "github.com/chrisgve",
      "https://gitlab.com/my-org/my-project" -> "gitlab.com/my-org",
      "git@gitlab.com:my-org/sub-project.git" -> "gitlab.com/my-org",
      "https://bitbucket.org/team-name/repo.git" -> "bitbucket.org/team-name",
      // verbatim from the PUBLIC reference's own test vector
      // (grouping/git_org.rs:264) — a fictional self-hosted host, not a
      // real internal URL (leak-scan pre-adjudication)
      "https://git.internal.corp/engineering/service.git" -> "git.internal.corp/engineering",
      // nested GitLab groups: only host/first-level
      "https://gitlab.com/org/subgroup/deep-repo.git" -> "gitlab.com/org",
      // normalize_git_url vectors routed through extraction
      "ssh://git@github.com/user/repo" -> "github.com/user",
      "http://github.com/user/repo" -> "github.com/user")
    val out = vectors.map(_._1).toDF("url")
      .select(Grouping.extractGitOrg(col("url")).as("org")).collect().map(_.getString(0))
    assert(out.toSeq == vectors.map(_._2))
    // no-org / empty URLs yield null
    val none = Seq("", "https://example.com/repo").toDF("url")
      .select(Grouping.extractGitOrg(col("url")).as("org")).collect()
    assert(none.forall(_.isNullAt(0)))
    // case-insensitive: MyOrg https == myorg scp
    val ci = Seq("https://github.com/MyOrg/Repo1.git", "git@github.com:myorg/Repo2.git")
      .toDF("url").select(Grouping.extractGitOrg(col("url")).as("org"))
      .collect().map(_.getString(0))
    assert(ci(0) == ci(1))
  }

  test("tag_affinity storage shape: sha group ids, mean-edge confidence (tag_affinity.rs)") {
    import spark.implicits._
    // two tenants sharing most tags + one isolated tenant
    val tags = Seq(
      (1L, "spark"), (1L, "scala"), (1L, "sql"),
      (2L, "spark"), (2L, "scala"), (2L, "hive"),
      (3L, "golf"), (3L, "tennis")
    ).toDF("doc_id", "tag")
    val tenants = Seq((1L, "pa"), (2L, "pb"), (3L, "pz")).toDF("doc_id", "tenant_id")
    val rows = Grouping.tagAffinityGroupsOf(tags, tenants).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(rows.length == 2, "only the affine pair groups; pz is isolated")
    // group id = 'tag_aff:' + first 20 hex of sha256("pa|pb")
    val expected = "tag_aff:" + java.security.MessageDigest.getInstance("SHA-256")
      .digest("pa|pb".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(20)
    rows.foreach { case (gid, _, tpe, conf) =>
      assert(gid == expected)
      assert(tpe == "tag_affinity")
      assert(conf == 0.5, "jaccard {spark,scala}/{spark,scala,sql,hive} = 2/4")
    }
    assert(rows.map(_._2).sorted.toSeq == Seq("pa", "pb"))
  }

  test("embedding affinity groups: cosine threshold, sha ids, mean confidence (grouper.rs)") {
    import spark.implicits._
    val emb = Seq(
      ("pa", Seq(1.0, 0.0)),
      ("pb", Seq(0.8, 0.6)), // cos(pa,pb) = 0.8 ≥ 0.7
      ("pz", Seq(0.0, 1.0))  // cos(pa,pz) = 0, cos(pb,pz) = 0.6 < 0.7
    ).toDF("tenant_id", "embedding")
    val rows = Grouping.affinityGroupsOf(emb).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    assert(rows.length == 2, "only pa+pb group; pz stays out")
    val expected = "affinity:" + java.security.MessageDigest.getInstance("SHA-256")
      .digest("pa|pb".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    rows.foreach { case (gid, _, tpe, conf) =>
      assert(gid == expected && tpe == "affinity" && conf == 0.8)
    }
  }

  test("workspace groups: shared roots group at 1.0, single-member skipped (workspace/mod.rs)") {
    import spark.implicits._
    val folders = Seq(
      ("p1", "/mono/alpha"), ("p2", "/mono/alpha"), ("solo", "/mono/beta")
    ).toDF("tenant_id", "workspace_root")
    val rows = Grouping.workspaceGroupsOf(folders).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val expected = "workspace:ws:" + java.security.MessageDigest.getInstance("SHA-256")
      .digest("/mono/alpha".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    assert(rows.map(_._2).sorted.toSeq == Seq("p1", "p2"))
    rows.foreach { case (gid, _, tpe, conf) =>
      assert(gid == expected && tpe == "workspace" && conf == 1.0)
    }
  }

  test("git_org_groups: multi-project orgs only, same-name different-host separate") {
    import spark.implicits._
    val projects = Seq(
      ("proj-a", "https://github.com/MyOrg/repo-a.git"),
      ("proj-b", "https://github.com/MyOrg/repo-b.git"),
      ("proj-c", "git@github.com:MyOrg/repo-c.git"),
      ("proj-d", "https://gitlab.com/myorg/repo-d.git"), // same org name, other host
      ("proj-e", "https://github.com/solo/lonely.git"),  // single-project org
      ("proj-f", "https://example.com/repo")             // no org level
    ).toDF("tenant_id", "remote_url")
    val out = Grouping.gitOrgGroupsOf(projects).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(
      ("git_org:github.com/myorg", "proj-a"),
      ("git_org:github.com/myorg", "proj-b"),
      ("git_org:github.com/myorg", "proj-c")))
  }
}
