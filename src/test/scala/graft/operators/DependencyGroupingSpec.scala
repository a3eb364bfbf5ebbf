package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity with the reference's dependency grouping
  * (grouping/dependency_tests.rs): the five manifest parsers, python
  * normalization, Jaccard boundaries, pair-group semantics with the
  * deterministic `dep:<min>+<max>` id, and cross-ecosystem isolation.
  */
class DependencyGroupingSpec extends SparkSpec {
  import spark.implicits._

  private def parse(filename: String, content: String): Set[(String, String)] =
    DependencyGrouping.parseDependenciesOf(
      Seq(("t0", filename, content)).toDF("tenant_id", "filename", "content"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet

  test("parse_cargo_toml: sections, inline tables, dev-deps (dependency_tests.rs)") {
    val content = "\n[package]\nname = \"my-crate\"\n\n[dependencies]\nserde = \"1.0\"\n" +
      "tokio = { version = \"1.35\", features = [\"full\"] }\n\n" +
      "[dev-dependencies]\ntempfile = \"3.8\"\n"
    assert(parse("Cargo.toml", content) ==
      Set(("serde", "rust"), ("tokio", "rust"), ("tempfile", "rust")))
    // [package] name must NOT leak in
    assert(!parse("Cargo.toml", content).exists(_._1 == "name"))
  }

  test("parse_package_json: three dependency sections") {
    val content = """{"name": "my-app",
      "dependencies": {"express": "^4.18", "lodash": "^4.17"},
      "devDependencies": {"jest": "^29.0"}}"""
    assert(parse("package.json", content) ==
      Set(("express", "npm"), ("lodash", "npm"), ("jest", "npm")))
  }

  test("parse_requirements_txt: comments/options skipped, specs stripped") {
    val content = "\n# Core deps\nflask>=2.0\nrequests==2.31.0\nnumpy~=1.24\n" +
      "# Optional\npandas[sql]>=1.5\n-r other.txt\n"
    assert(parse("requirements.txt", content) == Set(("flask", "python"),
      ("requests", "python"), ("numpy", "python"), ("pandas", "python")))
  }

  test("parse_pyproject_toml: multi-line dependency list") {
    val content = "\n[project]\nname = \"my-project\"\ndependencies = [\n" +
      "    \"flask>=2.0\",\n    \"requests\",\n]\n"
    assert(parse("pyproject.toml", content) ==
      Set(("flask", "python"), ("requests", "python")))
  }

  test("parse_go_mod: require block + single-line require") {
    val content = "\nmodule github.com/example/myapp\n\ngo 1.21\n\nrequire (\n" +
      "\tgithub.com/gin-gonic/gin v1.9.1\n\tgithub.com/go-sql-driver/mysql v1.7.1\n)\n\n" +
      "require github.com/stretchr/testify v1.8.4\n"
    assert(parse("go.mod", content) == Set(
      ("github.com/gin-gonic/gin", "go"),
      ("github.com/go-sql-driver/mysql", "go"),
      ("github.com/stretchr/testify", "go")))
  }

  test("unrecognized manifests contribute nothing (parse_dependencies dispatch)") {
    assert(parse("setup.py", "install_requires=['foo']").isEmpty)
  }

  test("normalize_python_dep vectors") {
    val vectors = Seq("Flask>=2.0" -> "flask", "my_package" -> "my-package",
      "pandas[sql]>=1.5" -> "pandas")
    val out = vectors.map(_._1).toDF("d")
      .select(DependencyGrouping.normalizePythonDep(col("d"))).collect().map(_.getString(0))
    assert(out.toSeq == vectors.map(_._2))
    val empty = Seq("").toDF("d")
      .select(DependencyGrouping.normalizePythonDep(col("d"))).collect()
    assert(empty.head.isNullAt(0))
  }

  test("pair groups: deterministic ids, threshold boundaries, transitive pairs") {
    val deps = Seq(
      // proj-1/2/3: each pair Jaccard 2/4 = 0.5 → 3 pair groups
      ("proj-1", "serde"), ("proj-1", "tokio"), ("proj-1", "anyhow"),
      ("proj-2", "serde"), ("proj-2", "tokio"), ("proj-2", "tracing"),
      ("proj-3", "serde"), ("proj-3", "tokio"), ("proj-3", "clap"),
      // below threshold: 1 shared of 3+3 → 1/5 = 0.2
      ("low-a", "x1"), ("low-a", "x2"), ("low-a", "shared"),
      ("low-b", "y1"), ("low-b", "y2"), ("low-b", "shared")
    ).toDF("tenant_id", "dependency_name")
    val rows = DependencyGrouping.dependencyGroupsOf(deps).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val groups = rows.map(_._1).distinct
    assert(groups.toSeq == Seq("dep:proj-1+proj-2", "dep:proj-1+proj-3",
      "dep:proj-2+proj-3"), "3 pair groups, none for the 0.2 pair")
    assert(rows.forall(_._3 == 0.5))
    assert(rows.count(_._2 == "proj-1") == 2, "proj-1 sits in two pair groups")
  }

  test("cross-ecosystem manifests never group (dependency_tests.rs)") {
    val manifests = Seq(
      ("proj-rust", "Cargo.toml", "[dependencies]\nserde = \"1.0\"\ntokio = \"1.0\"\n"),
      ("proj-python", "requirements.txt", "flask>=2.0\ndjango>=4.0\n")
    ).toDF("tenant_id", "filename", "content")
    val out = DependencyGrouping.dependencyGroupsOf(
      DependencyGrouping.parseDependenciesOf(manifests))
    assert(out.isEmpty)
  }

  test("dependency_groups on the corpus: same-ecosystem pairs only") {
    val rows = DependencyGrouping.dependencyGroups(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // every group id is dep:<min>+<max> and lists exactly its two members
    rows.groupBy(_._1).foreach { case (gid, members) =>
      val ms = members.map(_._2).sorted
      assert(ms.length == 2 && gid == s"dep:${ms(0)}+${ms(1)}")
      assert(members.map(_._3).distinct.length == 1)
    }
    // similarities are the exact rationals of the synthetic profiles
    assert(rows.map(_._3).toSet.subsetOf(Set(0.5, 0.6, 1.0)))
  }
}
