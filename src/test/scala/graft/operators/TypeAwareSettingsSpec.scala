package graft.operators

import graft.SparkSpec

/** Parity with the reference's type-aware processing settings
  * (daemon/core/src/type_aware_processor.rs): the five settings rows,
  * name→type routing per the module-header conventions, and batch
  * sizing over the corpus query.
  */
class TypeAwareSettingsSpec extends SparkSpec {

  test("the five settings rows match type_aware_processor.rs:37-88") {
    val rows = TypeAwareSettings.settingsTable(spark).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toMap
    assert(rows == Map(
      "system" -> (50, 3, 4, 600),
      "library" -> (100, 5, 3, 900),
      "project" -> (150, 10, 2, 300),
      "global" -> (200, 8, 5, 1800),
      "unknown" -> (100, 5, 1, 300)))
  }

  test("name routing: __ before _, the global sentinel, dashed project, else unknown") {
    import spark.implicits._
    val out = TypeAwareSettings.settingsFor(
      Seq(("__sysA", 10L), ("_libx", 10L), ("global", 10L),
        ("proj-docs", 10L), ("scratch", 10L))
        .toDF("collection_name", "n_docs")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map(
      "__sysA" -> "system", "_libx" -> "library", "global" -> "global",
      "proj-docs" -> "project", "scratch" -> "unknown"))
  }

  test("n_batches is ceil(n_docs / batch_size) per the resolved type") {
    import spark.implicits._
    val out = TypeAwareSettings.settingsFor(
      Seq(("__s", 101L), ("p-x", 150L), ("p-y", 151L))
        .toDF("collection_name", "n_docs")).collect()
      .map(r => r.getString(0) -> r.getLong(7)).toMap
    assert(out == Map("__s" -> 3L, "p-x" -> 1L, "p-y" -> 2L))
  }

  test("type_settings on the corpus covers all five types") {
    val rows = TypeAwareSettings.typeSettings(spark, sfDir).collect()
    assert(rows.map(_.getString(1)).toSet ==
      Set("system", "library", "project", "global", "unknown"))
    rows.foreach { r =>
      val expected = math.ceil(r.getLong(6).toDouble / r.getInt(2)).toLong
      assert(r.getLong(7) == expected)
    }
  }
}
