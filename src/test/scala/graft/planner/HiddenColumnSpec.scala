package graft.planner

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._
import graft.tools.SltRunner.BareNameResolver

/** Hidden-column semantics, mirroring the reference's
  * `test_query_hidden_column` / `test_ralc_condition_contain_hidden`
  * (wren-core/core/src/mdl/mod.rs:1064,2630): a hidden column feeds
  * expression columns and RLAC conditions, but is absent from the model's
  * output — `SELECT *` omits it and selecting it directly is an error.
  */
class HiddenColumnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deployArtists(rlac: List[RowLevelAccessControl] = Nil,
      props: Map[String, String] = Map.empty): graft.GraftSession = {
    import spark.implicits._
    Seq((1, "Peko"), (2, "Gura"), (3, "Peko"))
      .toDF("id", "name").createOrReplaceTempView("hidden_src")
    val manifest = Manifest(
      catalog = "wren", schema = "test",
      models = List(Model("artist",
        tableReference = Some(TableReference(table = "hidden_src")),
        primaryKey = Some("id"),
        rowLevelAccessControls = rlac,
        columns = List(
          Column("id", "int"),
          Column("name", "varchar", isHidden = true),
          Column("twice", "varchar", expression = Some("name || name"))))))
    GraftEngine.deploy(spark, manifest, BareNameResolver, props)
  }

  test("hidden column feeds expressions but is absent from SELECT *") {
    val s = deployArtists()
    val star = s.query("SELECT * FROM artist ORDER BY id")
    assert(star.columns.toSeq == Seq("id", "twice"))
    assert(star.collect().map(_.getString(1)).toSeq ==
      Seq("PekoPeko", "GuraGura", "PekoPeko"))
    intercept[Exception](s.query("SELECT name FROM artist").collect())
  }

  test("an RLAC condition may reference a hidden column (reference parity)") {
    val s = deployArtists(rlac = List(RowLevelAccessControl(
      "hidden condition", Nil, "name = 'Peko'")))
    val rows = s.query("SELECT id FROM artist ORDER BY id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3))
    // and the hidden column still does not leak through the filtered output
    assert(s.query("SELECT * FROM artist").columns.toSeq == Seq("id", "twice"))
  }
}
