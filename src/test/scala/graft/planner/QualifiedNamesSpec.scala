package graft.planner

import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftEngine, TestSpark}
import graft.mdl._
import graft.tools.SltRunner.BareNameResolver

/** Qualified-name resolution and reference-dialect acceptance added for slt
  * parity (round 7): catalog/schema-qualified model names, raw physical
  * tableReference access, Arrow-style cast type aliases, and pk-derived to-one
  * promotion for reversed relationship declarations.
  */
class QualifiedNamesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def deploySmall(): graft.GraftSession = {
    import spark.implicits._
    Seq((1, "alice", 10), (2, "bob", 20), (3, "carol", 10))
      .toDF("id", "name", "grp")
      .createOrReplaceTempView("phys_people")
    val manifest = Manifest(
      catalog = "wrenai", schema = "public",
      models = List(Model("People",
        tableReference = Some(TableReference(Some("warehouse"), Some("main"), "phys_people")),
        primaryKey = Some("Id"),
        columns = List(
          Column("Id", "int", expression = Some("id")),
          Column("Name", "varchar", expression = Some("name")),
          Column("Grp", "int", expression = Some("grp"))))))
    GraftEngine.deploy(spark, manifest, BareNameResolver)
  }

  test("catalog.schema and schema-only qualified model names resolve") {
    val s = deploySmall()
    assert(s.query("SELECT Name FROM wrenai.public.People ORDER BY Id").collect()
      .map(_.getString(0)).toSeq == Seq("alice", "bob", "carol"))
    assert(s.query("SELECT count(*) AS n FROM public.People").collect()
      .head.getLong(0) == 3)
    // qualified names inside subqueries rewrite too
    assert(s.query(
      "SELECT Name FROM People WHERE Grp IN (SELECT Grp FROM wrenai.public.People WHERE Id = 1)")
      .collect().map(_.getString(0)).sorted.toSeq == Seq("alice", "carol"))
  }

  test("a model's physical tableReference reads the raw source, not the model") {
    val s = deploySmall()
    // the raw scan exposes the SOURCE columns (lowercase), which the model renames
    val raw = s.query("SELECT id, name FROM warehouse.main.phys_people ORDER BY id")
    assert(raw.columns.toSeq == Seq("id", "name"))
    assert(raw.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    // an unrelated qualified name is untouched (and so fails resolution)
    intercept[Exception](s.query("SELECT 1 FROM some.other.table").collect())
  }

  test("Arrow-style type aliases in CAST parse (int64/int32/float64/datetime)") {
    val s = deploySmall()
    val row = s.query(
      "SELECT cast(1 as int64) a, cast(1 as int32) b, cast(1.5 as float64) c, " +
        "cast('2000-01-01 10:00:00' as datetime) d").collect().head
    assert(row.getLong(0) == 1L && row.getInt(1) == 1 && row.getDouble(2) == 1.5)
    assert(row.get(3) == java.time.LocalDateTime.of(2000, 1, 1, 10, 0, 0))
    // a single-quoted string literal containing the alias word is untouched
    assert(s.query("SELECT 'as int64' lit").collect().head.getString(0) == "as int64")
    // alias rewriting only engages on parse FAILURE: a legitimate column alias
    // that happens to be a type-alias word keeps its name
    assert(s.query("SELECT Id AS datetime FROM People LIMIT 1").columns.toSeq ==
      Seq("datetime"))
    assert(s.query("SELECT Id AS int64 FROM People LIMIT 1").columns.toSeq ==
      Seq("int64"))
  }

  test("reversed to-many declaration promotes to to-one when the pk is the join key") {
    import spark.implicits._
    Seq((1, "US"), (2, "EU")).toDF("id", "region").createOrReplaceTempView("phys_acct")
    Seq((10, 1), (11, 1), (12, 2)).toDF("id", "acct").createOrReplaceTempView("phys_evt")
    val manifest = Manifest(
      catalog = "wrenai", schema = "public",
      models = List(
        Model("Acct",
          tableReference = Some(TableReference(Some("w"), Some("m"), "phys_acct")),
          primaryKey = Some("Id"),
          columns = List(
            Column("Id", "int", expression = Some("id")),
            Column("Region", "varchar", expression = Some("region")))),
        Model("Evt",
          tableReference = Some(TableReference(Some("w"), Some("m"), "phys_evt")),
          primaryKey = Some("Id"),
          columns = List(
            Column("Id", "int", expression = Some("id")),
            Column("AcctId", "int", expression = Some("acct")),
            Column("Acct", "Acct", relationship = Some("evt_acct")),
            // scalar traversal of a relationship DECLARED to-many from Evt's
            // side ([Acct, Evt] MANY_TO_ONE reads Acct→Evt as to-one) — the
            // reference's own ecommerce fixture has this reversed shape; the
            // pk equality (Acct.Id) proves the hop safe
            Column("Region", "varchar", isCalculated = true,
              expression = Some("\"Acct\".\"Region\""))))),
      relationships = List(
        Relationship("evt_acct", List("Acct", "Evt"), JoinType.ManyToOne,
          "\"Acct\".\"Id\" = \"Evt\".\"AcctId\"")))
    val s = GraftEngine.deploy(spark, manifest, BareNameResolver)
    val out = s.query("SELECT Id, Region FROM Evt ORDER BY Id").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((10, "US"), (11, "US"), (12, "EU")))
    // count invariance: the promoted to-one join must not amplify
    assert(s.query("SELECT count(*) n FROM Evt").collect().head.getLong(0) == 3)
    // a genuinely amplifying scalar traversal still errors: no pk on the target
    val bad = manifest.copy(models = manifest.models.map(m =>
      if (m.name == "Acct") m.copy(primaryKey = None) else m))
    val e = intercept[GraftException](GraftEngine.deploy(spark, bad, BareNameResolver))
    assert(e.getMessage.contains("to-many"))
    // a pk equality hidden inside an OR branch proves nothing: one Evt row may
    // match multiple Acct rows, so the hop must stay to-many and error
    val orCond = manifest.copy(relationships = List(
      Relationship("evt_acct", List("Acct", "Evt"), JoinType.ManyToOne,
        "\"Acct\".\"Id\" = \"Evt\".\"AcctId\" OR \"Acct\".\"Region\" = 'US'")))
    val e2 = intercept[GraftException](GraftEngine.deploy(spark, orCond, BareNameResolver))
    assert(e2.getMessage.contains("to-many"))
  }
}
