package graft.mdl

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** YAML project compiler: directory layout → Manifest, end-to-end deploy, and the
  * reference's project validation checks.
  */
class YamlProjectSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def write(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
  }

  /** A v3 (dir-based) project over the test nation/region tables. */
  private def makeProject(): Path = {
    val root = Files.createTempDirectory("graft_yamlproj_")
    write(root.resolve("wren_project.yml"),
      """name: demo
        |catalog: g
        |schema: yp
        |schema_version: 3
        |""".stripMargin)
    write(root.resolve("models/nation_m/metadata.yml"),
      """name: nation_m
        |table_reference:
        |  table: nation
        |primary_key: n_key
        |columns:
        |  - name: n_key
        |    type: bigint
        |    expression: n_nationkey
        |  - name: n_name
        |    type: varchar
        |    expression: n_name
        |  - name: region_key
        |    type: int
        |    expression: n_regionkey
        |""".stripMargin)
    write(root.resolve("models/region_top/metadata.yml"),
      """name: region_top
        |columns:
        |  - name: r_key
        |    type: int
        |  - name: r_name
        |    type: varchar
        |""".stripMargin)
    // ref_sql.sql takes precedence over any inline ref_sql
    write(root.resolve("models/region_top/ref_sql.sql"),
      "SELECT r_regionkey AS r_key, r_name FROM region")
    write(root.resolve("views/nations_per_region/metadata.yml"),
      "name: nations_per_region\n")
    write(root.resolve("views/nations_per_region/sql.yml"),
      """statement: |
        |  SELECT region_key, count(*) AS n FROM nation_m GROUP BY region_key
        |""".stripMargin)
    write(root.resolve("relationships.yml"),
      """relationships:
        |  - name: nation_region
        |    models: [nation_m, region_top]
        |    join_type: MANY_TO_ONE
        |    condition: nation_m.region_key = region_top.r_key
        |""".stripMargin)
    root
  }

  test("YAML project compiles to a deployable manifest (camelCase codec path)") {
    val root = makeProject()
    val manifest = YamlProject.buildManifest(root)
    assert(manifest.catalog == "g" && manifest.schema == "yp")
    assert(manifest.layoutVersion == 2) // schema_version 3 -> layoutVersion 2
    assert(manifest.models.map(_.name).toSet == Set("nation_m", "region_top"))
    val nation = manifest.models.find(_.name == "nation_m").get
    assert(nation.tableReference.exists(_.table == "nation"))
    assert(nation.primaryKey.contains("n_key"))
    assert(manifest.models.find(_.name == "region_top").get.refSql
      .exists(_.startsWith("SELECT r_regionkey")))
    assert(manifest.views.head.statement.contains("GROUP BY region_key"))
    assert(manifest.relationships.head.joinType == "MANY_TO_ONE")
    assert(YamlProject.validate(root).isEmpty)

    // end-to-end: deploy the compiled manifest and run a cross-model query
    val session = graft.GraftEngine.deployOnDir(spark, manifest, graft.TestSpark.sfDir)
    val rows = session.query(
      """SELECT r.r_name, count(*) AS n
        |FROM nation_m n JOIN region_top r ON n.region_key = r.r_key
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin).collect()
    assert(rows.length == 5 && rows.map(_.getLong(1)).sum == 25)
    val viaView = session.query(
      "SELECT sum(n) AS total FROM nations_per_region").collect()
    assert(viaView.head.getLong(0) == 25)
  }

  test("project validation reports the reference's error classes") {
    val root = Files.createTempDirectory("graft_yamlproj_bad_")
    write(root.resolve("wren_project.yml"), "schema_version: 3\n")
    write(root.resolve("models/bad/metadata.yml"),
      """name: bad
        |table_reference:
        |  table: t
        |primary_key: nope
        |columns:
        |  - name: a
        |    type: int
        |""".stripMargin)
    // both table_reference AND ref_sql -> exactly-one violation
    write(root.resolve("models/bad/ref_sql.sql"), "SELECT 1 AS a")
    write(root.resolve("models/empty/metadata.yml"), "name: empty\n")
    write(root.resolve("views/v/metadata.yml"), "name: v\n") // no statement
    write(root.resolve("relationships.yml"),
      """relationships:
        |  - name: r1
        |    models: [bad, ghost]
        |    join_type: ONE_TO_ONE
        |    condition: 1 = 1
        |""".stripMargin)
    // explicit `table_reference: null` (and no ref_sql) is ABSENT under the
    // reference's truthiness rule -> exactly-one violation, not a pass
    write(root.resolve("models/nullref/metadata.yml"),
      """name: nullref
        |table_reference: null
        |columns:
        |  - name: a
        |    type: int
        |""".stripMargin)
    val issues = YamlProject.validate(root)
    assert(issues.exists(i => i.contains("nullref")
      && i.contains("exactly one of table_reference or ref_sql")))
    assert(issues.exists(_.contains("exactly one of table_reference or ref_sql")))
    assert(issues.exists(_.contains("primary_key 'nope'")))
    assert(issues.exists(_.contains("model has no columns")))
    assert(issues.exists(_.contains("view has no statement")))
    assert(issues.exists(_.contains("unknown model 'ghost'")))
  }

  test("v1 flat layout: models/*.yml and views.yml") {
    val root = Files.createTempDirectory("graft_yamlproj_v1_")
    write(root.resolve("wren_project.yml"), "catalog: g\nschema: v1\n")
    write(root.resolve("models/r.yml"),
      """name: r
        |ref_sql: SELECT 1 AS one
        |columns:
        |  - name: one
        |    type: int
        |""".stripMargin)
    write(root.resolve("views.yml"),
      """views:
        |  - name: vv
        |    statement: SELECT one FROM r
        |""".stripMargin)
    val m = YamlProject.buildManifest(root)
    assert(m.layoutVersion == 1)
    assert(m.models.head.refSql.contains("SELECT 1 AS one"))
    assert(m.views.head.name == "vv")
    assert(YamlProject.validate(root).isEmpty)
  }
}
