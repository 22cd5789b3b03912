package graft.api

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The CLI core across its output modes (table/json/plan/dry-run) and with session
  * properties — the scripted analogue of the HTTP header variables.
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val manifest =
    """{"catalog":"cli","schema":"demo","models":[
      |  {"name":"cli_nation","tableReference":"nation","primaryKey":"n_nationkey",
      |   "columns":[{"name":"n_nationkey","type":"int"},{"name":"n_name","type":"varchar"}],
      |   "rowLevelAccessControls":[
      |     {"name":"key_gate","requiredProperties":[{"name":"max_key","required":false,
      |       "defaultExpr":"100"}],
      |      "condition":"n_nationkey <= @max_key"}]}
      |]}""".stripMargin

  test("table, json, plan, and dry-run modes") {
    val table = Cli.run(spark, TestSpark.sfDir, manifest,
      "SELECT n_nationkey, n_name FROM cli_nation ORDER BY n_nationkey LIMIT 3")
    assert(table.linesIterator.next() == "n_nationkey\tn_name" && table.linesIterator.size == 4)

    val json = Cli.run(spark, TestSpark.sfDir, manifest,
      "SELECT count(*) AS n FROM cli_nation", mode = "json")
    assert(json.contains("\"columns\"") && json.contains("\"n\""))

    val plan = Cli.run(spark, TestSpark.sfDir, manifest,
      "SELECT n_name FROM cli_nation", mode = "plan")
    assert(plan.contains("Relation") || plan.contains("Project"))

    assert(Cli.run(spark, TestSpark.sfDir, manifest,
      "SELECT n_name FROM cli_nation", mode = "dry-run") == "OK")
  }

  test("a YAML project directory deploys through the CLI (wren context build parity)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cli_proj_")
    def write(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    }
    write("wren_project.yml", "catalog: g\nschema: cli\nschema_version: 3\n")
    write("models/proj_nation/metadata.yml",
      """name: proj_nation
        |table_reference:
        |  table: nation
        |columns:
        |  - name: n_nationkey
        |    type: int
        |  - name: n_name
        |    type: varchar
        |""".stripMargin)
    val out = Cli.run(spark, TestSpark.sfDir, root.toString,
      "SELECT count(*) AS n FROM proj_nation", mode = "json")
    assert(out.contains("25"))
    // an invalid project aborts with the validation messages
    write("models/broken/metadata.yml", "name: broken\n")
    val err = intercept[IllegalArgumentException] {
      Cli.run(spark, TestSpark.sfDir, root.toString, "SELECT 1")
    }
    assert(err.getMessage.contains("model has no columns"))
  }

  test("session properties flow through -P style map") {
    val restricted = Cli.run(spark, TestSpark.sfDir, manifest,
      "SELECT count(*) AS n FROM cli_nation", mode = "json",
      props = Map("max_key" -> "2"))
    // 3 nations with key <= 2 vs all 25 under the default property
    assert(restricted.contains("[[3]]") || restricted.contains("[3]"), restricted)
  }
}
