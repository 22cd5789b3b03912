package graft.mdl

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.ContextCli

/** MDL → YAML-project conversion round-trips through the project COMPILER:
  * `YamlProject.buildManifest(write(convert(mdl)))` must equal the parsed
  * original — the two directions ([[ProjectConvert]] here,
  * `context.py:140-270`; [[YamlProject]], `context.py:440-612`) check each
  * other. Plus the write conflict/force/path-guard contract, the v1→v2→v3
  * upgrade planner, and the context CLI surface.
  */
class ProjectConvertSpec extends AnyFunSuite {

  /** Directory layouts load name-sorted, and the v2 `ref_sql.sql` path trims
    * where a v1 YAML block scalar keeps its trailing newline — normalize both
    * before comparing (whitespace-identical SQL, same plan).
    */
  private def normalized(m: Manifest): Manifest = m.copy(
    models = m.models.sortBy(_.name).map(md => md.copy(refSql = md.refSql.map(_.trim))),
    views = m.views.sortBy(_.name).map(v => v.copy(statement = v.statement.trim)))

  private val mdlJson =
    """{"catalog":"pc","schema":"demo","dataSource":"duckdb","layoutVersion":2,
      |"models":[
      |  {"name":"orders","tableReference":{"table":"orders"},"primaryKey":"o_orderkey",
      |   "columns":[
      |     {"name":"o_orderkey","type":"bigint","notNull":true},
      |     {"name":"o_total","type":"double","expression":"o_totalprice + 0"},
      |     {"name":"customer","type":"customer","relationship":"oc"},
      |     {"name":"seg","type":"varchar","isCalculated":true,
      |      "expression":"\"customer\".\"c_mktsegment\""}]},
      |  {"name":"daily","refSql":"SELECT 1 AS d\nFROM orders",
      |   "columns":[{"name":"d","type":"int"}]}],
      |"relationships":[{"name":"oc","models":["orders","customer_x"],
      |  "joinType":"MANY_TO_ONE","condition":"a = b"}],
      |"views":[
      |  {"name":"v_one","statement":"SELECT 1"},
      |  {"name":"v_multi","statement":"SELECT o_orderkey\nFROM orders\nWHERE o_orderkey > 0"}]
      |}""".stripMargin

  test("convert → write → buildManifest round-trips the manifest") {
    val files = ProjectConvert.convertMdlToProject(mdlJson)
    val paths = files.map(_.relativePath)
    assert(paths.contains("wren_project.yml") && paths.contains("AGENTS.md"))
    assert(paths.contains("models/orders/metadata.yml"))
    assert(paths.contains("models/daily/ref_sql.sql"),
      "inline refSql extracts to a .sql file")
    assert(paths.contains("views/v_multi/sql.yml"),
      "multi-line statements go to sql.yml")
    assert(!paths.contains("views/v_one/sql.yml"),
      "single-line statements stay inline")
    assert(paths.contains("relationships.yml"))
    // layoutVersion 2 → schema_version 3
    assert(files.find(_.relativePath == "wren_project.yml").get
      .content.contains("schema_version: 3"))

    val dir = Files.createTempDirectory("graft_convert_")
    ProjectConvert.writeProjectFiles(files, dir)
    // the compiled project equals the original manifest — both directions
    // of the codec check each other (views compile with layoutVersion from
    // schema_version, so compare through the parsed forms)
    // entity dirs load name-sorted, so compare through a name-sorted view
    val original = normalized(ManifestJson.parse(mdlJson))
    val rebuilt = normalized(YamlProject.buildManifest(dir))
    assert(rebuilt == original,
      s"round-trip drifted:\n$rebuilt\nvs\n$original")
    // …and the relationship validator still flags the unknown model
    assert(YamlProject.validate(dir).exists(_.contains("unknown model 'customer_x'")))
  }

  test("write: conflicts abort without --force; force replaces managed files only") {
    val files = ProjectConvert.convertMdlToProject(mdlJson)
    val dir = Files.createTempDirectory("graft_convert_")
    ProjectConvert.writeProjectFiles(files, dir)
    val e = intercept[IllegalStateException] {
      ProjectConvert.writeProjectFiles(files, dir)
    }
    assert(e.getMessage.contains("already exists. Use --force to overwrite."))
    // a user file outside the managed set survives a forced rewrite
    Files.write(dir.resolve("NOTES.md"), "mine".getBytes("UTF-8"))
    ProjectConvert.writeProjectFiles(files, dir, force = true)
    assert(Files.exists(dir.resolve("NOTES.md")))
    assert(normalized(YamlProject.buildManifest(dir)) == normalized(ManifestJson.parse(mdlJson)))
    // path traversal rejected
    val evil = List(ProjectConvert.ProjectFile("../evil.yml", "x"))
    assert(intercept[IllegalStateException] {
      ProjectConvert.writeProjectFiles(evil, dir, force = true)
    }.getMessage.contains("invalid output path"))
  }

  test("upgrade: v1 flat layout restructures to v2 dirs, v2→v3 bumps only") {
    val dir = Files.createTempDirectory("graft_upgrade_")
    def write(rel: String, content: String): Unit = {
      val p = dir.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes("UTF-8"))
    }
    write("wren_project.yml", "schema_version: 1\ncatalog: up\nschema: demo\n")
    write("models/orders.yml",
      "name: orders\ntable_reference:\n  table: orders\ncolumns:\n" +
        "  - name: o_orderkey\n    type: bigint\n")
    write("models/daily.yml",
      "name: daily\nref_sql: |\n  SELECT 1 AS d\ncolumns:\n  - name: d\n    type: int\n")
    write("views.yml",
      "views:\n  - name: v_multi\n    statement: |\n      SELECT 1\n      FROM orders\n")
    val before = YamlProject.buildManifest(dir)

    val plan = ProjectConvert.planUpgrade(dir, Some(2))
    assert(plan.filesCreated.contains("models/orders/metadata.yml"))
    assert(plan.filesCreated.contains("models/daily/ref_sql.sql"))
    assert(plan.filesCreated.contains("views/v_multi/sql.yml"))
    assert(plan.filesDeleted.contains("models/orders.yml") &&
      plan.filesDeleted.contains("views.yml"))
    ProjectConvert.applyUpgrade(dir, plan)
    assert(ProjectConvert.getSchemaVersion(dir) == 2)
    assert(!Files.exists(dir.resolve("models/orders.yml")))
    assert(Files.exists(dir.resolve("models/daily/ref_sql.sql")))
    // the upgraded project compiles to the same models/views (layoutVersion
    // follows schema_version {1,2}→1, so compare the structural parts)
    val after = YamlProject.buildManifest(dir)
    assert(normalized(after).models == normalized(before).models &&
      normalized(after).views == normalized(before).views)

    // v2 → 3: schema_version-only change
    val plan23 = ProjectConvert.planUpgrade(dir, Some(3))
    assert(plan23.filesCreated.isEmpty && plan23.filesDeleted.isEmpty)
    ProjectConvert.applyUpgrade(dir, plan23)
    assert(ProjectConvert.getSchemaVersion(dir) == 3)
    // no-op + guarded downgrades
    assert(ProjectConvert.planUpgrade(dir, Some(3)).filesModified.isEmpty)
    assert(intercept[ProjectConvert.UpgradeError] {
      ProjectConvert.planUpgrade(dir, Some(2))
    }.getMessage.contains("Cannot downgrade"))
    assert(intercept[ProjectConvert.UpgradeError] {
      ProjectConvert.planUpgrade(dir, Some(9))
    }.getMessage.contains("Unsupported target"))
  }

  test("context CLI: init --from-mdl / validate / build / show / upgrade / instructions") {
    val dir = Files.createTempDirectory("graft_ctx_").toString
    val mdlFile = Files.createTempFile("graft_ctx_", ".json")
    Files.write(mdlFile, mdlJson.replace("customer_x", "orders").getBytes("UTF-8"))
    val imported = ContextCli.run(Seq(
      "init", "--from-mdl", mdlFile.toString, "--path", dir))
    assert(imported.contains(s"Imported MDL to YAML project at $dir/"))
    assert(imported.contains("2 models, 2 views, 1 relationships"))
    assert(ContextCli.run(Seq("validate", "--path", dir)) == "Project is valid.")
    val built = ContextCli.run(Seq("build", "--path", dir))
    assert(built.contains("target") && built.contains("mdl.json"))
    assert(Files.exists(Paths.get(dir, "target", "mdl.json")))
    val summary = ContextCli.run(Seq("show", "--path", dir))
    assert(summary.contains("Models (2):") &&
      summary.contains("daily  (ref_sql, 1 columns, pk=—)"))
    assert(ContextCli.run(Seq("show", "--path", dir, "--output", "json"))
      .contains("\"catalog\" : \"pc\""))
    // yaml output is the project files' native snake_case form
    val yaml = ContextCli.run(Seq("show", "--path", dir, "--output", "yaml"))
    assert(yaml.contains("catalog: pc") && yaml.contains("table_reference:"), yaml)
    assert(intercept[IllegalArgumentException] {
      ContextCli.run(Seq("show", "--path", dir, "--output", "xml"))
    }.getMessage.contains("unsupported output format 'xml'"))
    assert(ContextCli.run(Seq("upgrade", "--path", dir))
      .contains("Already at schema_version 3."))
    assert(ContextCli.run(Seq("instructions", "--path", dir)) == "")

    // scaffold init: conflicts abort, --empty skips the example
    val fresh = Files.createTempDirectory("graft_ctx2_").toString
    assert(ContextCli.run(Seq("init", "--path", fresh, "--empty"))
      .contains("Initialized project"))
    assert(Files.exists(Paths.get(fresh, "wren_project.yml")))
    assert(!Files.exists(Paths.get(fresh, "models", "example")))
    assert(intercept[IllegalStateException] {
      ContextCli.run(Seq("init", "--path", fresh))
    }.getMessage.contains("already exists. Use --force"))
    // a broken project fails `build` loudly with the validation messages
    val metaDir = Paths.get(fresh, "models", "broken")
    Files.createDirectories(metaDir)
    Files.write(metaDir.resolve("metadata.yml"), "name: broken\n".getBytes("UTF-8"))
    assert(intercept[IllegalStateException] {
      ContextCli.run(Seq("build", "--path", fresh))
    }.getMessage.contains("model has no columns"))
  }

  test("discoverProjectPath: explicit > env > walk-up > error") {
    val proj = Files.createTempDirectory("graft_disc_")
    Files.write(proj.resolve("wren_project.yml"), "catalog: d\n".getBytes("UTF-8"))
    val sub = Files.createDirectories(proj.resolve("x/y"))
    assert(ContextCli.discoverProjectPath(Some("/explicit")) == Paths.get("/explicit"))
    assert(ContextCli.discoverProjectPath(None, cwd = sub) == proj)
    val nowhere = Files.createTempDirectory("graft_disc2_")
    assert(intercept[IllegalArgumentException] {
      ContextCli.discoverProjectPath(None, cwd = nowhere)
    }.getMessage.contains("no project found"))
  }
}
