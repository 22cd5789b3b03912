package graft.mdl

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.json4s._

/** MDL JSON ⇄ YAML-project conversion and project upgrades — the other half
  * of [[YamlProject]] (which compiles a project INTO a manifest): the
  * reference's `convert_mdl_to_project` / `write_project_files`
  * (`wren/src/wren/context.py:120-323`) and the schema-version upgrade
  * planner (`context.py:939-1070`). Round-trip law (ProjectConvertSpec):
  * `YamlProject.buildManifest(write(convert(mdl)))` equals the parsed
  * original.
  */
object ProjectConvert {

  final case class ProjectFile(relativePath: String, content: String)

  final case class UpgradeResult(
      fromVersion: Int, toVersion: Int,
      filesCreated: List[String], filesDeleted: List[String],
      filesModified: List[String])

  final class UpgradeError(msg: String) extends IllegalArgumentException(msg)

  /** camelCase → snake_case (inverse of YamlProject's key mapping). */
  private[mdl] def snake(key: String): String =
    key.flatMap(c => if (c.isUpper) s"_${c.toLower}" else c.toString)

  private def toSnakeYamlish(v: JValue): Any = v match {
    case JObject(fields) =>
      val out = new java.util.LinkedHashMap[String, Any]()
      fields.foreach { case (k, x) => out.put(snake(k), toSnakeYamlish(x)) }
      out
    case JArray(xs) => xs.map(toSnakeYamlish).asJava
    case JString(s) => s
    case JBool(b) => java.lang.Boolean.valueOf(b)
    case JInt(i) => java.lang.Long.valueOf(i.toLong)
    case JLong(i) => java.lang.Long.valueOf(i)
    case JDouble(d) => java.lang.Double.valueOf(d)
    case JDecimal(d) => java.lang.Double.valueOf(d.toDouble)
    case _ => null
  }

  private def yamlDump(v: Any): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    opts.setAllowUnicode(true)
    new org.yaml.snakeyaml.Yaml(opts).dump(v)
  }

  /** Whole-manifest snake_case YAML (the `context show --output yaml`
    * rendering — the project files' native key form).
    */
  def manifestYaml(mdlJson: String): String =
    yamlDump(toSnakeYamlish(org.json4s.jackson.JsonMethods.parse(mdlJson)))

  /** The scaffold/import guide dropped into every generated project —
    * the reference's `_AGENTS_MD_TEMPLATE` (context.py:20-46) with this
    * engine's command spellings.
    */
  val AgentsMd: String =
    """# AGENTS.md
      |
      |This project uses the graft engine as the semantic layer for data
      |querying. Queries are written against MDL model names, not raw tables.
      |
      |## Answering data questions
      |
      |1. `graft memory fetch --query "<question>"` — get relevant schema context
      |2. `graft memory recall --query "<question>" --limit 3` — similar past queries
      |3. Write SQL using model names from the MDL (not raw table names)
      |4. `graft <dataDir> <mdl> "<sql>"` — execute through the semantic layer
      |5. `graft memory store --nl "<question>" --sql "<sql>"` — store confirmed results
      |
      |## Modifying the data model
      |
      |1. Edit YAML files in `models/`, `views/`, or `relationships.yml`
      |2. `graft context validate` — check structure
      |3. `graft context build` — compile to `target/mdl.json`
      |4. `graft memory index` — re-index schema for search
      |""".stripMargin

  /** MDL JSON (camelCase) → project files (context.py:140-270): project
    * config with the layoutVersion→schema_version map {1→2, 2→3}, one
    * directory per model (inline `refSql` extracted to `ref_sql.sql`), one
    * per view (multi-line statements to `sql.yml`), `relationships.yml`,
    * optional `instructions.md` from `_instructions`, and AGENTS.md.
    */
  def convertMdlToProject(mdlJson: String): List[ProjectFile] = {
    val j = org.json4s.jackson.JsonMethods.parse(mdlJson)
    val files = scala.collection.mutable.ListBuffer.empty[ProjectFile]

    val layoutVersion = j \ "layoutVersion" match {
      case JInt(i) => i.toInt
      case _ => 1
    }
    val schemaVersion = Map(1 -> 2, 2 -> 3).getOrElse(
      layoutVersion, if (layoutVersion >= 2) 3 else 2)
    val cfg = new java.util.LinkedHashMap[String, Any]()
    cfg.put("schema_version", Integer.valueOf(schemaVersion))
    (j \ "name").toOption.orElse((j \ "projectName").toOption).collect {
      case JString(n) => cfg.put("name", n) }
    j \ "catalog" match { case JString(c) => cfg.put("catalog", c); case _ => () }
    j \ "schema" match { case JString(s) => cfg.put("schema", s); case _ => () }
    j \ "dataSource" match { case JString(d) => cfg.put("data_source", d); case _ => () }
    files += ProjectFile("wren_project.yml", yamlDump(cfg))

    def arr(v: JValue): List[JValue] = v match { case JArray(xs) => xs; case _ => Nil }

    arr(j \ "models").zipWithIndex.foreach { case (model, i) =>
      val m = toSnakeYamlish(model).asInstanceOf[java.util.LinkedHashMap[String, Any]]
      val name = Option(m.get("name")).map(_.toString).getOrElse(
        throw new IllegalArgumentException(
          s"Model at index $i is missing required 'name' field"))
      val refSql = Option(m.remove("ref_sql")).map(_.toString).filter(_.nonEmpty)
      refSql.foreach(sql =>
        files += ProjectFile(s"models/$name/ref_sql.sql", sql.trim + "\n"))
      files += ProjectFile(s"models/$name/metadata.yml", yamlDump(m))
    }

    arr(j \ "views").zipWithIndex.foreach { case (view, i) =>
      val v = toSnakeYamlish(view).asInstanceOf[java.util.LinkedHashMap[String, Any]]
      val name = Option(v.get("name")).map(_.toString).getOrElse(
        throw new IllegalArgumentException(
          s"View at index $i is missing required 'name' field"))
      val statement = Option(v.get("statement")).map(_.toString)
      statement match {
        case Some(st) if st.trim.contains("\n") =>
          v.remove("statement")
          val sqlDoc = new java.util.LinkedHashMap[String, Any]()
          sqlDoc.put("statement", st)
          files += ProjectFile(s"views/$name/sql.yml", yamlDump(sqlDoc))
        case _ => ()
      }
      files += ProjectFile(s"views/$name/metadata.yml", yamlDump(v))
    }

    val rels = arr(j \ "relationships").map(toSnakeYamlish)
    if (rels.nonEmpty) {
      val doc = new java.util.LinkedHashMap[String, Any]()
      doc.put("relationships", rels.asJava)
      files += ProjectFile("relationships.yml", yamlDump(doc))
    }

    j \ "_instructions" match {
      case JString(instr) if instr.nonEmpty =>
        files += ProjectFile("instructions.md", instr.trim + "\n")
      case _ => ()
    }

    files += ProjectFile("AGENTS.md", AgentsMd)
    files.toList
  }

  private val Managed = Seq("models", "views", "relationships.yml",
    "instructions.md", "wren_project.yml", "AGENTS.md")

  /** Write the files; without `force`, any existing target aborts with the
    * reference's conflict message; with it, the MANAGED set is cleaned first
    * (never the whole directory — user files survive). Paths escaping the
    * output dir abort (context.py:273-323).
    */
  def writeProjectFiles(
      files: List[ProjectFile], outputDir: Path, force: Boolean = false): Unit = {
    if (force && Files.exists(outputDir))
      Managed.foreach(m => graft.util.Fs.deleteTree(outputDir.resolve(m).toString))
    if (!force) {
      val conflicts = files.map(_.relativePath)
        .filter(p => Files.exists(outputDir.resolve(p)))
      if (conflicts.nonEmpty) {
        val names = conflicts.map(p => s"'${Path.of(p).getFileName}'").mkString(", ")
        throw new IllegalStateException(
          s"Error: $names already exists. Use --force to overwrite.")
      }
    }
    val root = outputDir.toAbsolutePath.normalize()
    files.foreach { f =>
      val path = outputDir.resolve(f.relativePath).toAbsolutePath.normalize()
      if (!path.startsWith(root))
        throw new IllegalStateException(
          s"Error: invalid output path: '${f.relativePath}'")
      Files.createDirectories(path.getParent)
      Files.write(path, f.content.getBytes("UTF-8"))
    }
  }

  // ── Schema-version upgrades (context.py:939-1070) ─────────────────────────

  private val SupportedSchemaVersions = Set(1, 2, 3)
  private val LatestSchemaVersion = 3

  def getSchemaVersion(projectPath: Path): Int =
    YamlProject.loadYamlMap(projectPath.resolve("wren_project.yml"))
      .get("schema_version").map(YamlProject.toInt).getOrElse(1)

  /** What an upgrade would do, without touching disk; no-op result when
    * already at target. Downgrades and unknown targets raise.
    */
  def planUpgrade(projectPath: Path, targetVersion: Option[Int] = None): UpgradeResult = {
    val current = getSchemaVersion(projectPath)
    val target = targetVersion.getOrElse(LatestSchemaVersion)
    if (!SupportedSchemaVersions(target))
      throw new UpgradeError(s"Unsupported target schema_version $target")
    if (target < current)
      throw new UpgradeError(
        s"Cannot downgrade from schema_version $current to $target")
    if (target == current)
      return UpgradeResult(current, target, Nil, Nil, Nil)
    val (created, deleted) =
      if (current == 1) planV1ToV2(projectPath) else (Nil, Nil)
    UpgradeResult(current, target, created, deleted, List("wren_project.yml"))
  }

  /** v1 flat files → v2 per-entity directories; v2→v3 changes only the
    * declared schema_version.
    */
  private def planV1ToV2(projectPath: Path): (List[String], List[String]) = {
    val created = scala.collection.mutable.ListBuffer.empty[String]
    val deleted = scala.collection.mutable.ListBuffer.empty[String]
    v1ModelFiles(projectPath).foreach { case (file, model) =>
      val name = model.get("name").map(_.toString)
        .getOrElse(file.getFileName.toString.stripSuffix(".yml"))
      if (model.get("ref_sql").exists(_.toString.nonEmpty))
        created += s"models/$name/ref_sql.sql"
      created += s"models/$name/metadata.yml"
      deleted += s"models/${file.getFileName}"
    }
    YamlProject.loadListFile(projectPath.resolve("views.yml"), "views").foreach { v =>
      v.get("name").map(_.toString).foreach { name =>
        if (v.get("statement").exists(_.toString.trim.contains("\n")))
          created += s"views/$name/sql.yml"
        created += s"views/$name/metadata.yml"
      }
    }
    if (Files.exists(projectPath.resolve("views.yml"))) deleted += "views.yml"
    (created.toList, deleted.toList)
  }

  private def v1ModelFiles(projectPath: Path): List[(Path, Map[String, Any])] = {
    val dir = projectPath.resolve("models")
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator().asScala.toList
      .filter(_.getFileName.toString.endsWith(".yml"))
      .sortBy(_.getFileName.toString)
      .map(f => f -> YamlProject.loadYamlMap(f)).filter(_._2.nonEmpty)
  }

  def applyUpgrade(projectPath: Path, result: UpgradeResult): Unit = {
    if (result.filesCreated.nonEmpty || result.filesDeleted.nonEmpty) {
      // v1 → v2 restructuring
      v1ModelFiles(projectPath).foreach { case (file, model0) =>
        var model = model0
        val name = model.get("name").map(_.toString)
          .getOrElse(file.getFileName.toString.stripSuffix(".yml"))
        val dir = projectPath.resolve("models").resolve(name)
        Files.createDirectories(dir)
        model.get("ref_sql").map(_.toString).filter(_.nonEmpty).foreach { sql =>
          Files.write(dir.resolve("ref_sql.sql"), (sql.trim + "\n").getBytes("UTF-8"))
          model = model - "ref_sql"
        }
        Files.write(dir.resolve("metadata.yml"),
          yamlDump(graft.api.Profiles.toJava(model)).getBytes("UTF-8"))
        Files.delete(file)
      }
      YamlProject.loadListFile(projectPath.resolve("views.yml"), "views")
        .foreach { v0 =>
          var v = v0
          v.get("name").map(_.toString).foreach { name =>
            val dir = projectPath.resolve("views").resolve(name)
            Files.createDirectories(dir)
            v.get("statement").map(_.toString).filter(_.trim.contains("\n"))
              .foreach { st =>
                val doc = new java.util.LinkedHashMap[String, Any]()
                doc.put("statement", st)
                Files.write(dir.resolve("sql.yml"), yamlDump(doc).getBytes("UTF-8"))
                v = v - "statement"
              }
            Files.write(dir.resolve("metadata.yml"),
              yamlDump(graft.api.Profiles.toJava(v)).getBytes("UTF-8"))
          }
        }
      Files.deleteIfExists(projectPath.resolve("views.yml"))
    }
    // bump the declared schema_version, preserving the other config keys
    val cfg = YamlProject.loadYamlMap(projectPath.resolve("wren_project.yml"))
    val out = graft.api.Profiles.toJava(
      cfg + ("schema_version" -> Integer.valueOf(result.toVersion)))
    Files.write(projectPath.resolve("wren_project.yml"),
      yamlDump(out).getBytes("UTF-8"))
  }
}
