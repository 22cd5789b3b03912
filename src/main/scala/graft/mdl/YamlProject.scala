package graft.mdl

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.json4s._

/** YAML project → MDL manifest builder — the engine-side analogue of the reference
  * SDK's project compiler (`wren/src/wren/context.py:440-612` `load_models`/
  * `build_manifest`/`build_json`): a project directory of YAML files compiles into
  * the same Manifest the JSON deploy path takes.
  *
  * Layout (schema_version 1 = flat, 2/3 = per-entity directories):
  * {{{
  *   wren_project.yml            # name, catalog, schema, data_source, schema_version
  *   models/<m>.yml              # v1: one flat YAML per model
  *   models/<m>/metadata.yml     # v2/3: model dir; optional ref_sql.sql overrides
  *   models/<m>/ref_sql.sql      #       any inline ref_sql (context.py:488-494)
  *   views.yml | views/<v>/...   # v1 single file with `views:`; v2/3 dirs + sql.yml
  *   relationships.yml           # `relationships:` list
  * }}}
  *
  * YAML keys are snake_case (the SDK's native form); they are camelCased and fed
  * through the existing [[ManifestJson]] codec, so int-as-bool tolerance, the
  * tableReference string-or-object duality, and missing-field defaults behave
  * identically on both deploy paths. schema_version → layoutVersion follows the
  * reference map {1→1, 2→1, 3→2} (context.py:387).
  *
  * Parsing uses snakeyaml (bundled with Spark) — no new dependencies.
  */
object YamlProject {

  private val LayoutVersionMap = Map(1 -> 1, 2 -> 1, 3 -> 2)

  def buildManifest(projectPath: Path): Manifest =
    ManifestJson.fromJValue(buildJValue(projectPath))

  /** The compiled manifest as camelCase JSON text (the `target/mdl.json` artifact
    * of `wren context build`, context.py:613-619).
    */
  def buildManifestJson(projectPath: Path): String =
    org.json4s.jackson.JsonMethods.compact(buildJValue(projectPath))

  /** The camelCase manifest AST (exposed for tests and for `validate`). */
  private[mdl] def buildJValue(projectPath: Path): JValue = {
    val config = loadYamlMap(projectPath.resolve("wren_project.yml"))
    val sv = config.get("schema_version").map(toInt).getOrElse(1)
    val fields = List(
      "catalog" -> JString(config.get("catalog").map(_.toString).getOrElse("wren")),
      "schema" -> JString(config.get("schema").map(_.toString).getOrElse("public")),
      "models" -> JArray(loadModels(projectPath, sv).map(toJValueCamel)),
      "relationships" -> JArray(
        loadListFile(projectPath.resolve("relationships.yml"), "relationships")
          .map(toJValueCamel)),
      "views" -> JArray(loadViews(projectPath, sv).map(toJValueCamel)),
      "layoutVersion" -> JInt(BigInt(LayoutVersionMap.getOrElse(sv, 1)))) ++
      config.get("data_source").map(ds => "dataSource" -> JString(ds.toString))
    JObject(fields)
  }

  /** Project-level validation — the reference's `validate_project` checks
    * (context.py: required config, model name+columns, column name+type, exactly
    * one of table_reference/ref_sql, relationship model references, duplicate
    * names, view statements, primary_key existence). Returns human-readable
    * "[ERROR] path: message" strings; empty = valid.
    */
  def validate(projectPath: Path): List[String] = {
    val issues = scala.collection.mutable.ListBuffer[String]()
    val configFile = projectPath.resolve("wren_project.yml")
    if (!Files.exists(configFile)) issues += s"[ERROR] wren_project.yml: missing"
    val config = loadYamlMap(configFile)
    val sv = config.get("schema_version").map(toInt).getOrElse(1)
    val models = loadModels(projectPath, sv)
    val views = loadViews(projectPath, sv)
    val rels = loadListFile(projectPath.resolve("relationships.yml"), "relationships")

    models.foreach { m =>
      val name = m.get("name").map(_.toString).getOrElse("")
      val at = s"models/${if (name.isEmpty) "?" else name}"
      if (name.isEmpty) issues += s"[ERROR] $at: model has no name"
      val cols = m.get("columns") match {
        case Some(l: java.util.List[_]) => l.asScala.toList.collect {
          case mm: java.util.Map[_, _] =>
            mm.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        }
        case _ => Nil
      }
      if (cols.isEmpty) issues += s"[ERROR] $at: model has no columns"
      cols.foreach { c =>
        if (!c.contains("name")) issues += s"[ERROR] $at: column without a name"
        if (!c.contains("type"))
          issues += s"[ERROR] $at: column '${c.getOrElse("name", "?")}' has no type"
      }
      // Python-truthiness like the reference's `bool(model.get(...))`: an explicit
      // `table_reference: null` or empty mapping counts as ABSENT, so the
      // exactly-one rule still fires on it.
      def truthy(v: Any): Boolean = v match {
        case null => false
        case mm: java.util.Map[_, _] => !mm.isEmpty
        case l: java.util.List[_] => !l.isEmpty
        case b: java.lang.Boolean => b.booleanValue
        case n: java.lang.Number => n.doubleValue != 0
        case s => s.toString.nonEmpty
      }
      val hasRef = m.get("table_reference").exists(truthy)
      val hasSql = m.get("ref_sql").exists(truthy)
      if (hasRef == hasSql)
        issues += s"[ERROR] $at: needs exactly one of table_reference or ref_sql"
      m.get("primary_key").map(_.toString).foreach { pk =>
        if (!cols.exists(_.get("name").exists(_.toString == pk)))
          issues += s"[ERROR] $at: primary_key '$pk' is not a declared column"
      }
    }
    val modelNames = models.flatMap(_.get("name").map(_.toString))
    modelNames.groupBy(identity).filter(_._2.size > 1).keys.foreach(n =>
      issues += s"[ERROR] models: duplicate model name '$n'")
    views.foreach { v =>
      val name = v.get("name").map(_.toString).getOrElse("?")
      if (!v.get("statement").exists(_.toString.trim.nonEmpty))
        issues += s"[ERROR] views/$name: view has no statement"
    }
    rels.foreach { r =>
      val name = r.get("name").map(_.toString).getOrElse("?")
      r.get("models") match {
        case Some(l: java.util.List[_]) =>
          l.asScala.map(_.toString).filterNot(modelNames.contains).foreach(m =>
            issues += s"[ERROR] relationships/$name: unknown model '$m'")
        case _ => issues += s"[ERROR] relationships/$name: needs a models list"
      }
    }
    issues.toList
  }

  // ------------------------------------------------------------------ loaders

  private def loadModels(projectPath: Path, sv: Int): List[Map[String, Any]] =
    if (sv == 1) loadFlatDir(projectPath.resolve("models"))
    else loadEntityDirs(projectPath.resolve("models")).map { case (dir, meta) =>
      // ref_sql.sql takes precedence over inline ref_sql (context.py:488-494)
      val refSqlFile = dir.resolve("ref_sql.sql")
      if (Files.exists(refSqlFile)) {
        val sql = new String(Files.readAllBytes(refSqlFile), "UTF-8").trim
        if (sql.nonEmpty) meta + ("ref_sql" -> sql) else meta
      } else meta
    }

  private def loadViews(projectPath: Path, sv: Int): List[Map[String, Any]] =
    if (sv == 1) loadListFile(projectPath.resolve("views.yml"), "views")
    else loadEntityDirs(projectPath.resolve("views")).map { case (dir, meta) =>
      // sql.yml's statement takes precedence (context.py:595-600)
      val sqlFile = dir.resolve("sql.yml")
      if (Files.exists(sqlFile)) {
        loadYamlMap(sqlFile).get("statement").map(_.toString.trim).filter(_.nonEmpty)
          .map(st => meta + ("statement" -> st)).getOrElse(meta)
      } else meta
    }

  private[mdl] def loadFlatDir(dir: Path): List[Map[String, Any]] =
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator().asScala.toList
      .filter(_.getFileName.toString.endsWith(".yml")).sortBy(_.getFileName.toString)
      .map(loadYamlMap).filter(_.nonEmpty)

  private def loadEntityDirs(dir: Path): List[(Path, Map[String, Any])] =
    if (!Files.isDirectory(dir)) Nil
    else Files.list(dir).iterator().asScala.toList
      .filter(Files.isDirectory(_)).sortBy(_.getFileName.toString)
      .flatMap { d =>
        val meta = d.resolve("metadata.yml")
        if (Files.exists(meta)) Some(d -> loadYamlMap(meta)) else None
      }

  private[mdl] def loadListFile(file: Path, key: String): List[Map[String, Any]] =
    loadYamlMap(file).get(key) match {
      case Some(l: java.util.List[_]) => l.asScala.toList.collect {
        case m: java.util.Map[_, _] =>
          m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
      }
      case _ => Nil
    }

  private[mdl] def loadYamlMap(file: Path): Map[String, Any] =
    if (!Files.exists(file)) Map.empty
    else new org.yaml.snakeyaml.Yaml()
      .load[Any](new String(Files.readAllBytes(file), "UTF-8")) match {
      case m: java.util.Map[_, _] =>
        m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
      case _ => Map.empty
    }

  // --------------------------------------------------------------- conversion

  private[mdl] def toInt(v: Any): Int = v match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long => l.intValue()
    case s => s.toString.trim.toInt
  }

  /** snake_case → camelCase (keys only; `_` prefixed internals dropped). */
  private def camel(key: String): String = {
    val parts = key.split("_").filter(_.nonEmpty)
    if (parts.isEmpty) key
    else parts.head + parts.tail.map(p => p.head.toUpper +: p.tail).mkString
  }

  private def toJValueCamel(v: Any): JValue = v match {
    case m: Map[_, _] => JObject(
      m.asInstanceOf[Map[String, Any]].toList
        .filterNot(_._1.startsWith("_"))
        .map { case (k, vv) => camel(k) -> toJValueCamel(vv) })
    case m: java.util.Map[_, _] =>
      toJValueCamel(m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap)
    case l: java.util.List[_] => JArray(l.asScala.toList.map(toJValueCamel))
    case l: List[_] => JArray(l.map(toJValueCamel))
    case b: java.lang.Boolean => JBool(b)
    case i: java.lang.Integer => JInt(BigInt(i.intValue()))
    case l: java.lang.Long => JInt(BigInt(l.longValue()))
    case d: java.lang.Double => JDouble(d)
    case null => JNull
    case s => JString(s.toString)
  }
}
