package graft.memory

import scala.jdk.CollectionConverters._

/** The `queries.yml` exchange format — the reference dumps/loads NL→SQL pairs
  * as `{version: 1, exported_at: ..., pairs: [{nl, sql, source, datasource?,
  * created_at?}]}` (`wren/src/wren/memory/cli.py:517-538, 592-684`). snakeyaml
  * ships with Spark, so both directions are real YAML, not a subset parser.
  */
object MemoryYaml {

  /** Serialize dump rows ([[MemoryStore.dumpQueries]] maps) to YAML. */
  def pairsToYaml(rows: Seq[Map[String, Any]]): String = {
    def sourceOf(tags: String): String =
      tags.split("\\s+").collectFirst {
        case t if t.startsWith("source:") => t.stripPrefix("source:")
      }.getOrElse("user")
    val pairs = rows.map { r =>
      val m = new java.util.LinkedHashMap[String, Any]()
      m.put("nl", r.getOrElse("nl_query", ""))
      m.put("sql", r.getOrElse("sql_query", ""))
      m.put("source", sourceOf(r.getOrElse("tags", "").toString))
      r.get("datasource").map(_.toString).filter(_.nonEmpty)
        .foreach(m.put("datasource", _))
      r.get("created_at").foreach {
        case ts: java.sql.Timestamp => m.put("created_at", ts.toInstant.toString)
        case other if other != null => m.put("created_at", other.toString)
        case _ =>
      }
      m
    }
    val doc = new java.util.LinkedHashMap[String, Any]()
    doc.put("version", 1)
    doc.put("exported_at", java.time.Instant.now().toString)
    doc.put("pairs", pairs.asJava)
    val opts = new org.yaml.snakeyaml.DumperOptions()
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    opts.setAllowUnicode(true)
    new org.yaml.snakeyaml.Yaml(opts).dump(doc)
  }

  /** Parse a queries.yml document. Validation mirrors the reference's load
    * command (cli.py:634-654): a missing `pairs` key, a non-list, a version
    * other than 1, or a pair without nl/sql is an IllegalArgumentException
    * with the same message shape.
    */
  def parsePairs(yamlText: String): Seq[MemoryPair] = {
    val doc = new org.yaml.snakeyaml.Yaml().load[Any](yamlText) match {
      case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
      case _ => throw new IllegalArgumentException("invalid YAML — missing 'pairs' key.")
    }
    if (!doc.contains("pairs"))
      throw new IllegalArgumentException("invalid YAML — missing 'pairs' key.")
    val version = doc.getOrElse("version", 1) match {
      case i: java.lang.Integer => i.intValue()
      case other => other.toString.trim.toInt
    }
    if (version != 1)
      throw new IllegalArgumentException(s"unsupported version $version.")
    val pairs = doc("pairs") match {
      case l: java.util.List[_] => l.asScala.toList
      case _ => throw new IllegalArgumentException("'pairs' must be a list of objects.")
    }
    pairs.zipWithIndex.map {
      case (m: java.util.Map[_, _], i) =>
        val p = m.asInstanceOf[java.util.Map[String, Any]].asScala.toMap
        if (!p.contains("nl") || !p.contains("sql"))
          throw new IllegalArgumentException(s"pair #${i + 1} missing 'nl' or 'sql'.")
        MemoryPair(
          nl = p("nl").toString,
          sql = p("sql").toString,
          source = p.get("source").map(_.toString).getOrElse("user"),
          datasource = p.get("datasource").map(_.toString).filter(_.nonEmpty),
          createdAt = p.get("created_at").map(_.toString))
      case (_, i) =>
        throw new IllegalArgumentException(s"pair #${i + 1} is not an object.")
    }
  }
}
