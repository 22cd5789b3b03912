package graft.memory

import graft.mdl._

/** One indexable element of an MDL manifest, with the synthesized description
  * text the memory embeds. Mirrors the reference's schema-item record shape
  * (`wren/src/wren/memory/schema_indexer.py:131-260` and the `schema_items`
  * table schema in `store.py:34-48`).
  */
final case class SchemaItem(
    text: String,
    itemType: String, // model | column | relationship | view
    modelName: String,
    itemName: String,
    dataType: Option[String],
    expression: Option[String],
    isCalculated: Boolean,
    mdlHash: String)

/** Pure manifest → indexable-records extraction (no Spark, no storage) — the
  * reference splits the same way (`schema_indexer.py` is dependency-free).
  */
object SchemaIndexer {

  /** Deterministic 16-hex-char SHA-256 fingerprint of the manifest's canonical
    * JSON (`schema_indexer.py:13-22`; the reference excludes `_`-prefixed aux
    * keys — our typed Manifest never carries them, and [[ManifestJson.canonical]]
    * is key-sorted like its `json.dumps(sort_keys=True)`).
    */
  def manifestHash(m: Manifest): String = {
    val raw = ManifestJson.canonical(m)
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(raw.getBytes("UTF-8"))
    digest.take(8).map(b => f"$b%02x").mkString
  }

  /** Below this plain-text size the FULL schema description beats embedding
    * search (one LLM context window sees every join path); ~30K chars ≈ 8K
    * tokens (`schema_indexer.py:25-35`).
    */
  val SchemaDescribeThreshold = 30000

  // ── Plain-text description (describe_schema, schema_indexer.py:38-128) ──

  def describeSchema(m: Manifest): String = {
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    if (m.catalog.nonEmpty || m.schema.nonEmpty) {
      lines += s"Catalog: ${m.catalog}, Schema: ${m.schema}"
      lines += ""
    }
    m.models.foreach { md =>
      val desc = md.description.map(d => s" — $d").getOrElse("")
      lines += s"### Model: ${md.name}$desc"
      md.primaryKey.foreach(pk => lines += s"  Primary key: $pk")
      if (md.columns.nonEmpty) {
        lines += "  Columns:"
        md.columns.foreach { c =>
          val parts = new StringBuilder(s"    - ${c.name} (${c.`type`})")
          c.description.foreach(d => parts ++= s" — $d")
          if (c.isCalculated) c.expression.foreach(e => parts ++= s" [calculated: $e]")
          c.relationship.foreach(r => parts ++= s" [relationship: $r]")
          if (c.notNull) parts ++= " NOT NULL"
          lines += parts.toString
        }
      }
      lines += ""
    }
    m.relationships.foreach { r =>
      val left = r.models.headOption.getOrElse("?")
      val right = if (r.models.size > 1) r.models(1) else "?"
      lines += s"### Relationship: ${r.name}"
      lines += s"  $left → $right (${r.joinType})"
      if (r.condition.nonEmpty) lines += s"  Condition: ${r.condition}"
      lines += ""
    }
    m.views.foreach { v =>
      lines += s"### View: ${v.name}"
      if (v.statement.nonEmpty) lines += s"  SQL: ${v.statement}"
      lines += ""
    }
    lines.mkString("\n")
  }

  // ── Record extraction (extract_schema_items, schema_indexer.py:131-153) ──

  def extractSchemaItems(m: Manifest): Seq[SchemaItem] = {
    val h = manifestHash(m)
    val models = m.models.flatMap { md =>
      modelRecord(md, h) +: md.columns.map(columnRecord(_, md.name, h))
    }
    val rels = m.relationships.map(relationshipRecord(_, h))
    val views = m.views.map(viewRecord(_, h))
    models ++ rels ++ views
  }

  private def modelRecord(md: Model, h: String): SchemaItem = {
    val colSummaries = md.columns.take(20)
      .map(c => s"${c.name} (${c.`type`})").mkString(", ")
    val parts = new StringBuilder(s"Model '${md.name}'")
    md.description.foreach(d => parts ++= s": $d")
    parts ++= s". Columns: $colSummaries"
    md.primaryKey.foreach(pk => parts ++= s". Primary key: $pk")
    SchemaItem(parts.toString + ".", "model", md.name, md.name, None, None,
      isCalculated = false, mdlHash = h)
  }

  private def columnRecord(c: Column, modelName: String, h: String): SchemaItem = {
    val parts = new StringBuilder(s"Column '${c.name}' (${c.`type`}) in model '$modelName'")
    c.description.foreach(d => parts ++= s": $d")
    if (c.isCalculated) c.expression.foreach(e => parts ++= s". Calculated: $e")
    c.relationship.foreach(r => parts ++= s". Relationship: $r")
    SchemaItem(parts.toString + ".", "column", modelName, c.name,
      Some(c.`type`).filter(_.nonEmpty), c.expression, c.isCalculated, h)
  }

  private def relationshipRecord(r: Relationship, h: String): SchemaItem = {
    val left = r.models.headOption.getOrElse("?")
    val right = if (r.models.size > 1) r.models(1) else "?"
    SchemaItem(
      s"Relationship '${r.name}': $left → $right (${r.joinType}). Condition: ${r.condition}.",
      "relationship", left, r.name, None,
      Some(r.condition).filter(_.nonEmpty), isCalculated = false, mdlHash = h)
  }

  private def viewRecord(v: View, h: String): SchemaItem = {
    val truncated =
      if (v.statement.length > 200) v.statement.take(200) + "…" else v.statement
    SchemaItem(s"View '${v.name}'. SQL: $truncated", "view", "", v.name, None,
      Some(v.statement).filter(_.nonEmpty), isCalculated = false, mdlHash = h)
  }
}
