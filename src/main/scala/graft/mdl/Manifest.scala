package graft.mdl

import org.json4s._
import org.json4s.jackson.JsonMethods

/** MDL (semantic-layer manifest) data model.
  *
  * Mirrors the reference manifest surface (wren-core-base/manifest-macro/src/lib.rs:40-599):
  * models over physical tables or SQL, expression-backed / calculated / relationship
  * columns, cardinality-typed relationships, views, cubes, and row/column-level access
  * control. JSON is camelCase; booleans tolerate 0/1 ints
  * (wren-core-base/src/mdl/manifest.rs:295-318); tableReference accepts either an
  * object or a dotted string (manifest.rs:215-293).
  */
final case class Manifest(
    catalog: String,
    schema: String,
    models: List[Model] = Nil,
    relationships: List[Relationship] = Nil,
    views: List[View] = Nil,
    cubes: List[Cube] = Nil,
    dataSource: Option[String] = None,
    layoutVersion: Int = Manifest.DefaultLayoutVersion,
    metrics: List[Metric] = Nil,
    cumulativeMetrics: List[CumulativeMetric] = Nil,
    macros: List[Macro] = Nil,
    enums: List[EnumDefinition] = Nil,
    dateSpine: DateSpine = DateSpine()) {
  def model(name: String): Option[Model] =
    models.find(_.name.equalsIgnoreCase(name))
  def relationship(name: String): Option[Relationship] =
    relationships.find(_.name.equalsIgnoreCase(name))
  def enumDef(name: String): Option[EnumDefinition] =
    enums.find(_.name.equalsIgnoreCase(name))

  /** Reject manifests from a newer layout generation (manifest.rs:96-109). */
  def validateLayoutVersion(): Unit =
    require(
      layoutVersion <= Manifest.MaxSupportedLayoutVersion,
      s"This manifest requires layout version $layoutVersion, but this engine only " +
        s"supports up to ${Manifest.MaxSupportedLayoutVersion}")
}

object Manifest {
  val DefaultLayoutVersion = 1 // manifest-macro lib.rs:57-59
  val MaxSupportedLayoutVersion = 2 // manifest.rs:96
}

final case class TableReference(
    catalog: Option[String] = None,
    schema: Option[String] = None,
    table: String = "") {
  def dotted: String = (catalog.toList ++ schema.toList :+ table).mkString(".")
}

final case class Model(
    name: String,
    refSql: Option[String] = None,
    tableReference: Option[TableReference] = None,
    baseObject: Option[String] = None,
    columns: List[Column] = Nil,
    primaryKey: Option[String] = None,
    cached: Boolean = false,
    refreshTime: Option[String] = None,
    rowLevelAccessControls: List[RowLevelAccessControl] = Nil,
    dialect: Option[String] = None,
    properties: Map[String, String] = Map.empty) {
  /** Free-text description from `properties` (manifest.rs properties map —
    * the reference's schema-memory indexer reads `properties.description`,
    * `wren/src/wren/memory/schema_indexer.py:263-268`).
    */
  def description: Option[String] = properties.get("description").filter(_.nonEmpty)
  require(
    refSql.isEmpty || tableReference.isEmpty,
    s"model $name: refSql and tableReference are mutually exclusive")
  def column(name: String): Option[Column] =
    columns.find(_.name.equalsIgnoreCase(name))
  /** Columns that come straight from the source scan (physical or expression-backed). */
  def physicalColumns: List[Column] =
    columns.filter(c => c.relationship.isEmpty && !c.isCalculated)
  def calculatedColumns: List[Column] =
    columns.filter(c => c.isCalculated && c.relationship.isEmpty)
}

final case class Column(
    name: String,
    `type`: String,
    relationship: Option[String] = None,
    isCalculated: Boolean = false,
    notNull: Boolean = false,
    expression: Option[String] = None,
    isHidden: Boolean = false,
    columnLevelAccessControl: Option[ColumnLevelAccessControl] = None,
    properties: Map[String, String] = Map.empty) {
  def description: Option[String] = properties.get("description").filter(_.nonEmpty)
}

object JoinType {
  val OneToOne = "ONE_TO_ONE"
  val OneToMany = "ONE_TO_MANY"
  val ManyToOne = "MANY_TO_ONE"
  val ManyToMany = "MANY_TO_MANY"
}

/** Declared join path between exactly two models; joinType reads first-model →
  * second-model (reference manifest-macro lib.rs:226-262, is_to_one at
  * wren-core-base/src/mdl/manifest.rs:320-324).
  */
final case class Relationship(
    name: String,
    models: List[String],
    joinType: String,
    condition: String) {
  require(models.size == 2, s"relationship $name must reference exactly 2 models")
  /** Is the traversal FROM `host` to the other end a to-one hop? */
  def isToOneFrom(host: String): Boolean = {
    val jt = joinType.toUpperCase.replace(' ', '_')
    if (models.head.equalsIgnoreCase(host))
      jt == JoinType.OneToOne || jt == JoinType.ManyToOne
    else
      jt == JoinType.OneToOne || jt == JoinType.OneToMany
  }
  def other(host: String): String =
    if (models.head.equalsIgnoreCase(host)) models(1) else models.head
  def involves(m: String): Boolean = models.exists(_.equalsIgnoreCase(m))
}

final case class View(name: String, statement: String, dialect: Option[String] = None)

/** `hierarchies` holds ordered drill-down paths (coarsest → finest dimension names),
  * kept sorted by name for deterministic iteration like the reference's BTreeMap
  * (manifest-macro lib.rs:356-369).
  */
final case class Cube(
    name: String,
    baseObject: String,
    measures: List[CubeMeasure] = Nil,
    dimensions: List[String] = Nil,
    timeDimensions: List[String] = Nil,
    hierarchies: List[(String, List[String])] = Nil) {
  def hierarchy(name: String): Option[List[String]] =
    hierarchies.collectFirst { case (n, path) if n.equalsIgnoreCase(name) => path }
}

final case class CubeMeasure(name: String, expression: String)

/** Pre-aggregated rollup over a model or another metric — the reference's v2 MDL
  * concept (`wren-core-legacy/wren-base/.../dto/Metric.java:31-76`): `dimension`
  * columns group, `measure` columns aggregate (each carries its SQL expression),
  * `timeGrain`s additionally expose per-date-part rollup views.
  */
final case class Metric(
    name: String,
    baseObject: String,
    dimension: List[Column] = Nil,
    measure: List[Column] = Nil,
    timeGrain: List[TimeGrain] = Nil,
    cached: Boolean = false) {
  require(measure.nonEmpty, s"metric $name: at least one measure is required") // Metric.java:73
}

/** TimeGrain.java:26-47: named time rollup of `refColumn` at each of `dateParts`. */
final case class TimeGrain(name: String, refColumn: String, dateParts: List[String])

/** Cumulative aggregate over a date spine (CumulativeMetric.java:31-44 +
  * Window.java:29-36): for each `timeUnit` period in [start, end], the measure
  * aggregated over ALL rows up to that period.
  */
final case class CumulativeMetric(
    name: String,
    baseObject: String,
    measure: CumulativeMeasure,
    window: MetricWindow,
    cached: Boolean = false)

/** Measure.java:32-35: `operator` ∈ sum/count/avg/min/max applied to `refColumn`. */
final case class CumulativeMeasure(
    name: String, `type`: String = "double", operator: String, refColumn: String)

final case class MetricWindow(
    name: String, refColumn: String, timeUnit: String, start: String, end: String)

/** v2 SQL macro (`Macro.java:42-56`): `definition` is `(p: type, ...) => body`,
  * deployed as a Spark SQL temp function (Catalyst-inlined — exactly the reference's
  * expand-at-rewrite semantics, MacroSqlRewrite).
  */
final case class Macro(name: String, definition: String) {
  private val split = definition.split("=>", 2)
  require(split.length == 2, s"macro $name: definition must be '(params) => body'")
  /** (paramName, mdlType) pairs — split on TOP-LEVEL commas only, so parameterized
    * types (`decimal(18,2)`, `map<string,int>`, `struct<...>`) survive intact.
    */
  val parameters: List[(String, String)] = {
    val ps = split(0).trim.stripPrefix("(").stripSuffix(")").trim
    if (ps.isEmpty) Nil
    else {
      val parts = scala.collection.mutable.ListBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      ps.foreach {
        case c @ ('(' | '<') => depth += 1; cur += c
        case c @ (')' | '>') => depth -= 1; cur += c
        case ',' if depth == 0 => parts += cur.toString; cur.clear()
        case c => cur += c
      }
      parts += cur.toString
      parts.toList.map { p =>
        p.split(":", 2) match {
          case Array(n, t) => (n.trim, t.trim)
          case Array(n) => (n.trim, "varchar") // untyped params default like loose MDL
        }
      }
    }
  }
  val body: String = split(1).trim
}

/** v2 enum (`EnumDefinition.java:35-36`): `Enum.Value` dereferences in query SQL
  * rewrite to the value's string literal (EnumRewrite.java:73-91).
  */
final case class EnumDefinition(name: String, values: List[EnumValue]) {
  def valueOf(v: String): Option[String] =
    values.collectFirst { case ev if ev.name.equalsIgnoreCase(v) => ev.effective }
}

/** `value` defaults to the name itself when omitted (EnumValue.java:38-39). */
final case class EnumValue(name: String, value: Option[String] = None) {
  def effective: String = value.getOrElse(name)
}

/** v2 date spine bounds (DateSpine.java:28-32). Cumulative metrics here generate
  * their period spine directly (a `sequence()` at the window's grain) instead of
  * joining a materialized spine table — same results, no auxiliary table — so the
  * spine config is carried for manifest fidelity and as clamping bounds.
  */
final case class DateSpine(
    unit: String = "DAY", start: String = "1970-01-01", end: String = "2077-12-31")

final case class SessionProperty(
    name: String,
    required: Boolean = false,
    defaultExpr: Option[String] = None) {
  def normalizedName: String = name.toLowerCase
}

final case class RowLevelAccessControl(
    name: String,
    requiredProperties: List[SessionProperty] = Nil,
    condition: String)

object ClacOperator {
  val Equals = "EQUALS"
  val NotEquals = "NOT_EQUALS"
  val GreaterThan = "GREATER_THAN"
  val LessThan = "LESS_THAN"
  val GreaterThanOrEquals = "GREATER_THAN_OR_EQUALS"
  val LessThanOrEquals = "LESS_THAN_OR_EQUALS"
}

final case class ColumnLevelAccessControl(
    name: String,
    requiredProperties: List[SessionProperty] = Nil,
    operator: String,
    threshold: String)

/** Manual JSON codec over the json4s AST (json4s ships with Spark). Manual rather
  * than reflective so we control int-as-bool tolerance, the tableReference
  * string-or-object duality, and missing-field defaults precisely.
  */
object ManifestJson {

  def parse(json: String): Manifest = fromJValue(JsonMethods.parse(json))

  def parseBase64(b64: String): Manifest =
    parse(new String(java.util.Base64.getDecoder.decode(b64), "UTF-8"))

  private def str(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case JInt(i) => Some(i.toString)
    case JDecimal(d) => Some(d.toString)
    case JDouble(d) => Some(d.toString)
    case JBool(b) => Some(b.toString)
    case _ => None
  }

  private def bool(v: JValue): Boolean = v match {
    case JBool(b) => b
    case JInt(i) => i != 0
    case JLong(i) => i != 0
    case JString(s) => s.equalsIgnoreCase("true") || s == "1"
    case _ => false
  }

  private def arr(v: JValue): List[JValue] = v match {
    case JArray(xs) => xs
    case JNothing | JNull => Nil
    case other => List(other)
  }

  def fromJValue(j: JValue): Manifest = Manifest(
    catalog = str(j \ "catalog").getOrElse("graft"),
    schema = str(j \ "schema").getOrElse("public"),
    models = arr(j \ "models").map(model),
    relationships = arr(j \ "relationships").map(relationship),
    views = arr(j \ "views").map(view),
    cubes = arr(j \ "cubes").map(cube),
    dataSource = str(j \ "dataSource"),
    layoutVersion = (j \ "layoutVersion") match {
      case JInt(i) => i.toInt
      case JLong(i) => i.toInt
      case JString(s) if s.forall(_.isDigit) && s.nonEmpty => s.toInt
      case _ => Manifest.DefaultLayoutVersion
    },
    metrics = arr(j \ "metrics").map(metric),
    cumulativeMetrics = arr(j \ "cumulativeMetrics").map(cumulativeMetric),
    macros = arr(j \ "macros").map(mj => Macro(
      name = str(mj \ "name").getOrElse(sys.error("macro requires a name")),
      definition = str(mj \ "definition").getOrElse(sys.error("macro requires a definition")))),
    enums = arr(j \ "enumDefinitions").map(ej => EnumDefinition(
      name = str(ej \ "name").getOrElse(sys.error("enum requires a name")),
      values = arr(ej \ "values").map(vj => EnumValue(
        name = str(vj \ "name").getOrElse(sys.error("enum value requires a name")),
        value = str(vj \ "value").filter(_.nonEmpty))))),
    dateSpine = (j \ "dateSpine") match {
      case o: JObject => DateSpine(
        unit = str(o \ "unit").getOrElse("DAY").toUpperCase,
        start = str(o \ "start").getOrElse("1970-01-01"),
        end = str(o \ "end").getOrElse("2077-12-31"))
      case _ => DateSpine()
    })

  private def model(j: JValue): Model = Model(
    name = str(j \ "name").getOrElse(sys.error("model requires a name")),
    refSql = str(j \ "refSql").filter(_.nonEmpty),
    tableReference = tableReference(j \ "tableReference"),
    baseObject = str(j \ "baseObject").filter(_.nonEmpty),
    columns = arr(j \ "columns").map(column),
    primaryKey = str(j \ "primaryKey").filter(_.nonEmpty),
    cached = bool(j \ "cached"),
    refreshTime = str(j \ "refreshTime"),
    rowLevelAccessControls =
      arr(j \ "rowLevelAccessControls").map(rlac),
    dialect = str(j \ "dialect").filter(_.nonEmpty),
    properties = props(j \ "properties"))

  /** `properties` is a loose string map in the manifest (descriptions, display
    * names); non-string JSON values stringify like the reference's dict.
    */
  private def props(j: JValue): Map[String, String] = j match {
    case JObject(fields) => fields.flatMap { case JField(k, v) => str(v).map(k -> _) }.toMap
    case _ => Map.empty
  }

  /** Accepts `{catalog, schema, table}` or a dotted string `"cat.sch.tbl"`. */
  private def tableReference(j: JValue): Option[TableReference] = j match {
    case JString(s) if s.nonEmpty =>
      val parts = s.split('.')
      parts.length match {
        case 1 => Some(TableReference(table = parts(0)))
        case 2 => Some(TableReference(schema = Some(parts(0)), table = parts(1)))
        case _ => Some(TableReference(Some(parts(0)), Some(parts(1)), parts.drop(2).mkString(".")))
      }
    case o: JObject =>
      str(o \ "table").filter(_.nonEmpty).map { t =>
        TableReference(str(o \ "catalog").filter(_.nonEmpty), str(o \ "schema").filter(_.nonEmpty), t)
      }
    case _ => None
  }

  private def column(j: JValue): Column = Column(
    name = str(j \ "name").getOrElse(sys.error("column requires a name")),
    `type` = str(j \ "type").getOrElse("varchar"),
    relationship = str(j \ "relationship").filter(_.nonEmpty),
    isCalculated = bool(j \ "isCalculated"),
    notNull = bool(j \ "notNull"),
    expression = str(j \ "expression").filter(_.nonEmpty),
    isHidden = bool(j \ "isHidden"),
    columnLevelAccessControl = (j \ "columnLevelAccessControl") match {
      case o: JObject => Some(clac(o))
      case _ => None
    },
    properties = props(j \ "properties"))

  private def relationship(j: JValue): Relationship = Relationship(
    name = str(j \ "name").getOrElse(sys.error("relationship requires a name")),
    models = arr(j \ "models").flatMap(str),
    joinType = str(j \ "joinType").getOrElse(JoinType.ManyToOne),
    condition = str(j \ "condition").getOrElse(sys.error("relationship requires a condition")))

  private def view(j: JValue): View = View(
    name = str(j \ "name").getOrElse(sys.error("view requires a name")),
    statement = str(j \ "statement").getOrElse(sys.error("view requires a statement")),
    dialect = str(j \ "dialect").filter(_.nonEmpty))

  private def cube(j: JValue): Cube = Cube(
    name = str(j \ "name").getOrElse(sys.error("cube requires a name")),
    baseObject = str(j \ "baseObject").getOrElse(""),
    measures = arr(j \ "measures").map(mj => CubeMeasure(
      str(mj \ "name").getOrElse(""), str(mj \ "expression").getOrElse(""))),
    dimensions = arr(j \ "dimensions").flatMap(str),
    timeDimensions = arr(j \ "timeDimensions").flatMap(str),
    hierarchies = (j \ "hierarchies") match {
      case JObject(fields) =>
        fields.map { case JField(n, path) => n -> arr(path).flatMap(str) }.sortBy(_._1)
      case _ => Nil
    })

  private def metric(j: JValue): Metric = Metric(
    name = str(j \ "name").getOrElse(sys.error("metric requires a name")),
    baseObject = str(j \ "baseObject").getOrElse(sys.error("metric requires a baseObject")),
    dimension = arr(j \ "dimension").map(column),
    measure = arr(j \ "measure").map(column),
    timeGrain = arr(j \ "timeGrain").map(tg => TimeGrain(
      name = str(tg \ "name").getOrElse(""),
      refColumn = str(tg \ "refColumn").getOrElse(sys.error("timeGrain requires refColumn")),
      dateParts = arr(tg \ "dateParts").flatMap(str))),
    cached = bool(j \ "cached"))

  private def cumulativeMetric(j: JValue): CumulativeMetric = CumulativeMetric(
    name = str(j \ "name").getOrElse(sys.error("cumulativeMetric requires a name")),
    baseObject = str(j \ "baseObject").getOrElse(sys.error("cumulativeMetric requires a baseObject")),
    measure = {
      val m = j \ "measure"
      CumulativeMeasure(
        name = str(m \ "name").getOrElse("measure"),
        `type` = str(m \ "type").getOrElse("double"),
        operator = str(m \ "operator").getOrElse(sys.error("measure requires an operator")).toLowerCase,
        refColumn = str(m \ "refColumn").getOrElse(sys.error("measure requires refColumn")))
    },
    window = {
      val w = j \ "window"
      MetricWindow(
        name = str(w \ "name").getOrElse("period"),
        refColumn = str(w \ "refColumn").getOrElse(sys.error("window requires refColumn")),
        timeUnit = str(w \ "timeUnit").getOrElse("MONTH"),
        start = str(w \ "start").getOrElse(sys.error("window requires start")),
        end = str(w \ "end").getOrElse(sys.error("window requires end")))
    },
    cached = bool(j \ "cached"))

  // ---------------------------------------------------------- serialization

  /** Canonical JValue rendering of a Manifest — key-sorted by construction
    * (every JObject below lists fields alphabetically), defaults omitted, so
    * `compact(toJValue(parse(json)))` is a stable fingerprint input however
    * the source JSON was ordered or padded. Used by the schema-memory's
    * manifest hash (the reference hashes the sorted-keys dict the same way,
    * `wren/src/wren/memory/schema_indexer.py:13-22`).
    */
  def toJValue(m: Manifest): JValue = {
    def s(v: String): JValue = JString(v)
    def opt(name: String, v: Option[String]): List[JField] =
      v.map(x => JField(name, JString(x))).toList
    def flag(name: String, v: Boolean): List[JField] =
      if (v) List(JField(name, JBool(true))) else Nil
    def propsOf(p: Map[String, String]): List[JField] =
      if (p.isEmpty) Nil
      else List(JField("properties", JObject(p.toList.sortBy(_._1).map {
        case (k, v) => JField(k, JString(v))
      })))
    def sessProps(ps: List[SessionProperty]): JValue = JArray(ps.map(p => JObject(
      opt("defaultExpr", p.defaultExpr) ++
        List(JField("name", s(p.name))) ++ flag("required", p.required))))
    def col(c: Column): JValue = JObject(
      (c.columnLevelAccessControl.map(cl => JField("columnLevelAccessControl", JObject(
        List(JField("name", s(cl.name)), JField("operator", s(cl.operator))) ++
          (if (cl.requiredProperties.isEmpty) Nil
           else List(JField("requiredProperties", sessProps(cl.requiredProperties)))) ++
          List(JField("threshold", s(cl.threshold)))))).toList ++
        opt("expression", c.expression) ++
        flag("isCalculated", c.isCalculated) ++ flag("isHidden", c.isHidden) ++
        List(JField("name", s(c.name))) ++ flag("notNull", c.notNull) ++
        propsOf(c.properties) ++ opt("relationship", c.relationship) :+
        JField("type", s(c.`type`))))
    def model(md: Model): JValue = JObject(
      opt("baseObject", md.baseObject) ++ flag("cached", md.cached) ++
        List(JField("columns", JArray(md.columns.map(col)))) ++
        opt("dialect", md.dialect) ++
        List(JField("name", s(md.name))) ++
        opt("primaryKey", md.primaryKey) ++ propsOf(md.properties) ++
        opt("refSql", md.refSql) ++ opt("refreshTime", md.refreshTime) ++
        (if (md.rowLevelAccessControls.isEmpty) Nil
         else List(JField("rowLevelAccessControls", JArray(md.rowLevelAccessControls.map(r =>
           JObject(List(JField("condition", s(r.condition)), JField("name", s(r.name))) ++
             (if (r.requiredProperties.isEmpty) Nil
              else List(JField("requiredProperties", sessProps(r.requiredProperties)))))))))) ++
        md.tableReference.map(tr => JField("tableReference", JObject(
          tr.catalog.map(c => JField("catalog", s(c))).toList ++
            tr.schema.map(sc => JField("schema", s(sc))).toList :+
            JField("table", s(tr.table))))).toList)
    def cube(cb: Cube): JValue = {
      val dims =
        if (cb.dimensions.isEmpty) Nil
        else List(JField("dimensions", JArray(cb.dimensions.map(s))))
      val hiers =
        if (cb.hierarchies.isEmpty) Nil
        else List(JField("hierarchies", JObject(cb.hierarchies.map {
          case (n, path) => JField(n, JArray(path.map(s)))
        })))
      val measures =
        if (cb.measures.isEmpty) Nil
        else List(JField("measures", JArray(cb.measures.map(ms => JObject(
          JField("expression", s(ms.expression)), JField("name", s(ms.name)))))))
      val timeDims =
        if (cb.timeDimensions.isEmpty) Nil
        else List(JField("timeDimensions", JArray(cb.timeDimensions.map(s))))
      JObject(JField("baseObject", s(cb.baseObject)) ::
        (dims ++ hiers ++ measures ++ List(JField("name", s(cb.name))) ++ timeDims))
    }
    def metric(mt: Metric): JValue = {
      val dim =
        if (mt.dimension.isEmpty) Nil
        else List(JField("dimension", JArray(mt.dimension.map(col))))
      val grains =
        if (mt.timeGrain.isEmpty) Nil
        else List(JField("timeGrain", JArray(mt.timeGrain.map(tg => JObject(
          JField("dateParts", JArray(tg.dateParts.map(s))),
          JField("name", s(tg.name)),
          JField("refColumn", s(tg.refColumn)))))))
      JObject(JField("baseObject", s(mt.baseObject)) ::
        (flag("cached", mt.cached) ++ dim ++ List(
          JField("measure", JArray(mt.measure.map(col))),
          JField("name", s(mt.name))) ++ grains))
    }
    def cumulative(cm: CumulativeMetric): JValue = JObject(
      JField("baseObject", s(cm.baseObject)) ::
      flag("cached", cm.cached) ++ List(
      JField("measure", JObject(
        JField("name", s(cm.measure.name)), JField("operator", s(cm.measure.operator)),
        JField("refColumn", s(cm.measure.refColumn)), JField("type", s(cm.measure.`type`)))),
      JField("name", s(cm.name)),
      JField("window", JObject(
        JField("end", s(cm.window.end)), JField("name", s(cm.window.name)),
        JField("refColumn", s(cm.window.refColumn)), JField("start", s(cm.window.start)),
        JField("timeUnit", s(cm.window.timeUnit))))))
    def enumDef(e: EnumDefinition): JValue = JObject(
      JField("name", s(e.name)),
      JField("values", JArray(e.values.map(v => JObject(
        JField("name", s(v.name)) :: v.value.map(x => JField("value", s(x))).toList)))))
    def view(v: View): JValue = JObject(
      v.dialect.map(d => JField("dialect", s(d))).toList ++
        List(JField("name", s(v.name)), JField("statement", s(v.statement))))

    def section[A](name: String, xs: List[A], f: A => JValue): List[JField] =
      if (xs.isEmpty) Nil else List(JField(name, JArray(xs.map(f))))

    JObject(
      List(JField("catalog", s(m.catalog))) ++
        section("cubes", m.cubes, cube) ++
        section("cumulativeMetrics", m.cumulativeMetrics, cumulative) ++
        m.dataSource.map(ds => JField("dataSource", s(ds))).toList ++
        (if (m.dateSpine == DateSpine()) Nil
         else List(JField("dateSpine", JObject(
           JField("end", s(m.dateSpine.end)), JField("start", s(m.dateSpine.start)),
           JField("unit", s(m.dateSpine.unit)))))) ++
        section("enumDefinitions", m.enums, enumDef) ++
        (if (m.layoutVersion == Manifest.DefaultLayoutVersion) Nil
         else List(JField("layoutVersion", JInt(m.layoutVersion)))) ++
        section("macros", m.macros, (mc: Macro) =>
          JObject(JField("definition", s(mc.definition)), JField("name", s(mc.name)))) ++
        section("metrics", m.metrics, metric) ++
        List(
          JField("models", JArray(m.models.map(model))),
          JField("relationships", JArray(m.relationships.map(r => JObject(
            JField("condition", s(r.condition)),
            JField("joinType", s(r.joinType)),
            JField("models", JArray(r.models.map(s))),
            JField("name", s(r.name)))))),
          JField("schema", s(m.schema))) ++
        section("views", m.views, view))
  }

  /** Compact canonical JSON text of a manifest (see [[toJValue]]). */
  def canonical(m: Manifest): String = JsonMethods.compact(JsonMethods.render(toJValue(m)))

  private def sessionProperty(j: JValue): SessionProperty = SessionProperty(
    name = str(j \ "name").getOrElse(""),
    required = bool(j \ "required"),
    defaultExpr = str(j \ "defaultExpr").filter(_.nonEmpty))

  private def rlac(j: JValue): RowLevelAccessControl = RowLevelAccessControl(
    name = str(j \ "name").getOrElse(""),
    requiredProperties = arr(j \ "requiredProperties").map(sessionProperty),
    condition = str(j \ "condition").getOrElse("true"))

  private def clac(j: JValue): ColumnLevelAccessControl = ColumnLevelAccessControl(
    name = str(j \ "name").getOrElse(""),
    requiredProperties = arr(j \ "requiredProperties").map(sessionProperty),
    operator = str(j \ "operator").getOrElse(ClacOperator.Equals).toUpperCase,
    threshold = str(j \ "threshold").getOrElse(""))
}
