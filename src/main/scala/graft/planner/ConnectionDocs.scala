package graft.planner

/** Connection-info documentation generator — the reference's `wren docs
  * connection-info` surface (`wren/src/wren/docs.py:1-256` over the field
  * registry `wren/src/wren/model/field_registry.py:45-75`) for THIS engine's
  * typed connection shapes ([[ConnectionInfo]] in Connections.scala, plus the
  * file-path resolver every deployment can use). The reference derives field
  * metadata from pydantic models; Scala case classes carry no runtime field
  * metadata, so the registry is explicit — and ConnectionDocsSpec asserts it
  * stays truthful by reflecting each case class's declared fields.
  *
  * Output parity: the Markdown table (Field/Type/Required/Default/Sensitive/
  * Example columns, fenced JSON example built from examples-or-defaults) and
  * the `--json-schema --envelope` form (`{"datasource":…, "properties":…}`),
  * plus the reference's exact unknown-source error shape
  * (`docs.py:24-27`: "Unknown data source: X\nAvailable: …").
  */
object ConnectionDocs {

  /** One documented field: name, display type, requiredness, display default
    * (None = required, no default), secret-ness, and an example value.
    */
  final case class FieldDoc(
      name: String, tpe: String, required: Boolean,
      default: Option[String] = None, sensitive: Boolean = false,
      example: Option[String] = None)

  final case class ModelDoc(name: String, clazz: Class[_], fields: Seq[FieldDoc])

  private def f(name: String, tpe: String, example: String): FieldDoc =
    FieldDoc(name, tpe, required = true, example = Some(example))
  private def opt(name: String, tpe: String, default: String = "null"): FieldDoc =
    FieldDoc(name, tpe, required = false, default = Some(default))
  private def secret(name: String, example: String): FieldDoc =
    FieldDoc(name, "string", required = true, sensitive = true, example = Some(example))

  /** datasource → model variants, display order like the reference's
    * DATASOURCE_MODELS (discriminated unions list every variant).
    */
  val registry: Seq[(String, Seq[ModelDoc])] = Seq(
    "athena" -> Seq(ModelDoc("AthenaConnection", classOf[AthenaConnection], Seq(
      f("s3StagingDir", "string", "s3://bucket/athena-results/"),
      f("regionName", "string", "us-east-1"),
      FieldDoc("schemaName", "string", required = false, default = Some("\"default\"")),
      opt("awsAccessKeyId", "string"),
      FieldDoc("awsSecretAccessKey", "string", required = false,
        default = Some("null"), sensitive = true),
      FieldDoc("awsSessionToken", "string", required = false,
        default = Some("null"), sensitive = true),
      FieldDoc("webIdentityToken", "string", required = false,
        default = Some("null"), sensitive = true),
      opt("roleArn", "string")))),
    "bigquery" -> Seq(
      ModelDoc("BigQueryDatasetConnection", classOf[BigQueryDatasetConnection], Seq(
        f("projectId", "string", "my-project"),
        f("datasetId", "string", "analytics"),
        secret("credentialsBase64", "<base64 credentials.json>"),
        opt("jobTimeoutMs", "integer"))),
      ModelDoc("BigQueryProjectConnection", classOf[BigQueryProjectConnection], Seq(
        f("region", "string", "us"),
        f("billingProjectId", "string", "my-billing-project"),
        secret("credentialsBase64", "<base64 credentials.json>")))),
    "databricks" -> Seq(
      ModelDoc("DatabricksTokenConnection", classOf[DatabricksTokenConnection], Seq(
        f("serverHostname", "string", "dbc-1234.cloud.databricks.com"),
        f("httpPath", "string", "/sql/1.0/warehouses/abc123"),
        secret("accessToken", "<dapi… personal access token>"))),
      ModelDoc("DatabricksServicePrincipalConnection",
        classOf[DatabricksServicePrincipalConnection], Seq(
          f("serverHostname", "string", "dbc-1234.cloud.databricks.com"),
          f("httpPath", "string", "/sql/1.0/warehouses/abc123"),
          f("clientId", "string", "svc-principal-app-id"),
          secret("clientSecret", "<oauth client secret>"),
          opt("azureTenantId", "string")))),
    "local_file" -> Seq(ModelDoc("PathResolver", classOf[PathResolver], Seq(
      f("url", "string", "/data/warehouse"),
      FieldDoc("format", "string", required = false, default = Some("\"parquet\"")),
      opt("cloud", "CloudConnection")))),
    "redshift" -> Seq(ModelDoc("RedshiftIamConnection", classOf[RedshiftIamConnection], Seq(
      f("clusterIdentifier", "string", "analytics-cluster"),
      f("region", "string", "us-east-1"),
      f("database", "string", "dev"),
      f("dbUser", "string", "analyst"),
      opt("awsAccessKeyId", "string"),
      FieldDoc("awsSecretAccessKey", "string", required = false,
        default = Some("null"), sensitive = true)))),
    "snowflake" -> Seq(ModelDoc("SnowflakeConnection", classOf[SnowflakeConnection], Seq(
      f("account", "string", "xy12345.us-east-1"),
      f("user", "string", "ANALYST"),
      f("database", "string", "ANALYTICS"),
      f("schema", "string", "PUBLIC"),
      opt("warehouse", "string"),
      FieldDoc("password", "string", required = false,
        default = Some("null"), sensitive = true),
      FieldDoc("privateKeyPem", "string", required = false,
        default = Some("null"), sensitive = true),
      FieldDoc("kwargs", "object", required = false, default = Some("{}"))))),
    "trino" -> Seq(ModelDoc("TrinoConnection", classOf[TrinoConnection], Seq(
      f("host", "string", "trino.internal"),
      FieldDoc("port", "integer", required = false, default = Some("8080")),
      f("catalog", "string", "hive"),
      f("schema", "string", "default"),
      opt("user", "string"),
      FieldDoc("password", "string", required = false,
        default = Some("null"), sensitive = true)))),
    "url" -> Seq(ModelDoc("UrlConnection", classOf[UrlConnection], Seq(
      f("connectionUrl", "string", "jdbc:postgresql://host:5432/db"),
      FieldDoc("kwargs", "object", required = false, default = Some("{}"))))))

  /** Unknown-source resolution with the reference's exact message shape. */
  def resolveSources(datasource: Option[String]): Seq[(String, Seq[ModelDoc])] =
    datasource match {
      case None => registry
      case Some(ds) =>
        val key = ds.toLowerCase
        registry.filter(_._1 == key) match {
          case Seq() =>
            val available = registry.map(_._1).sorted.mkString(", ")
            throw new IllegalArgumentException(
              s"Unknown data source: $ds\nAvailable: $available")
          case hit => hit
        }
    }

  private def escapeCell(v: String): String =
    v.replace("\\", "\\\\").replace("|", "\\|").replace("\n", "<br>")

  private def exampleValue(fd: FieldDoc): Option[String] =
    fd.example.map(e => "\"" + e + "\"").orElse(fd.default.filter(_ != "null"))

  private def modelMarkdown(m: ModelDoc): String = {
    val rows = m.fields.map { fd =>
      val ex = fd.example.map(e => s"`$e`").getOrElse("")
      s"| `${escapeCell(fd.name)}` | ${escapeCell(fd.tpe)} " +
        s"| ${if (fd.required) "yes" else "no"} " +
        s"| ${escapeCell(fd.default.getOrElse(""))} " +
        s"| ${if (fd.sensitive) "yes" else "no"} | ${escapeCell(ex)} |"
    }
    val example = m.fields.flatMap(fd => exampleValue(fd).map(v =>
      s"""  "${fd.name}": $v""")).mkString(",\n")
    (Seq(s"### ${m.name}", "",
      "| Field | Type | Required | Default | Sensitive | Example |",
      "|-------|------|----------|---------|-----------|---------|") ++
      rows ++ Seq("", "**Example:**", "```json", "{", example, "}", "```", ""))
      .mkString("\n")
  }

  def markdown(datasource: Option[String] = None): String = {
    val sources = resolveSources(datasource)
    (Seq("# Graft Engine Connection Info Reference", "") ++
      sources.flatMap { case (ds, models) =>
        Seq(s"## $ds", "") ++ models.map(modelMarkdown)
      }).mkString("\n")
  }

  /** The `--json-schema --envelope` form: one
    * `{"datasource": …, "properties": {…}}` object per model variant
    * (docs.py:207-224); properties carry examples-or-defaults like the
    * reference's `_build_full_properties`.
    */
  def jsonSchemaEnvelope(datasource: Option[String] = None): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val objs = resolveSources(datasource).flatMap { case (ds, models) =>
      models.map { m =>
        JObject(
          "datasource" -> JString(ds),
          "properties" -> JObject(m.fields.map(fd => fd.name -> (fd.example match {
            case Some(e) => JString(e): JValue
            case None if !fd.required => fd.default match {
              case Some("null") | None => JNull: JValue
              case Some("{}") => JObject(): JValue
              case Some(d) if d.forall(_.isDigit) => JInt(BigInt(d)): JValue
              case Some(d) => JString(d.stripPrefix("\"").stripSuffix("\"")): JValue
            }
            case None => JString(s"<${fd.name}>"): JValue
          })).toList))
      }
    }
    val out: JValue = if (objs.size == 1) objs.head else JArray(objs.toList)
    JsonMethods.pretty(JsonMethods.render(out))
  }

  /** `runMain graft.planner.ConnectionDocs [--datasource ds] [--json-schema]`
    * — the reference's `wren docs connection-info` CLI (cli.py:542-582).
    */
  def main(args: Array[String]): Unit = {
    val ds = args.sliding(2).collectFirst {
      case Array("--datasource", v) => v }
    println(
      if (args.contains("--json-schema")) jsonSchemaEnvelope(ds)
      else markdown(ds))
  }
}
