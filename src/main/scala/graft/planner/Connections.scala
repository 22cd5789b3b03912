package graft.planner

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.mdl.TableReference

/** Typed connection info for the reference's OAuth/service-account warehouse
  * backends (`ibis-server/app/model/__init__.py:122-650` — BigQuery dataset/project
  * service accounts, Snowflake key-pairs, Databricks tokens and service principals,
  * Athena credential chains, Redshift IAM, Trino). The reference resolves each shape
  * to an ibis backend client; on Spark every one of them resolves to either a JDBC
  * scan (the warehouse's public JDBC driver URL + properties) or a DataSource V2
  * read (the warehouse's public Spark connector options), so the mapping below IS
  * the connector — `resolver` plugs straight into `GraftEngine.deploy`.
  *
  * The drivers themselves are deploy-time jars (none ship in this repo); what is
  * engine-owned — and unit-tested — is the shape: which fields exist, which are
  * secrets, and exactly what URL/option map each shape compiles to.
  */
sealed trait ConnectionInfo {
  /** The Spark read shape this connection compiles to. */
  def shape: ReadShape

  /** A resolver for `GraftEngine.deploy`, with optional per-table parallel-scan
    * layout for the JDBC-shaped backends (same knobs as [[JdbcResolver]]).
    */
  def resolver(
      partitioning: Map[String, JdbcPartitioning] = Map.empty,
      predicates: Map[String, Seq[String]] = Map.empty): TableResolver = shape match {
    case JdbcShape(url, props) =>
      val p = new java.util.Properties
      props.foreach { case (k, v) => p.setProperty(k, v) }
      new JdbcResolver(url, p, partitioning, predicates)
    case d: Dsv2Shape => new Dsv2Resolver(d)
  }
}

sealed trait ReadShape

/** A JDBC scan: driver URL + connection properties. */
final case class JdbcShape(url: String, properties: Map[String, String]) extends ReadShape

/** A DataSource V2 read: `spark.read.format(format).options(options)`, the table
  * reference supplied under `tableOptionKey` (connectors disagree on its name).
  */
final case class Dsv2Shape(
    format: String, options: Map[String, String], tableOptionKey: String) extends ReadShape

/** Resolver over a DSv2 connector shape. */
final class Dsv2Resolver(shape: Dsv2Shape) extends TableResolver {
  override def resolve(spark: SparkSession, ref: TableReference): DataFrame =
    spark.read.format(shape.format)
      .options(shape.options + (shape.tableOptionKey -> ref.dotted))
      .load()
}

/** BigQuery with a service account scoped to one dataset
  * (`BigQueryDatasetConnectionInfo`, data_source.py model `__init__.py:146-158`):
  * base64 `credentials.json` + project/dataset ids → the public Spark BigQuery
  * connector's `credentials`/`parentProject`/`dataset` options.
  */
final case class BigQueryDatasetConnection(
    projectId: String, datasetId: String, credentialsBase64: String,
    jobTimeoutMs: Option[Long] = None) extends ConnectionInfo {
  override def shape: ReadShape = Dsv2Shape(
    format = "bigquery",
    options = Map(
      "parentProject" -> projectId,
      "dataset" -> datasetId,
      "credentials" -> credentialsBase64,
      "viewsEnabled" -> "true") ++
      jobTimeoutMs.map(ms => "httpReadTimeout" -> ms.toString),
    tableOptionKey = "table")
}

/** BigQuery project-level access with a separate billing project
  * (`BigQueryProjectConnectionInfo`, `__init__.py:160-181`).
  */
final case class BigQueryProjectConnection(
    region: String, billingProjectId: String, credentialsBase64: String)
    extends ConnectionInfo {
  override def shape: ReadShape = Dsv2Shape(
    format = "bigquery",
    options = Map(
      "parentProject" -> billingProjectId,
      "credentials" -> credentialsBase64,
      "viewsEnabled" -> "true"),
    tableOptionKey = "table")
}

/** Snowflake with password or key-pair auth (`SnowflakeConnectionInfo`,
  * `__init__.py:465-496`): account/user/database/schema/warehouse → the public
  * Spark Snowflake connector's `sfURL`/`sfUser`/... options; `privateKeyPem` maps
  * to `pem_private_key` (key-pair auth), otherwise `sfPassword`.
  */
final case class SnowflakeConnection(
    account: String, user: String, database: String, schema: String,
    warehouse: Option[String] = None, password: Option[String] = None,
    privateKeyPem: Option[String] = None,
    kwargs: Map[String, String] = Map.empty) extends ConnectionInfo {
  require(password.isDefined || privateKeyPem.isDefined,
    "snowflake needs password or privateKeyPem")
  override def shape: ReadShape = Dsv2Shape(
    format = "snowflake",
    options = Map(
      "sfURL" -> s"$account.snowflakecomputing.com",
      "sfUser" -> user,
      "sfDatabase" -> database,
      "sfSchema" -> schema) ++
      warehouse.map("sfWarehouse" -> _) ++
      privateKeyPem.map("pem_private_key" -> _) ++
      password.filter(_ => privateKeyPem.isEmpty).map("sfPassword" -> _) ++
      kwargs,
    tableOptionKey = "dbtable")
}

/** Databricks SQL warehouse with a personal access token
  * (`DatabricksTokenConnectionInfo`, `__init__.py:507-524`): the public Databricks
  * JDBC URL shape — `AuthMech=3`, token as the password.
  */
final case class DatabricksTokenConnection(
    serverHostname: String, httpPath: String, accessToken: String)
    extends ConnectionInfo {
  override def shape: ReadShape = JdbcShape(
    url = s"jdbc:databricks://$serverHostname:443;transportMode=http;ssl=1" +
      s";httpPath=$httpPath;AuthMech=3",
    properties = Map("UID" -> "token", "PWD" -> accessToken))
}

/** Databricks OAuth machine-to-machine service principal
  * (`DatabricksServicePrincipalConnectionInfo`, `__init__.py:527-556`):
  * `AuthMech=11` + client-credentials flow in the public JDBC URL shape.
  */
final case class DatabricksServicePrincipalConnection(
    serverHostname: String, httpPath: String,
    clientId: String, clientSecret: String,
    azureTenantId: Option[String] = None) extends ConnectionInfo {
  override def shape: ReadShape = JdbcShape(
    url = s"jdbc:databricks://$serverHostname:443;transportMode=http;ssl=1" +
      s";httpPath=$httpPath;AuthMech=11;Auth_Flow=1",
    properties = Map(
      "OAuth2ClientId" -> clientId,
      "OAuth2Secret" -> clientSecret) ++
      azureTenantId.map("AzureTenantId" -> _))
}

/** Athena over the standard AWS credential chain or web-identity federation
  * (`AthenaConnectionInfo`, `__init__.py:189-243`): the public Athena JDBC driver's
  * property names; leaving the static keys unset falls through to the default
  * provider chain exactly like the reference.
  */
final case class AthenaConnection(
    s3StagingDir: String, regionName: String, schemaName: String = "default",
    awsAccessKeyId: Option[String] = None, awsSecretAccessKey: Option[String] = None,
    awsSessionToken: Option[String] = None,
    webIdentityToken: Option[String] = None, roleArn: Option[String] = None)
    extends ConnectionInfo {
  override def shape: ReadShape = JdbcShape(
    url = s"jdbc:awsathena://AwsRegion=$regionName;S3OutputLocation=$s3StagingDir" +
      s";Schema=$schemaName",
    properties =
      awsAccessKeyId.map("User" -> _).toMap ++
      awsSecretAccessKey.map("Password" -> _) ++
      awsSessionToken.map("SessionToken" -> _) ++
      webIdentityToken.map("webIdentityToken" -> _) ++
      roleArn.map("preferredRole" -> _) ++
      (if (webIdentityToken.isDefined)
        Map("AwsCredentialsProviderClass" ->
          "com.simba.athena.amazonaws.auth.WebIdentityTokenCredentialsProvider")
      else Map.empty))
}

/** Redshift through IAM temporary credentials (`RedshiftIAMConnectionInfo`,
  * `__init__.py:436-462`): the `jdbc:redshift:iam://` URL form — the driver calls
  * GetClusterCredentials itself, no static password in the shape.
  */
final case class RedshiftIamConnection(
    clusterIdentifier: String, region: String, database: String, dbUser: String,
    awsAccessKeyId: Option[String] = None, awsSecretAccessKey: Option[String] = None)
    extends ConnectionInfo {
  override def shape: ReadShape = JdbcShape(
    url = s"jdbc:redshift:iam://$clusterIdentifier:$region/$database",
    properties = Map("DbUser" -> dbUser) ++
      awsAccessKeyId.map("AccessKeyID" -> _) ++
      awsSecretAccessKey.map("SecretAccessKey" -> _))
}

/** Trino (`TrinoConnectionInfo`, `__init__.py:563-585`): catalog/schema in the JDBC
  * path, basic auth in properties.
  */
final case class TrinoConnection(
    host: String, port: Int = 8080, catalog: String, schema: String,
    user: Option[String] = None, password: Option[String] = None)
    extends ConnectionInfo {
  override def shape: ReadShape = JdbcShape(
    url = s"jdbc:trino://$host:$port/$catalog/$schema",
    properties = user.map("user" -> _).toMap ++ password.map("password" -> _))
}

/** A raw connection URL with extra driver kwargs (`ConnectionUrl`,
  * `__init__.py:122-127`) — the reference's catch-all shape, passed through as-is.
  */
final case class UrlConnection(
    connectionUrl: String, kwargs: Map[String, String] = Map.empty)
    extends ConnectionInfo {
  override def shape: ReadShape = JdbcShape(connectionUrl, kwargs)
}

/** Profile dict → engine connection — the reference's
  * `get_connection(connection_info)` dispatch (`wren/src/wren/connector/
  * factory.py` over the pydantic models): the flat `{datasource, field…}`
  * map a [[graft.api.Profiles]] store holds (secrets already expanded)
  * resolves to either a [[TableResolver]] directly (`local_file`) or a typed
  * [[ConnectionInfo]] whose [[ConnectionInfo.resolver]] plugs into
  * `GraftEngine.deploy`. Unknown datasources and missing required fields
  * answer the reference's message shapes.
  */
object Connections {

  private def str(p: Map[String, Any], k: String): Option[String] =
    p.get(k).filter(_ != null).map(_.toString).filter(_.nonEmpty)

  private def need(p: Map[String, Any], ds: String, k: String): String =
    str(p, k).getOrElse(throw new IllegalArgumentException(
      s"$ds connection requires '$k'"))

  private def kwargs(p: Map[String, Any]): Map[String, String] =
    p.get("kwargs") match {
      case Some(m: Map[_, _]) =>
        m.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
      case _ => Map.empty
    }

  /** The typed shape for a non-file profile; `bigquery_type`/`databricks_type`
    * pick the union variant (the web form's `<ds>_type` key; defaulting to
    * the first variant like the reference's discriminated unions).
    */
  def connectionInfo(profile: Map[String, Any]): ConnectionInfo = {
    val ds = str(profile, "datasource").getOrElse(
      throw new IllegalArgumentException("profile has no 'datasource'")).toLowerCase
    ds match {
      case "bigquery" =>
        if (str(profile, "bigquery_type").contains("BigQueryProjectConnection") ||
          (str(profile, "region").isDefined && str(profile, "datasetId").isEmpty))
          BigQueryProjectConnection(
            region = need(profile, ds, "region"),
            billingProjectId = need(profile, ds, "billingProjectId"),
            credentialsBase64 = need(profile, ds, "credentialsBase64"))
        else BigQueryDatasetConnection(
          projectId = need(profile, ds, "projectId"),
          datasetId = need(profile, ds, "datasetId"),
          credentialsBase64 = need(profile, ds, "credentialsBase64"),
          jobTimeoutMs = str(profile, "jobTimeoutMs").map(_.toLong))
      case "snowflake" => SnowflakeConnection(
        account = need(profile, ds, "account"),
        user = need(profile, ds, "user"),
        database = need(profile, ds, "database"),
        schema = need(profile, ds, "schema"),
        warehouse = str(profile, "warehouse"),
        password = str(profile, "password"),
        privateKeyPem = str(profile, "privateKeyPem"),
        kwargs = kwargs(profile))
      case "databricks" =>
        if (str(profile, "databricks_type").contains("DatabricksServicePrincipalConnection") ||
          str(profile, "clientId").isDefined)
          DatabricksServicePrincipalConnection(
            serverHostname = need(profile, ds, "serverHostname"),
            httpPath = need(profile, ds, "httpPath"),
            clientId = need(profile, ds, "clientId"),
            clientSecret = need(profile, ds, "clientSecret"),
            azureTenantId = str(profile, "azureTenantId"))
        else DatabricksTokenConnection(
          serverHostname = need(profile, ds, "serverHostname"),
          httpPath = need(profile, ds, "httpPath"),
          accessToken = need(profile, ds, "accessToken"))
      case "athena" => AthenaConnection(
        s3StagingDir = need(profile, ds, "s3StagingDir"),
        regionName = need(profile, ds, "regionName"),
        schemaName = str(profile, "schemaName").getOrElse("default"),
        awsAccessKeyId = str(profile, "awsAccessKeyId"),
        awsSecretAccessKey = str(profile, "awsSecretAccessKey"),
        awsSessionToken = str(profile, "awsSessionToken"),
        webIdentityToken = str(profile, "webIdentityToken"),
        roleArn = str(profile, "roleArn"))
      case "redshift" => RedshiftIamConnection(
        clusterIdentifier = need(profile, ds, "clusterIdentifier"),
        region = need(profile, ds, "region"),
        database = need(profile, ds, "database"),
        dbUser = need(profile, ds, "dbUser"),
        awsAccessKeyId = str(profile, "awsAccessKeyId"),
        awsSecretAccessKey = str(profile, "awsSecretAccessKey"))
      case "trino" => TrinoConnection(
        host = need(profile, ds, "host"),
        port = str(profile, "port").map(_.toInt).getOrElse(8080),
        catalog = need(profile, ds, "catalog"),
        schema = need(profile, ds, "schema"),
        user = str(profile, "user"),
        password = str(profile, "password"))
      case "url" => UrlConnection(
        connectionUrl = need(profile, ds, "connectionUrl"),
        kwargs = kwargs(profile))
      case other =>
        val available = graft.planner.ConnectionDocs.registry.map(_._1)
          .sorted.mkString(", ")
        throw new IllegalArgumentException(
          s"Unknown data source: $other\nAvailable: $available")
    }
  }

  /** Profile → resolver: `local_file` short-circuits to the path resolver
    * (the shape every test deployment uses), its optional nested `cloud`
    * map carrying the documented object-store credentials; everything else
    * goes through the typed shape's JDBC/DSv2 compilation.
    */
  def fromProfile(profile: Map[String, Any]): TableResolver =
    str(profile, "datasource").map(_.toLowerCase) match {
      case Some("local_file") =>
        val cloud = profile.get("cloud").collect { case m: Map[_, _] =>
          val c = m.asInstanceOf[Map[String, Any]]
          CloudConnection(
            accessKey = str(c, "accessKey"),
            secretKey = str(c, "secretKey"),
            endpoint = str(c, "endpoint"),
            region = str(c, "region"),
            pathStyleAccess = c.get("pathStyleAccess").exists(v =>
              v == true || v.toString.equalsIgnoreCase("true")))
        }
        new PathResolver(
          need(profile, "local_file", "url"),
          format = str(profile, "format").getOrElse("parquet"),
          cloud = cloud)
      case _ => connectionInfo(profile).resolver()
    }
}
