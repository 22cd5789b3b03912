package graft.planner

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.api.{Cli, Profiles}

/** Profile dict → engine connection (the reference's connector factory
  * dispatch over its pydantic models): every datasource in the docs registry
  * resolves to its typed shape with the documented field names, union
  * variants pick by `<ds>_type` or field shape, `local_file` short-circuits
  * to the path resolver — and the CLI's `@profile` data-dir runs a real
  * query end-to-end through a stored profile with a `${VAR}` secret.
  */
class ConnectionsFromProfileSpec extends AnyFunSuite {

  test("typed shapes resolve with the documented field names") {
    val sf = Connections.connectionInfo(Map(
      "datasource" -> "snowflake", "account" -> "xy1", "user" -> "U",
      "database" -> "D", "schema" -> "S", "password" -> "pw"))
    assert(sf.isInstanceOf[SnowflakeConnection])
    val Dsv2Shape(fmt, opts, key) = sf.shape: @unchecked
    assert(fmt == "snowflake" && key == "dbtable" && opts("sfPassword") == "pw")

    val tr = Connections.connectionInfo(Map(
      "datasource" -> "trino", "host" -> "h", "catalog" -> "c", "schema" -> "s"))
    val JdbcShape(url, _) = tr.shape: @unchecked
    assert(url == "jdbc:trino://h:8080/c/s")

    // union dispatch: explicit <ds>_type, or field-shape inference
    assert(Connections.connectionInfo(Map(
      "datasource" -> "bigquery", "bigquery_type" -> "BigQueryProjectConnection",
      "region" -> "us", "billingProjectId" -> "bp", "credentialsBase64" -> "x"))
      .isInstanceOf[BigQueryProjectConnection])
    assert(Connections.connectionInfo(Map(
      "datasource" -> "bigquery", "projectId" -> "p", "datasetId" -> "d",
      "credentialsBase64" -> "x")).isInstanceOf[BigQueryDatasetConnection])
    assert(Connections.connectionInfo(Map(
      "datasource" -> "databricks", "serverHostname" -> "h", "httpPath" -> "/p",
      "clientId" -> "ci", "clientSecret" -> "cs"))
      .isInstanceOf[DatabricksServicePrincipalConnection])
    assert(Connections.connectionInfo(Map(
      "datasource" -> "databricks", "serverHostname" -> "h", "httpPath" -> "/p",
      "accessToken" -> "t")).isInstanceOf[DatabricksTokenConnection])

    // local_file's documented cloud block wires into the path resolver
    // (construction-level: configure() only fires on s3a:// urls) and the
    // profile CLI's envelope flattener accepts it as a legitimate nested key
    val withCloud = Connections.fromProfile(Map(
      "datasource" -> "local_file", "url" -> "/data",
      "cloud" -> Map("accessKey" -> "ak", "secretKey" -> "sk",
        "endpoint" -> "http://minio:9000", "pathStyleAccess" -> true)))
    assert(withCloud.isInstanceOf[PathResolver])
    assert(graft.api.ProfileCli.flattenEnvelope(Map(
      "datasource" -> "local_file", "url" -> "/d",
      "cloud" -> Map("accessKey" -> "a"))).contains("cloud"))

    // the reference's error shapes
    assert(intercept[IllegalArgumentException] {
      Connections.connectionInfo(Map("datasource" -> "trino", "host" -> "h"))
    }.getMessage.contains("requires 'catalog'"))
    assert(intercept[IllegalArgumentException] {
      Connections.connectionInfo(Map("datasource" -> "oracle9i"))
    }.getMessage.startsWith("Unknown data source: oracle9i\nAvailable: "))
  }

  test("the CLI's @profile data-dir queries through a stored profile end-to-end") {
    val home = Files.createTempDirectory("graft_cli_prof_")
    System.setProperty("graft.home", home.toString)
    try {
      val store = new Profiles(home)
      // a ${VAR} reference resolved from a discovered .env at connection time
      Files.write(home.resolve(".env"),
        s"DATA_ROOT=${TestSpark.sfDir}\n".getBytes("UTF-8"))
      store.add("dev", Map(
        "datasource" -> "local_file", "url" -> "${DATA_ROOT}"), activate = true)
      val manifest =
        """{"catalog":"p","schema":"demo","models":[
          |  {"name":"p_nation","tableReference":"nation",
          |   "columns":[{"name":"n_nationkey","type":"int"},
          |              {"name":"n_name","type":"varchar"}]}]}""".stripMargin
      val out = Cli.run(TestSpark.spark, "@profile", manifest,
        "SELECT count(*) AS n FROM p_nation", mode = "json")
      assert(out.contains("25"), out)
      // named profile selection + the not-found message
      val out2 = Cli.run(TestSpark.spark, "@profile:dev", manifest,
        "SELECT count(*) AS n FROM p_nation", mode = "json")
      assert(out2.contains("25"))
      assert(intercept[IllegalArgumentException] {
        Cli.run(TestSpark.spark, "@profile:nope", manifest, "SELECT 1")
      }.getMessage.contains("profile 'nope' not found"))
    } finally System.clearProperty("graft.home")
  }
}
