package graft.planner

import org.scalatest.funsuite.AnyFunSuite

/** The connection-info docs stay truthful: every registry entry's field list
  * is reflected against the actual case class (a field added to or removed
  * from Connections.scala breaks this spec until the docs follow), the
  * Markdown/JSON outputs carry the reference's shapes (docs.py:107-144,
  * 207-224), and unknown sources answer the reference's exact error message
  * (docs.py:24-27).
  */
class ConnectionDocsSpec extends AnyFunSuite {
  import ConnectionDocs._

  test("registry field names match the declared case-class fields, in order") {
    for ((ds, models) <- registry; m <- models
         if classOf[Product].isAssignableFrom(m.clazz)) { // case classes only:
      // plain classes (PathResolver) carry derived private vals too
      val declared = m.clazz.getDeclaredFields.toSeq.map(_.getName)
        .filterNot(_.contains("$"))
      assert(declared == m.fields.map(_.name),
        s"$ds/${m.name}: declared=$declared docs=${m.fields.map(_.name)}")
    }
    // PathResolver (non-case class): constructor arity pins the field count
    val pr = registry.collectFirst { case ("local_file", Seq(m)) => m }.get
    assert(pr.clazz.getConstructors.head.getParameterCount == pr.fields.size)
  }

  test("every secret-bearing field is marked sensitive") {
    val sensitive = for ((_, models) <- registry; m <- models;
      fd <- m.fields if fd.sensitive) yield s"${m.name}.${fd.name}"
    // the shapes' secrets, per Connections.scala's option-map compilation
    val expected = Set(
      "AthenaConnection.awsSecretAccessKey", "AthenaConnection.awsSessionToken",
      "AthenaConnection.webIdentityToken",
      "BigQueryDatasetConnection.credentialsBase64",
      "BigQueryProjectConnection.credentialsBase64",
      "DatabricksTokenConnection.accessToken",
      "DatabricksServicePrincipalConnection.clientSecret",
      "RedshiftIamConnection.awsSecretAccessKey",
      "SnowflakeConnection.password", "SnowflakeConnection.privateKeyPem",
      "TrinoConnection.password")
    assert(sensitive.toSet == expected, sensitive.sorted)
  }

  test("markdown carries the reference's section + table + example shapes") {
    val md = markdown()
    assert(md.startsWith("# Graft Engine Connection Info Reference"))
    assert(md.contains("## bigquery") && md.contains("### BigQueryDatasetConnection"))
    assert(md.contains("| Field | Type | Required | Default | Sensitive | Example |"))
    assert(md.contains("| `credentialsBase64` | string | yes |  | yes |"))
    assert(md.contains("```json"))
    // filtered generation contains only that source
    val sf = markdown(Some("snowflake"))
    assert(sf.contains("## snowflake") && !sf.contains("## bigquery"))
    assert(sf.contains("| `privateKeyPem` | string | no | null | yes |"))
  }

  test("json-schema envelope: one object per variant, properties from examples") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val single = JsonMethods.parse(jsonSchemaEnvelope(Some("trino")))
    assert((single \ "datasource") == JString("trino"))
    assert((single \ "properties" \ "host") == JString("trino.internal"))
    assert((single \ "properties" \ "port") == JInt(8080))
    assert((single \ "properties" \ "password") == JNull)
    val all = JsonMethods.parse(jsonSchemaEnvelope(None))
    val objs = all.children
    assert(objs.size == registry.map(_._2.size).sum)
    // bigquery's union lists BOTH variants under the same datasource key
    assert(objs.count(o => (o \ "datasource") == JString("bigquery")) == 2)
  }

  test("unknown sources answer the reference's ValueError message shape") {
    val e = intercept[IllegalArgumentException] { markdown(Some("oracle9i")) }
    assert(e.getMessage.startsWith("Unknown data source: oracle9i\nAvailable: "))
    assert(e.getMessage.contains("athena, bigquery, databricks"))
    // case-insensitive resolution, like the reference's key.lower()
    assert(markdown(Some("TRINO")).contains("### TrinoConnection"))
  }
}
