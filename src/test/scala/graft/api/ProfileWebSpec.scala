package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The browser profile-form routes end-to-end over real HTTP (the
  * reference's `wren profile add --web` Starlette app,
  * `wren/src/wren/profile_web.py:40-160`): form page, per-datasource fields
  * fragment (variants for unions, password inputs for secrets), and the
  * save handler's success/400 shapes — persisted through the same
  * [[Profiles]] store the CLI reads.
  */
class ProfileWebSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val http = HttpClient.newHttpClient()
  private lazy val home = Files.createTempDirectory("graft_profweb_")

  private lazy val (server, port) = {
    val s = new GraftHttpServer(spark, TestSpark.sfDir, port = 0, profilesHome = home)
    (s, s.start())
  }

  private def get(path: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  private def post(path: String, form: String): HttpResponse[String] =
    http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("form page lists every registry datasource") {
    val r = get("/v1/profile/form?name=team")
    assert(r.statusCode() == 200)
    assert(r.body().contains("Create profile 'team'"))
    ProfileWeb.datasourceOptions.foreach(ds =>
      assert(r.body().contains(s""">$ds</option>"""), ds))
  }

  test("fields fragment: inputs per field, secrets as passwords, union variants") {
    val sf = get("/v1/profile/fields?datasource=snowflake").body()
    assert(sf.contains("""name="account"""") && sf.contains("required"))
    assert(sf.contains("""<input type="password" name="password""""))
    // bigquery is a union → variant selector with both models
    val bq = get("/v1/profile/fields?datasource=bigquery").body()
    assert(bq.contains("_variant") && bq.contains("BigQueryDatasetConnection")
      && bq.contains("BigQueryProjectConnection"))
    // variant switch changes the field set
    val proj = get("/v1/profile/fields?datasource=bigquery&_variant=BigQueryProjectConnection").body()
    assert(proj.contains("billingProjectId") && !proj.contains("datasetId"))
    assert(get("/v1/profile/fields?datasource=").body() == "")
    assert(get("/v1/profile/fields?datasource=nope").body() == "")
  }

  test("save: persists via the shared store; error shapes answer 400") {
    val ok = post("/v1/profile/save",
      "_profile_name=web1&datasource=trino&host=t.internal&port=8080&catalog=hive&schema=default")
    assert(ok.statusCode() == 200 && ok.body().contains("✓ Profile 'web1' saved."))
    val stored = new Profiles(home).listProfiles()("web1")
    assert(stored("datasource") == "trino" && stored("host") == "t.internal")

    // union variant key persists as <ds>_type, like the reference
    val v = post("/v1/profile/save",
      "_profile_name=web2&datasource=bigquery&_variant=BigQueryProjectConnection&region=us")
    assert(v.statusCode() == 200)
    assert(new Profiles(home).listProfiles()("web2")("bigquery_type")
      == "BigQueryProjectConnection")

    // a _json blob replaces the per-field inputs
    val j = post("/v1/profile/save",
      "_profile_name=web3&datasource=url&_json=" + java.net.URLEncoder.encode(
        """{"connectionUrl": "jdbc:postgresql://h/db", "ignored_field_off": false}""", "UTF-8"))
    assert(j.statusCode() == 200)
    assert(new Profiles(home).listProfiles()("web3")("connectionUrl")
      == "jdbc:postgresql://h/db")

    // a _variant on a NON-union source never persists (unvalidated noise)
    post("/v1/profile/save", "_profile_name=web4&datasource=trino&host=h&" +
      "catalog=c&schema=s&_variant=Zzz")
    assert(!new Profiles(home).listProfiles()("web4").contains("trino_type"))

    // percent-encoded names round-trip through the form page correctly
    val form = get("/v1/profile/form?name=my%20profile").body()
    assert(form.contains("value=\"my profile\""), form)

    assert(post("/v1/profile/save", "_profile_name=x&datasource=").statusCode() == 400)
    val unsupported = post("/v1/profile/save", "_profile_name=x&datasource=oracle9i")
    assert(unsupported.statusCode() == 400 &&
      unsupported.body().contains("Unsupported data source"))
    assert(post("/v1/profile/save",
      "_profile_name=x&datasource=bigquery&_variant=Nope").statusCode() == 400)
    assert(post("/v1/profile/save",
      "_profile_name=x&datasource=url&_json=notjson").body().contains("Invalid JSON"))
  }
}
