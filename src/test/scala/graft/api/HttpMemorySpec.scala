package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The six /v1/memory HTTP routes end-to-end over real HTTP (the reference's
  * `wren memory` surface served to agent consumers): index, context, query
  * (store), recall, status, reset — plus the 4xx shapes for missing fields.
  */
class HttpMemorySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val http = HttpClient.newHttpClient()

  private lazy val (server, port) = {
    val s = new GraftHttpServer(spark, TestSpark.sfDir, port = 0)
    (s, s.start())
  }

  private val manifestStr =
    """{"catalog":"hm","schema":"demo","models":[
      |  {"name":"hm_orders","tableReference":"orders","primaryKey":"o_orderkey",
      |   "columns":[
      |     {"name":"o_orderkey","type":"bigint"},
      |     {"name":"o_totalprice","type":"double","properties":{"description":"order revenue"}},
      |     {"name":"o_orderstatus","type":"varchar"}]}
      |]}""".stripMargin

  private def post(path: String, fields: (String, JValue)*): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(
          JsonMethods.compact(JObject(fields.toList)))).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(path: String): HttpResponse[String] =
    http.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("index → context → store → recall → status → reset over HTTP") {
    val idx = post("/v1/memory/index", "manifestStr" -> JString(manifestStr))
    assert(idx.statusCode() == 200, idx.body())
    val idxJson = JsonMethods.parse(idx.body())
    assert((idxJson \ "schema_items") == JInt(4) && (idxJson \ "seed_queries") == JInt(3))

    // small schema → full; threshold 0 → embedding search over indexed items
    val full = post("/v1/memory/context",
      "manifestStr" -> JString(manifestStr), "query" -> JString("revenue"))
    assert((JsonMethods.parse(full.body()) \ "strategy") == JString("full"))
    val search = post("/v1/memory/context",
      "manifestStr" -> JString(manifestStr), "query" -> JString("order revenue"),
      "threshold" -> JInt(0))
    val sJson = JsonMethods.parse(search.body())
    assert((sJson \ "strategy") == JString("search"), search.body())
    val items = (sJson \ "results").children
    assert(items.nonEmpty && (items.head \ "item_name") == JString("o_totalprice"))

    val stored = post("/v1/memory/query",
      "nl" -> JString("total revenue"),
      "sql" -> JString("SELECT sum(o_totalprice) FROM hm_orders"))
    assert(stored.statusCode() == 200 && stored.body().contains("\"stored\":true"))

    val recall = post("/v1/memory/recall", "query" -> JString("total revenue"))
    val hits = JsonMethods.parse(recall.body()).children
    assert(hits.nonEmpty && (hits.head \ "nl_query") == JString("total revenue"),
      recall.body())

    val status = get("/v1/memory/status")
    val stJson = JsonMethods.parse(status.body())
    assert((stJson \ "tables" \ "schema_items") == JInt(4))
    assert((stJson \ "tables" \ "query_history") == JInt(4)) // 3 seeds + 1 stored

    assert(post("/v1/memory/reset").statusCode() == 204)
    assert((JsonMethods.parse(get("/v1/memory/status").body()) \ "tables") == JObject())
  }

  test("missing required fields answer 4xx, not 500") {
    val noQuery = post("/v1/memory/context", "manifestStr" -> JString(manifestStr))
    assert(noQuery.statusCode() >= 400 && noQuery.statusCode() < 500, noQuery.body())
    assert(noQuery.body().contains("query is required"))
    val noManifest = post("/v1/memory/index")
    assert(noManifest.statusCode() >= 400 && noManifest.statusCode() < 500)
    val noSql = post("/v1/memory/query", "nl" -> JString("x"))
    assert(noSql.statusCode() >= 400 && noSql.statusCode() < 500)
    assert(noSql.body().contains("sql is required"))
  }
}
