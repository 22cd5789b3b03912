package graft.api

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The seven memory_* MCP tools end-to-end over the stdio framing (the
  * reference's `wren memory` surface exposed to agents): index → context →
  * store → recall → status → reset, plus the deploy-first guard.
  */
class McpMemorySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val manifest =
    """{"catalog":"mcpm","schema":"demo","models":[
      |  {"name":"mm_orders","tableReference":"orders","primaryKey":"o_orderkey",
      |   "columns":[
      |     {"name":"o_orderkey","type":"bigint"},
      |     {"name":"o_totalprice","type":"double","properties":{"description":"order revenue"}},
      |     {"name":"o_orderstatus","type":"varchar"}]}
      |]}""".stripMargin

  /** One server per round-trip, over its own scratch store (never the
    * per-user default — that's for real sessions).
    */
  private def roundTrip(requests: Seq[JValue]): Seq[JValue] = {
    val in = new ByteArrayInputStream(
      requests.map(JsonMethods.compact).mkString("\n").getBytes(UTF_8))
    val out = new ByteArrayOutputStream()
    new McpServer(spark, TestSpark.sfDir,
      memoryDir = java.nio.file.Files.createTempDirectory("graft_mcp_mem_").toString)
      .serve(in, out)
    out.toString(UTF_8).split('\n').filter(_.nonEmpty).toSeq.map(JsonMethods.parse(_))
  }

  private def call(id: Int, tool: String, args: (String, String)*): JValue =
    JObject("jsonrpc" -> JString("2.0"), "id" -> JInt(id),
      "method" -> JString("tools/call"), "params" -> JObject(
        "name" -> JString(tool),
        "arguments" -> JObject(args.map { case (k, v) => k -> (JString(v): JValue) }.toList)))

  private def text(resp: JValue): String =
    (resp \ "result" \ "content") (0) \ "text" match { case JString(s) => s; case _ => "" }

  test("memory tools are listed, and require a deployment like the query tools") {
    val rs = roundTrip(Seq(
      JObject("jsonrpc" -> JString("2.0"), "id" -> JInt(1),
        "method" -> JString("tools/list"), "params" -> JObject()),
      call(2, "memory_index")))
    val names = (rs(0) \ "result" \ "tools").children.map(t => (t \ "name").values.toString)
    assert(Seq("memory_index", "memory_describe", "memory_get_context",
      "memory_store_query", "memory_recall_queries", "memory_status",
      "memory_reset").forall(names.contains), names)
    assert((rs(1) \ "result" \ "isError") == JBool(true))
    assert(text(rs(1)).contains("deploy_manifest first"))
  }

  test("index → describe → context → store → recall → status → reset flow") {
    val rs = roundTrip(Seq(
      call(1, "deploy_manifest", "mdl" -> manifest),
      call(2, "memory_index"),
      call(3, "memory_describe"),
      call(4, "memory_get_context", "query" -> "order revenue"),
      call(5, "memory_store_query",
        "nl" -> "total revenue", "sql" -> "SELECT sum(o_totalprice) FROM mm_orders"),
      call(6, "memory_recall_queries", "query" -> "total revenue"),
      call(7, "memory_status"),
      call(8, "memory_reset"),
      call(9, "memory_status")))
    val idx = JsonMethods.parse(text(rs(1)))
    assert((idx \ "schema_items") == JInt(4) && (idx \ "seed_queries") == JInt(3), text(rs(1)))
    assert(text(rs(2)).contains("### Model: mm_orders"))
    val ctx = JsonMethods.parse(text(rs(3)))
    // small schema: full strategy with the complete description
    assert((ctx \ "strategy") == JString("full"))
    assert((ctx \ "schema").values.toString.contains("order revenue"))
    assert(text(rs(4)) == "stored")
    val recall = JsonMethods.parse(text(rs(5))).children
    assert(recall.nonEmpty && (recall.head \ "nl_query") == JString("total revenue"),
      text(rs(5)))
    val status = JsonMethods.parse(text(rs(6)))
    assert((status \ "tables" \ "schema_items") == JInt(4))
    assert((status \ "tables" \ "query_history") == JInt(4)) // 3 seeds + 1 stored
    assert(text(rs(7)) == "reset")
    assert(JsonMethods.parse(text(rs(8))) \ "tables" == JObject())
  }
}
