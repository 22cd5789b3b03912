package graft.api

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Drives the MCP protocol in-process: initialize handshake, tools/list, and the
  * deploy → query → browse tool flow the reference exposes (mcp-server/app/wren.py).
  */
class McpServerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val manifest =
    """{"catalog":"mcp","schema":"demo","models":[
      |  {"name":"mc_nation","tableReference":"nation","primaryKey":"n_nationkey",
      |   "columns":[{"name":"n_nationkey","type":"int"},{"name":"n_name","type":"varchar"}]}
      |]}""".stripMargin

  /** Send newline-delimited JSON-RPC requests, collect the responses in order. */
  private def roundTrip(requests: Seq[JValue]): Seq[JValue] = {
    val in = new ByteArrayInputStream(
      requests.map(JsonMethods.compact).mkString("\n").getBytes(UTF_8))
    val out = new ByteArrayOutputStream()
    new McpServer(spark, TestSpark.sfDir).serve(in, out)
    out.toString(UTF_8).split('\n').filter(_.nonEmpty).toSeq.map(JsonMethods.parse(_))
  }

  private def req(id: Int, method: String, params: JValue = JObject()): JValue =
    JObject("jsonrpc" -> JString("2.0"), "id" -> JInt(id),
      "method" -> JString(method), "params" -> params)

  private def call(id: Int, tool: String, args: (String, String)*): JValue =
    req(id, "tools/call", JObject(
      "name" -> JString(tool),
      "arguments" -> JObject(args.map { case (k, v) => k -> (JString(v): JValue) }.toList)))

  private def text(resp: JValue): String =
    (resp \ "result" \ "content") (0) \ "text" match { case JString(s) => s; case _ => "" }

  test("initialize handshake and tools/list") {
    val rs = roundTrip(Seq(req(1, "initialize"), req(2, "tools/list")))
    assert((rs(0) \ "result" \ "serverInfo" \ "name") == JString("graft-engine"))
    val names = (rs(1) \ "result" \ "tools").children.map(t => (t \ "name").values.toString)
    assert(Seq("deploy_manifest", "query", "dry_run", "get_table_info",
      "get_available_functions").forall(names.contains))
  }

  test("deploy -> query -> browse flow") {
    val rs = roundTrip(Seq(
      call(1, "is_deployed"),
      call(2, "deploy_manifest", "mdl" -> manifest),
      call(3, "is_deployed"),
      call(4, "query", "sql" -> "SELECT count(*) AS n FROM mc_nation"),
      call(5, "get_available_tables"),
      call(6, "get_table_info", "table_name" -> "mc_nation"),
      call(7, "get_relationships"),
      call(8, "dry_run", "sql" -> "SELECT n_name FROM mc_nation")))
    assert(text(rs(0)) == "false" && text(rs(2)) == "true")
    assert(text(rs(1)) == "deployed")
    assert(text(rs(3)).contains("\"data\""), text(rs(3)))
    assert(text(rs(4)).contains("mc_nation"))
    assert(text(rs(5)).contains("n_nationkey"))
    assert(text(rs(6)) == "[]")
    assert(text(rs(7)) == "ok")
  }

  test("reference tool-name parity: discovery, columns dict, guide, file deploy") {
    val root = java.nio.file.Files.createTempDirectory("graft_mcp_proj_")
    java.nio.file.Files.write(root.resolve("wren_project.yml"),
      "catalog: g\nschema: mcp2\nschema_version: 3\n".getBytes(UTF_8))
    val md = root.resolve("models/fp_nation")
    java.nio.file.Files.createDirectories(md)
    java.nio.file.Files.write(md.resolve("metadata.yml"),
      """name: fp_nation
        |table_reference:
        |  table: nation
        |columns:
        |  - name: n_nationkey
        |    type: int
        |    not_null: true
        |  - name: n_name
        |    type: varchar
        |""".stripMargin.getBytes(UTF_8))
    val rs = roundTrip(Seq(
      call(1, "deploy", "mdl_file_path" -> root.toString),
      call(2, "query", "sql" -> "SELECT count(*) AS n FROM fp_nation"),
      call(3, "list_remote_tables"),
      call(4, "get_table_columns_info", "table_name" -> "fp_nation"),
      call(5, "get_current_data_source_type"),
      call(6, "get_wren_guide"),
      call(7, "list_remote_constraints")))
    assert(text(rs(0)) == "deployed")
    assert(text(rs(1)).contains("25"))
    assert(text(rs(2)).contains("\"nation\"") && text(rs(2)).contains("\"orders\""))
    val cols = JsonMethods.parse(text(rs(3)))
    assert((cols \ "n_nationkey" \ "notNull") == JBool(true))
    assert((cols \ "n_name" \ "type") == JString("varchar"))
    assert(text(rs(4)) == "spark")
    assert(text(rs(5)).contains("deploy_manifest"))
    assert(text(rs(6)) == "[]") // no relationships declared in this project
  }

  test("errors surface as isError tool results, not protocol failures") {
    val rs = roundTrip(Seq(
      call(1, "query", "sql" -> "SELECT 1"), // nothing deployed yet
      call(2, "deploy_manifest", "mdl" -> manifest),
      call(3, "query", "sql" -> "SELECT no_such FROM mc_nation"),
      call(4, "mdl_validate_manifest", "mdl" -> """{"catalog":"c","schema":"s","layoutVersion":9}""")))
    assert((rs(0) \ "result" \ "isError") == JBool(true))
    assert(text(rs(0)).contains("deploy_manifest first"))
    assert((rs(2) \ "result" \ "isError") == JBool(true))
    assert((rs(3) \ "result" \ "isError") == JBool(true) && text(rs(3)).contains("layout version"))
  }

  test("unknown methods answer JSON-RPC errors; notifications are silent") {
    val rs = roundTrip(Seq(
      req(1, "nope/nope"),
      JObject("jsonrpc" -> JString("2.0"), "method" -> JString("notifications/initialized")),
      req(2, "ping")))
    assert((rs(0) \ "error" \ "code") == JInt(-32601))
    assert(rs.length == 2) // the notification produced no response line
    assert((rs(1) \ "result") == JObject())
  }
}
