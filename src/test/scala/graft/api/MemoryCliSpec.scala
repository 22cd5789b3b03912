package graft.api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Drives the `graft memory` CLI core command-by-command against a scratch
  * store (the reference's Typer sub-app, `wren/src/wren/memory/cli.py`):
  * index/describe/fetch/store/recall/status/list/forget/dump/load/reset,
  * both output modes, and the flag-parsing fix (boolean flags don't swallow
  * positionals).
  */
class MemoryCliSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val mdl =
    """{"catalog":"mc","schema":"demo","models":[
      |  {"name":"mo_orders","tableReference":"orders","primaryKey":"o_orderkey",
      |   "columns":[
      |     {"name":"o_orderkey","type":"bigint"},
      |     {"name":"o_totalprice","type":"double","properties":{"description":"order revenue"}},
      |     {"name":"o_orderstatus","type":"varchar"}]}
      |]}""".stripMargin

  private def newPath = Files.createTempDirectory("graft_memcli_").toString

  private def cli(path: String, args: String*): String =
    MemoryCli.run(spark, args.toSeq ++ Seq("--mdl", mdl, "--path", path))

  test("index → status → describe → fetch") {
    val path = newPath
    val out = cli(path, "index")
    assert(out == "Indexed 4 schema items, 3 seed queries.", out)
    val status = cli(path, "status")
    assert(status.contains("schema_items: 4") && status.contains("query_history: 3"))
    assert(cli(path, "describe").contains("### Model: mo_orders"))
    // small schema → full strategy; --threshold 0 forces embedding search
    assert(cli(path, "fetch", "--query", "revenue").startsWith("Strategy: full"))
    val search = cli(path, "fetch", "--query", "order revenue", "--threshold", "0")
    assert(search.startsWith("Strategy: search") && search.contains("o_totalprice"))
    val asJson = cli(path, "fetch", "--query", "order revenue",
      "--threshold", "0", "--output", "json")
    assert(asJson.contains("\"item_name\" : \"o_totalprice\""), asJson)
  }

  test("store → recall → list → forget round-trip") {
    val path = newPath
    assert(cli(path, "store", "--nl", "total revenue",
      "--sql", "SELECT sum(o_totalprice) FROM mo_orders") == "Query stored.")
    assert(cli(path, "store", "--nl", "open orders",
      "--sql", "SELECT * FROM mo_orders WHERE o_orderstatus = 'O'",
      "--tags", "source:manual") == "Query stored.")
    val recall = cli(path, "recall", "--query", "total revenue")
    assert(recall.linesIterator.drop(1).next().contains("total revenue"), recall)
    val listed = cli(path, "list", "--limit", "1")
    assert(listed.contains("open orders") && listed.contains("Showing 1-1 of 2 pairs."))
    assert(cli(path, "forget", "--id", "0") == "Forgot 1 pair(s).")
    assert(cli(path, "list").contains("Showing 1-1 of 1 pairs."))
    // by-source forget demands --force, like the reference's confirm prompt
    val noForce = intercept[IllegalArgumentException] {
      cli(path, "forget", "--source", "manual")
    }
    assert(noForce.getMessage.contains("--force"))
    assert(cli(path, "forget", "--source", "manual", "--force")
      == "Forgot 1 pair(s) with source:manual.")
    assert(cli(path, "list") == "No pairs found.")
  }

  test("dump → load modes; boolean flags don't swallow the positional file") {
    val path = newPath
    cli(path, "store", "--nl", "q a", "--sql", "SELECT 'a'")
    cli(path, "store", "--nl", "q b", "--sql", "SELECT 'b'")
    val file = Files.createTempFile("graft_memcli_", ".yml").toString
    assert(cli(path, "dump", "--output", file) == s"Dumped 2 pair(s) to $file")
    // exact duplicates skip
    assert(cli(path, "load", file) == "Loaded 0 pair(s) (2 skipped).")
    // the Args fix: `load --upsert <file>` must find the positional file
    assert(cli(path, "load", "--upsert", file) == "Loaded 2 pair(s) (2 updated).")
    assert(cli(path, "load", "--dry-run", file) == "Would load 2 pair(s).")
    assert(cli(path, "load", file, "--overwrite") == "Loaded 2 pair(s) (2 new).")
    assert(cli(path, "list").contains("Showing 1-2 of 2 pairs."))
    val both = intercept[IllegalArgumentException] {
      cli(path, "load", file, "--upsert", "--overwrite")
    }
    assert(both.getMessage.contains("cannot be used together"))
  }

  test("reset requires --force; unknown commands and formats reject") {
    val path = newPath
    cli(path, "index", "--no-seed")
    assert(cli(path, "status").contains("schema_items"))
    intercept[IllegalArgumentException] { cli(path, "reset") }
    assert(cli(path, "reset", "--force") == "Memory reset.")
    assert(cli(path, "status").contains("No tables indexed yet."))
    intercept[IllegalArgumentException] { cli(path, "nonsense") }
    intercept[IllegalArgumentException] {
      cli(path, "recall", "--query", "x", "--output", "xml")
    }
  }
}
