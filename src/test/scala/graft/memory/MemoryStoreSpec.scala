package graft.memory

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.mdl.ManifestJson

/** Round-trips the parquet-backed memory store (`wren/src/wren/memory/store.py`
  * port): index → current/stale, context strategies, search/recall ranking,
  * history management (list/forget/dump/load in all three modes), and the
  * documented divergence (zero-overlap searches return empty, not k-nearest).
  */
class MemoryStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val manifest = ManifestJson.parse(
    """{"catalog":"mem","schema":"demo","models":[
      |  {"name":"ms_orders","tableReference":"orders","primaryKey":"o_orderkey",
      |   "columns":[
      |     {"name":"o_orderkey","type":"bigint"},
      |     {"name":"o_totalprice","type":"double","properties":{"description":"order revenue"}},
      |     {"name":"o_orderstatus","type":"varchar"}]},
      |  {"name":"ms_customer","tableReference":"customer","primaryKey":"c_custkey",
      |   "columns":[
      |     {"name":"c_custkey","type":"bigint"},
      |     {"name":"c_mktsegment","type":"varchar","properties":{"description":"market segment"}}]}
      |],"relationships":[
      |  {"name":"orders_customer","models":["ms_orders","ms_customer"],
      |   "joinType":"MANY_TO_ONE","condition":"\"ms_orders\".\"o_custkey\" = \"ms_customer\".\"c_custkey\""}
      |]}""".stripMargin)

  private def freshStore(): MemoryStore =
    new MemoryStore(spark, Files.createTempDirectory("graft_store_spec_").toString)

  test("m29/m30 oracle pins match the live extractor (pin-is-truth protocol)") {
    // The driver oracles in queries/Memory.scala are built from LITERAL
    // strings so they cannot inherit extraction bugs; this cross-check makes
    // drift (fixture-manifest edit or SchemaIndexer/SeedQueries change) a
    // test failure. Regenerate with `sbt "runMain graft.tools.MemoryPinGen"`.
    val extracted = SchemaIndexer.extractSchemaItems(graft.queries.Semantic.manifest)
      .map(i => (i.itemType, i.modelName, i.itemName, i.text))
    assert(graft.queries.Memory.pinnedSchemaItems == extracted)
    val seeds = SeedQueries.generateSeedQueries(graft.queries.Semantic.manifest)
      .map(p => (p.nl, p.sql))
    assert(graft.queries.Memory.pinnedSeedPairs == seeds)
    assert(graft.queries.Memory.pinnedSeedTag == SeedQueries.SeedTag)
  }

  test("indexSchema counts, schemaIsCurrent staleness, and re-index") {
    val store = freshStore()
    assert(!store.schemaIsCurrent(manifest), "empty store is never current")
    val (schemaCount, seedCount) = store.indexSchema(manifest)
    // 2 model records + 5 columns + 1 relationship = 8 items
    assert(schemaCount == 8, s"schemaCount=$schemaCount")
    assert(seedCount == SeedQueries.generateSeedQueries(manifest).size && seedCount > 0)
    assert(store.schemaIsCurrent(manifest))
    // a changed manifest (different hash) flips staleness without re-index
    val changed = manifest.copy(schema = "other")
    assert(SchemaIndexer.manifestHash(changed) != SchemaIndexer.manifestHash(manifest))
    assert(!store.schemaIsCurrent(changed))
    // re-index replaces rather than appends
    val (again, _) = store.indexSchema(manifest)
    assert(again == 8 && store.status()._2("schema_items") == 8)
  }

  test("indexSchema(alsoStore) batches user pairs into the seed append, rows identical") {
    // r16: m30 lands seeds + the user pair in ONE parquet append. The batched
    // store must hold the exact table a sequential storeQuery would have
    // produced — same seq order, same tags — and recall must rank identically.
    val sequential = freshStore()
    sequential.indexSchema(manifest, seedQueries = true)
    sequential.storeQuery("show revenue by segment", "SELECT 1")
    val batched = freshStore()
    batched.indexSchema(manifest, seedQueries = true,
      alsoStore = Seq(("show revenue by segment", "SELECT 1")))
    def table(s: MemoryStore) = s.listQueries(limit = 100)._1
      .map(m => (m("_row_id"), m("nl_query"), m("sql_query"), m("tags")))
    assert(table(batched) == table(sequential))
    val recall = batched.recallQueries("revenue by segment", limit = 3)
    assert(recall.nonEmpty && recall.head("sql_query") == "SELECT 1")
    // alsoStore without seeding appends alone (and an empty batch is a no-op)
    val bare = freshStore()
    bare.indexSchema(manifest, seedQueries = false,
      alsoStore = Seq(("q1", "SELECT 2")))
    assert(table(bare) == Seq((0L, "q1", "SELECT 2", "")))
  }

  test("getContext: full text below threshold, embedding search above") {
    val store = freshStore()
    store.indexSchema(manifest, seedQueries = false)
    store.getContext(manifest, "revenue") match {
      case FullContext(text) =>
        assert(text.contains("ms_orders") && text.contains("order revenue"))
      case other => fail(s"small schema must describe fully, got $other")
    }
    store.getContext(manifest, "order revenue", threshold = 0) match {
      case SearchContext(results) =>
        assert(results.nonEmpty && results.size <= 5)
        // ranked: the revenue-describing column outranks unrelated items
        val top = results.head
        assert(top("item_name") == "o_totalprice", results.map(_("item_name")))
        assert(!top.contains("vector"), "vectors never leave the store")
        // deterministic: same question, same ranking
        val again = store.getContext(manifest, "order revenue", threshold = 0)
          .asInstanceOf[SearchContext].results
        assert(again == results)
      case other => fail(s"threshold=0 must force search, got $other")
    }
  }

  test("searchSchema filters (itemType/modelName/mdlHash) and empty-on-no-overlap") {
    val store = freshStore()
    store.indexSchema(manifest, seedQueries = false)
    val cols = store.searchSchema("market segment", itemType = Some("column"))
    assert(cols.nonEmpty && cols.forall(_("item_type") == "column"))
    val scoped = store.searchSchema("segment", modelName = Some("ms_customer"))
    assert(scoped.nonEmpty && scoped.forall(_("model_name") == "ms_customer"))
    val stale = store.searchSchema("segment", mdlHash = Some("0000000000000000"))
    assert(stale.isEmpty, "a foreign mdl hash matches nothing")
    // the documented reference divergence (store.py:258-273 returns k-nearest
    // regardless): zero lexical overlap → empty, never noise
    assert(store.searchSchema("zzzz qqqq").isEmpty)
  }

  test("storeQuery + recallQueries ranking and row ids") {
    val store = freshStore()
    store.storeQuery("total revenue by segment",
      "SELECT c_mktsegment, sum(o_totalprice) FROM ms_orders GROUP BY 1")
    store.storeQuery("count orders", "SELECT count(*) FROM ms_orders",
      datasource = Some("duckdb"), tags = Some("fav"))
    val hits = store.recallQueries("revenue by segment")
    assert(hits.nonEmpty && hits.head("nl_query") == "total revenue by segment")
    assert(hits.head("_row_id") == 0L)
    val filtered = store.recallQueries("orders", datasource = Some("duckdb"))
    assert(filtered.nonEmpty && filtered.forall(_("datasource") == "duckdb"))
    assert(store.recallQueries("wwww xxxx").isEmpty, "no-overlap recall is empty")
  }

  test("listQueries pages newest-first; count/forget by id and by source") {
    val store = freshStore()
    (1 to 5).foreach(i => store.storeQuery(s"question $i", s"SELECT $i"))
    val (page, total) = store.listQueries(limit = 2)
    assert(total == 5 && page.size == 2)
    assert(page.head("nl_query") == "question 5", "newest first")
    val (page2, _) = store.listQueries(limit = 2, offset = 2)
    assert(page2.map(_("nl_query")) == Seq("question 3", "question 2"))
    // stable _row_id survives paging: forget by id kills exactly that row
    val victim = page2.head("_row_id").asInstanceOf[Long]
    assert(store.forgetQueriesByIds(Seq(victim)) == 1)
    assert(store.listQueries()._2 == 4)
    assert(store.recallQueries("question", limit = 10)
      .forall(_("nl_query") != "question 3"), "forgotten row no longer recalls")
    // by-source forget: load tagged pairs, then drop them all
    store.loadQueries(Seq(
      MemoryPair("a", "SELECT 'a'", source = "import"),
      MemoryPair("b", "SELECT 'b'", source = "import")))
    assert(store.countQueriesBySource("import") == 2)
    assert(store.forgetQueriesBySource("import") == 2)
    assert(store.countQueriesBySource("import") == 0 && store.listQueries()._2 == 4)
    // forgetting everything removes the table cleanly
    val ids = store.listQueries(limit = 100)._1.map(_("_row_id").asInstanceOf[Long])
    assert(store.forgetQueriesByIds(ids) == 4)
    assert(store.listQueries() == ((Nil, 0L)))
  }

  test("dump → YAML → load round-trip; skip/upsert/overwrite modes") {
    val store = freshStore()
    store.storeQuery("q one", "SELECT 1", datasource = Some("spark"))
    store.storeQuery("q two", "SELECT 2")
    val dumped = store.dumpQueries()
    assert(dumped.map(_("nl_query")) == Seq("q one", "q two"), "oldest first")
    val yaml = MemoryYaml.pairsToYaml(dumped)
    val pairs = MemoryYaml.parsePairs(yaml)
    assert(pairs.map(p => (p.nl, p.sql, p.datasource)) == Seq(
      ("q one", "SELECT 1", Some("spark")), ("q two", "SELECT 2", None)))

    // default mode: exact (nl, sql) duplicates skip, new pairs load
    val r1 = store.loadQueries(pairs :+ MemoryPair("q three", "SELECT 3"))
    assert(r1 == LoadResult(loaded = 1, skipped = 2, updated = 0))
    assert(store.listQueries()._2 == 3)

    // upsert: same nl replaces (last input occurrence wins), new nl appends
    val r2 = store.loadQueries(Seq(
      MemoryPair("q one", "SELECT 100"),
      MemoryPair("q one", "SELECT 111"),
      MemoryPair("q four", "SELECT 4")), upsert = true)
    assert(r2 == LoadResult(loaded = 1, skipped = 0, updated = 1))
    val one = store.recallQueries("q one", limit = 10)
      .filter(_("nl_query") == "q one")
    assert(one.size == 1 && one.head("sql_query") == "SELECT 111")

    // overwrite: clears each incoming source tag first
    store.loadQueries(Seq(MemoryPair("x", "SELECT 'x'", source = "team")))
    val r3 = store.loadQueries(Seq(
      MemoryPair("y", "SELECT 'y'", source = "team")), overwrite = true)
    assert(r3.loaded == 1 && store.countQueriesBySource("team") == 1)
    assert(store.dumpQueries(Some("team")).map(_("nl_query")) == Seq("y"))

    val err = intercept[IllegalArgumentException] {
      store.loadQueries(pairs, overwrite = true, upsert = true)
    }
    assert(err.getMessage.contains("cannot be used together"))
  }

  test("an interrupted forget swap recovers the .old survivor on the next read") {
    val home = Files.createTempDirectory("graft_store_spec_")
    val store = new MemoryStore(spark, home.toString)
    store.storeQuery("keep me", "SELECT 1")
    store.storeQuery("and me", "SELECT 2")
    // simulate a crash between the two moves: live renamed aside, the
    // replacement never moved into place
    val live = home.resolve("query_history")
    Files.move(live, home.resolve("query_history.old"))
    assert(!Files.exists(live))
    val (rows, total) = store.listQueries()
    assert(total == 2 && rows.map(_("nl_query")).toSet == Set("keep me", "and me"),
      "the .old survivor must be restored, not treated as an empty store")
    assert(Files.exists(live) && !Files.exists(home.resolve("query_history.old")))
  }

  test("status and reset") {
    val store = freshStore()
    assert(store.status()._2.isEmpty)
    store.indexSchema(manifest)
    store.storeQuery("n", "SELECT 1")
    val tables = store.status()._2
    assert(tables("schema_items") == 8)
    assert(tables("query_history") ==
      SeedQueries.generateSeedQueries(manifest).size + 1L)
    store.reset()
    assert(store.status()._2.isEmpty && store.searchSchema("orders").isEmpty)
  }
}
