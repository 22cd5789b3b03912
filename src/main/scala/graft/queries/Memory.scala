package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.memory.{HashedEmbedding, MemoryStore}

/** Cross-engine driver entries for the schema/query memory
  * (`wren/src/wren/memory/store.py` ported as [[graft.memory.MemoryStore]]).
  *
  * The hashed bag-of-words embedding was DESIGNED for this replay
  * ([[graft.memory.HashedEmbedding]]): token → `('0x' || substr(md5(tok),1,15))
  * ::BIGINT % dim` bucket, vector = bucket counts, score = dot²/(norm2·qnorm2)
  * over exact integers. The Spark side indexes the [[Semantic.manifest]]
  * fixture through the real store (parquet write + bucket-join retrieval);
  * the DuckDB oracle re-derives the identical ranking from the raw texts
  * inlined as VALUES — no shared code, only the published arithmetic. Every
  * non-score column is an exact string/long; the score itself is a
  * deterministic sequence of IEEE-754 double divisions over exact integers,
  * so it hash-compares bit-for-bit.
  */
object Memory {

  /** The question both engines rank schema items against. */
  val contextQuery = "total price of customer orders by segment"

  /** The question both engines rank stored NL-SQL pairs against. */
  val recallQuery = "total o_totalprice by o_orderstatus in m_orders"

  /** One user-stored pair on top of the generated seeds, so the recall entry
    * covers [[MemoryStore.storeQuery]] as well as the seed path.
    */
  val userPair: (String, String) =
    ("average order price per customer nation",
      "SELECT cust_nation, avg(o_totalprice) FROM m_orders GROUP BY 1")

  private def tempStore(s: SparkSession): MemoryStore = new MemoryStore(
    s, java.nio.file.Files.createTempDirectory("graft_mem_entry_").toString)

  /** `m29_memory_context`: index the fixture manifest's schema items and rank
    * them against [[contextQuery]] — the [[MemoryStore.searchSchema]] path
    * with the exact dot/norm2 integers kept in the output.
    */
  def memoryContext(s: SparkSession, dir: String): DataFrame = {
    val store = tempStore(s)
    store.indexSchema(Semantic.manifest, seedQueries = false)
    store.searchSchemaScored(contextQuery, limit = 5).get
      .select(col("item_type"), col("model_name"), col("item_name"), col("text"),
        col("dot"), col("norm2"), col("score"))
  }

  /** `m30_memory_recall`: generate + store the manifest's seed NL-SQL pairs,
    * store one user pair, and rank the history against [[recallQuery]] — the
    * [[MemoryStore.recallQueries]] path.
    */
  def memoryRecall(s: SparkSession, dir: String): DataFrame = {
    val store = tempStore(s)
    // seeds + the user pair land in ONE append (one maxSeq read, one parquet
    // write) instead of two cycles — same rows, same seq order, r16 verdict
    // ask #6; MemoryStoreSpec pins batched ≡ sequential.
    store.indexSchema(Semantic.manifest, seedQueries = true,
      alsoStore = Seq(userPair))
    store.recallQueriesScored(recallQuery, limit = 5).get
      .select(col("seq"), col("nl_query"), col("sql_query"), col("tags"),
        col("dot"), col("norm2"), col("score"))
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The md5 bucket of a token — DuckDB spelling of
    * [[HashedEmbedding.bucketCol]] (same 60-bit arithmetic as the dedup
    * oracles, e.g. the d2 minhash replay).
    */
  private def duckBucket(tok: String): String =
    s"('0x' || substr(md5($tok), 1, 15))::BIGINT % ${HashedEmbedding.DefaultDim}"

  /** Tokenizer CTE body: DuckDB spelling of [[HashedEmbedding.tokensCol]]. */
  private def duckToks(textExpr: String): String =
    s"unnest(list_filter(string_split_regex(lower($textExpr), '[^a-z0-9]+'), x -> len(x) > 0))"

  /** The full ranking replay over an inline corpus: `values` rows of
    * (keyCols..., text), scored against `query`, top-`limit` by
    * (score DESC, tieBreak...). Mirrors [[HashedEmbedding.scoreAgainst]]
    * term for term, including the left-to-right double division order.
    */
  private def rankingOracle(
      keyCols: Seq[String], values: Seq[Seq[String]], query: String,
      tieBreak: Seq[String], limit: Int, emitText: Boolean): String = {
    val keyList = keyCols.mkString(", ")
    val textOut = if (emitText) ", i.text" else ""
    val rows = values.map(_.mkString("(", ", ", ")")).mkString(",\n    ")
    s"""WITH items(${keyCols.mkString(", ")}, text) AS (VALUES
       |    $rows),
       |toks AS (
       |  SELECT $keyList, text, ${duckToks("text")} AS tok FROM items),
       |counts AS (
       |  SELECT $keyList, ${duckBucket("tok")} AS bucket, count(*) AS cnt
       |  FROM toks GROUP BY ALL),
       |qtok AS (SELECT ${duckToks(sqlLit(query))} AS tok),
       |q AS (SELECT ${duckBucket("tok")} AS bucket, count(*) AS qw
       |      FROM qtok GROUP BY 1),
       |qn AS (SELECT CAST(sum(qw * qw) AS BIGINT) AS qnorm2 FROM q),
       |norms AS (
       |  SELECT $keyList, CAST(sum(cnt * cnt) AS BIGINT) AS norm2
       |  FROM counts GROUP BY ALL),
       |dots AS (
       |  SELECT $keyList, CAST(sum(cnt * qw) AS BIGINT) AS dot
       |  FROM counts JOIN q USING (bucket) GROUP BY ALL),
       |scored AS (
       |  SELECT $keyList, dot, norm2,
       |    CAST(dot * dot AS DOUBLE) / CAST(norm2 AS DOUBLE)
       |      / (SELECT CAST(qnorm2 AS DOUBLE) FROM qn) AS score
       |  FROM dots JOIN norms USING ($keyList)),
       |top AS (SELECT * FROM scored
       |        ORDER BY score DESC, ${tieBreak.mkString(", ")} LIMIT $limit)
       |SELECT i.${keyCols.head}${keyCols.tail.map(k => s", i.$k").mkString}$textOut,
       |  t.dot, t.norm2, t.score
       |FROM top t JOIN items i USING ($keyList)""".stripMargin
  }

  /** The fixture manifest's 53 schema items, pinned as LITERALS so the m29
    * oracle text is built from strings only — no call into
    * [[SchemaIndexer.extractSchemaItems]] at oracle-build time, which would
    * make extraction bugs invisible to the driver gate. The pins are the
    * hand-audited truth; MemoryStoreSpec asserts pinned == extracted so any
    * drift (manifest edit or extractor bug) fails a test instead of silently
    * re-deriving the oracle. Regenerate with
    * `sbt "runMain graft.tools.MemoryPinGen"` and audit the diff.
    */
  private[graft] val pinnedSchemaItems: Seq[(String, String, String, String)] = Seq(
    ("model", "m_region", "m_region",
      "Model 'm_region'. Columns: r_regionkey (int), r_name (varchar). Primary key: r_regionkey."),
    ("column", "m_region", "r_regionkey",
      "Column 'r_regionkey' (int) in model 'm_region'."),
    ("column", "m_region", "r_name",
      "Column 'r_name' (varchar) in model 'm_region'."),
    ("model", "m_nation", "m_nation",
      "Model 'm_nation'. Columns: n_nationkey (int), n_name (varchar), n_regionkey (int), region (m_region), region_name (varchar). Primary key: n_nationkey."),
    ("column", "m_nation", "n_nationkey",
      "Column 'n_nationkey' (int) in model 'm_nation'."),
    ("column", "m_nation", "n_name",
      "Column 'n_name' (varchar) in model 'm_nation'."),
    ("column", "m_nation", "n_regionkey",
      "Column 'n_regionkey' (int) in model 'm_nation'."),
    ("column", "m_nation", "region",
      "Column 'region' (m_region) in model 'm_nation'. Relationship: nation_region."),
    ("column", "m_nation", "region_name",
      "Column 'region_name' (varchar) in model 'm_nation'. Calculated: \"region\".\"r_name\"."),
    ("model", "m_customer", "m_customer",
      "Model 'm_customer'. Columns: c_custkey (bigint), c_name (varchar), c_nationkey (int), c_acctbal (double), c_mktsegment (varchar), nation (m_nation), orders (m_orders), nation_name (varchar), region_name (varchar), total_spent (decimal(18,2)), order_count (bigint). Primary key: c_custkey."),
    ("column", "m_customer", "c_custkey",
      "Column 'c_custkey' (bigint) in model 'm_customer'."),
    ("column", "m_customer", "c_name",
      "Column 'c_name' (varchar) in model 'm_customer'."),
    ("column", "m_customer", "c_nationkey",
      "Column 'c_nationkey' (int) in model 'm_customer'."),
    ("column", "m_customer", "c_acctbal",
      "Column 'c_acctbal' (double) in model 'm_customer'."),
    ("column", "m_customer", "c_mktsegment",
      "Column 'c_mktsegment' (varchar) in model 'm_customer'."),
    ("column", "m_customer", "nation",
      "Column 'nation' (m_nation) in model 'm_customer'. Relationship: customer_nation."),
    ("column", "m_customer", "orders",
      "Column 'orders' (m_orders) in model 'm_customer'. Relationship: orders_customer."),
    ("column", "m_customer", "nation_name",
      "Column 'nation_name' (varchar) in model 'm_customer'. Calculated: \"nation\".\"n_name\"."),
    ("column", "m_customer", "region_name",
      "Column 'region_name' (varchar) in model 'm_customer'. Calculated: \"nation\".\"region\".\"r_name\"."),
    ("column", "m_customer", "total_spent",
      "Column 'total_spent' (decimal(18,2)) in model 'm_customer'. Calculated: sum(cast(\"orders\".\"o_totalprice\" as decimal(18,2)))."),
    ("column", "m_customer", "order_count",
      "Column 'order_count' (bigint) in model 'm_customer'. Calculated: count(\"orders\".\"o_orderkey\")."),
    ("model", "m_orders", "m_orders",
      "Model 'm_orders'. Columns: o_orderkey (bigint), o_custkey (bigint), o_orderstatus (varchar), o_totalprice (double), o_price_dec (decimal(18,2)), o_orderdate (date), o_orderpriority (varchar), order_cust (varchar), customer (m_customer), cust_segment (varchar), cust_nation (varchar). Primary key: o_orderkey."),
    ("column", "m_orders", "o_orderkey",
      "Column 'o_orderkey' (bigint) in model 'm_orders'."),
    ("column", "m_orders", "o_custkey",
      "Column 'o_custkey' (bigint) in model 'm_orders'."),
    ("column", "m_orders", "o_orderstatus",
      "Column 'o_orderstatus' (varchar) in model 'm_orders'."),
    ("column", "m_orders", "o_totalprice",
      "Column 'o_totalprice' (double) in model 'm_orders'."),
    ("column", "m_orders", "o_price_dec",
      "Column 'o_price_dec' (decimal(18,2)) in model 'm_orders'."),
    ("column", "m_orders", "o_orderdate",
      "Column 'o_orderdate' (date) in model 'm_orders'."),
    ("column", "m_orders", "o_orderpriority",
      "Column 'o_orderpriority' (varchar) in model 'm_orders'."),
    ("column", "m_orders", "order_cust",
      "Column 'order_cust' (varchar) in model 'm_orders'."),
    ("column", "m_orders", "customer",
      "Column 'customer' (m_customer) in model 'm_orders'. Relationship: orders_customer."),
    ("column", "m_orders", "cust_segment",
      "Column 'cust_segment' (varchar) in model 'm_orders'. Calculated: \"customer\".\"c_mktsegment\"."),
    ("column", "m_orders", "cust_nation",
      "Column 'cust_nation' (varchar) in model 'm_orders'. Calculated: \"customer\".\"nation_name\"."),
    ("model", "m_lineitem", "m_lineitem",
      "Model 'm_lineitem'. Columns: l_orderkey (bigint), l_partkey (bigint), l_suppkey (bigint), l_linenumber (int), l_quantity (double), l_extendedprice (double), l_discount (double), l_returnflag (varchar), l_linestatus (varchar), l_shipdate (date), revenue (double), order_ (m_orders), order_status (varchar), cust_segment (varchar). Primary key: l_orderkey."),
    ("column", "m_lineitem", "l_orderkey",
      "Column 'l_orderkey' (bigint) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_partkey",
      "Column 'l_partkey' (bigint) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_suppkey",
      "Column 'l_suppkey' (bigint) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_linenumber",
      "Column 'l_linenumber' (int) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_quantity",
      "Column 'l_quantity' (double) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_extendedprice",
      "Column 'l_extendedprice' (double) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_discount",
      "Column 'l_discount' (double) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_returnflag",
      "Column 'l_returnflag' (varchar) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_linestatus",
      "Column 'l_linestatus' (varchar) in model 'm_lineitem'."),
    ("column", "m_lineitem", "l_shipdate",
      "Column 'l_shipdate' (date) in model 'm_lineitem'."),
    ("column", "m_lineitem", "revenue",
      "Column 'revenue' (double) in model 'm_lineitem'."),
    ("column", "m_lineitem", "order_",
      "Column 'order_' (m_orders) in model 'm_lineitem'. Relationship: lineitem_orders."),
    ("column", "m_lineitem", "order_status",
      "Column 'order_status' (varchar) in model 'm_lineitem'. Calculated: \"order_\".\"o_orderstatus\"."),
    ("column", "m_lineitem", "cust_segment",
      "Column 'cust_segment' (varchar) in model 'm_lineitem'. Calculated: \"order_\".\"customer\".\"c_mktsegment\"."),
    ("relationship", "m_nation", "nation_region",
      "Relationship 'nation_region': m_nation → m_region (MANY_TO_ONE). Condition: \"m_nation\".\"n_regionkey\" = \"m_region\".\"r_regionkey\"."),
    ("relationship", "m_customer", "customer_nation",
      "Relationship 'customer_nation': m_customer → m_nation (MANY_TO_ONE). Condition: \"m_customer\".\"c_nationkey\" = \"m_nation\".\"n_nationkey\"."),
    ("relationship", "m_orders", "orders_customer",
      "Relationship 'orders_customer': m_orders → m_customer (MANY_TO_ONE). Condition: \"m_orders\".\"o_custkey\" = \"m_customer\".\"c_custkey\"."),
    ("relationship", "m_lineitem", "lineitem_orders",
      "Relationship 'lineitem_orders': m_lineitem → m_orders (MANY_TO_ONE). Condition: \"m_lineitem\".\"l_orderkey\" = \"m_orders\".\"o_orderkey\"."),
    ("view", "", "v_big_orders",
      "View 'v_big_orders'. SQL: SELECT o_orderkey, o_custkey, o_totalprice FROM graft.amalgam.m_orders WHERE o_totalprice > 300000"))

  /** The manifest's 17 seed NL-SQL pairs, same pin protocol as
    * [[pinnedSchemaItems]]; tag is the literal the store assigns
    * (`SeedQueries.SeedTag`), pinned here as a string.
    */
  private[graft] val pinnedSeedPairs: Seq[(String, String)] = Seq(
    ("List all m_region",
      "SELECT * FROM m_region LIMIT 100"),
    ("List all m_nation",
      "SELECT * FROM m_nation LIMIT 100"),
    ("Total n_regionkey in m_nation",
      "SELECT SUM(n_regionkey) FROM m_nation"),
    ("n_regionkey by n_name in m_nation",
      "SELECT n_name, SUM(n_regionkey) FROM m_nation GROUP BY 1"),
    ("List all m_customer",
      "SELECT * FROM m_customer LIMIT 100"),
    ("Total c_nationkey in m_customer",
      "SELECT SUM(c_nationkey) FROM m_customer"),
    ("c_nationkey by c_name in m_customer",
      "SELECT c_name, SUM(c_nationkey) FROM m_customer GROUP BY 1"),
    ("List all m_orders",
      "SELECT * FROM m_orders LIMIT 100"),
    ("Total o_custkey in m_orders",
      "SELECT SUM(o_custkey) FROM m_orders"),
    ("o_custkey by o_orderstatus in m_orders",
      "SELECT o_orderstatus, SUM(o_custkey) FROM m_orders GROUP BY 1"),
    ("List all m_lineitem",
      "SELECT * FROM m_lineitem LIMIT 100"),
    ("Total l_partkey in m_lineitem",
      "SELECT SUM(l_partkey) FROM m_lineitem"),
    ("l_partkey by l_returnflag in m_lineitem",
      "SELECT l_returnflag, SUM(l_partkey) FROM m_lineitem GROUP BY 1"),
    ("m_nation with m_region details",
      "SELECT * FROM m_nation JOIN m_region ON \"m_nation\".\"n_regionkey\" = \"m_region\".\"r_regionkey\" LIMIT 100"),
    ("m_customer with m_nation details",
      "SELECT * FROM m_customer JOIN m_nation ON \"m_customer\".\"c_nationkey\" = \"m_nation\".\"n_nationkey\" LIMIT 100"),
    ("m_orders with m_customer details",
      "SELECT * FROM m_orders JOIN m_customer ON \"m_orders\".\"o_custkey\" = \"m_customer\".\"c_custkey\" LIMIT 100"),
    ("m_lineitem with m_orders details",
      "SELECT * FROM m_lineitem JOIN m_orders ON \"m_lineitem\".\"l_orderkey\" = \"m_orders\".\"o_orderkey\" LIMIT 100"))

  private[graft] val pinnedSeedTag = "source:seed"

  private def contextOracle: String = {
    rankingOracle(
      keyCols = Seq("item_type", "model_name", "item_name"),
      values = pinnedSchemaItems.map { case (t, m, n, text) =>
        Seq(sqlLit(t), sqlLit(m), sqlLit(n), sqlLit(text)) },
      query = contextQuery,
      tieBreak = Seq("item_type", "model_name", "item_name"),
      limit = 5, emitText = true)
  }

  private def recallOracle: String = {
    val pairs = pinnedSeedPairs.map { case (nl, sql) => (nl, sql, pinnedSeedTag) } :+
      (userPair._1, userPair._2, "")
    // seq is assignment order: seeds 0..n-1 in one batch, then the user pair;
    // the embedded text is the NL question (MemoryStore.appendQueries). The
    // cast matters: a bare VALUES integer is INT32 in DuckDB where the store's
    // seq column is int64 — the driver's typed compare demands exact width.
    val values = pairs.zipWithIndex.map { case ((nl, sql, tags), i) =>
      Seq(s"CAST($i AS BIGINT)", sqlLit(nl), sqlLit(sql), sqlLit(tags), sqlLit(nl))
    }
    rankingOracle(
      keyCols = Seq("seq", "nl_query", "sql_query", "tags"),
      values = values,
      query = recallQuery,
      tieBreak = Seq("seq"),
      limit = 5, emitText = false)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m29_memory_context" -> (memoryContext(_, _)),
    "m30_memory_recall" -> (memoryRecall(_, _)))

  def oracles: Map[String, String] = Map(
    "m29_memory_context" -> contextOracle,
    "m30_memory_recall" -> recallOracle)
}
