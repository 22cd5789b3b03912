package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.memory.{HashedEmbedding, MemoryStore, SchemaIndexer, SeedQueries}

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
    store.indexSchema(Semantic.manifest, seedQueries = true)
    store.storeQuery(userPair._1, userPair._2)
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

  private def contextOracle: String = {
    val items = SchemaIndexer.extractSchemaItems(Semantic.manifest)
    rankingOracle(
      keyCols = Seq("item_type", "model_name", "item_name"),
      values = items.map(i => Seq(
        sqlLit(i.itemType), sqlLit(i.modelName), sqlLit(i.itemName), sqlLit(i.text))),
      query = contextQuery,
      tieBreak = Seq("item_type", "model_name", "item_name"),
      limit = 5, emitText = true)
  }

  private def recallOracle: String = {
    val seeds = SeedQueries.generateSeedQueries(Semantic.manifest)
    val pairs = seeds.map(p => (p.nl, p.sql, SeedQueries.SeedTag)) :+
      (userPair._1, userPair._2, "")
    // seq is assignment order: seeds 0..n-1 in one batch, then the user pair;
    // the embedded text is the NL question (MemoryStore.appendQueries)
    val values = pairs.zipWithIndex.map { case ((nl, sql, tags), i) =>
      Seq(i.toString, sqlLit(nl), sqlLit(sql), sqlLit(tags), sqlLit(nl))
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
