package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EntityResolution, GraphOps}

/** Link-graph centrality (g*) and fuzzy entity resolution (er*) entries —
  * corpus-curation operators in the CommonCrawl/CCNet tradition (rank sources
  * by graph standing; collapse same-entity records before training). Both
  * families are exactly oracle-checkable: PageRank runs in scaled 64-bit
  * integer arithmetic (order-independent sums, identical floor division in
  * both engines), and the ER verify is Levenshtein (integer, engine-portable).
  */
object GraphEr {

  private def events(s: SparkSession, dir: String): DataFrame = {
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true") catch { case _: Exception => }
    Relational.normalizeEventTs(s.read.parquet(s"$dir/events.parquet"))
  }
  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Interaction graph over events: within each (event_type, hour) activity
    * group, every participant links to the group's first user (min user_id) —
    * a deterministic star per group, giving hubs high in-degree and (since
    * hubs emit no edges of their own unless they participate elsewhere) a
    * non-empty dangling set, so the redistribution path is exercised. The
    * DuckDB side rebuilds the identical edge list.
    */
  private val duckEdges =
    """WITH b AS (
      |  SELECT user_id, event_type, date_trunc('hour', cast(ts as timestamp)) AS h
      |  FROM events
      |), hub AS (
      |  SELECT event_type, h, min(user_id) AS hub
      |  FROM b GROUP BY event_type, h
      |), e AS (
      |  SELECT DISTINCT b.user_id AS src, hub.hub AS dst
      |  FROM b JOIN hub ON b.event_type = hub.event_type AND b.h = hub.h
      |  WHERE b.user_id <> hub.hub
      |)""".stripMargin

  private def eventEdges(s: SparkSession, dir: String): DataFrame = {
    val b = events(s, dir).select(col("user_id"), col("event_type"),
      date_trunc("hour", expr("timestamp_micros(ts div 1000)")).alias("h"))
    val hub = b.groupBy("event_type", "h").agg(min("user_id").alias("hub"))
    b.join(hub, Seq("event_type", "h"))
      .filter(col("user_id") =!= col("hub"))
      .select(col("user_id").alias("src"), col("hub").alias("dst"))
      .distinct()
  }

  /** ER fixture: entity "names" are the first six normalized words of each
    * document (the corpus's planted near-dups share prefixes → natural
    * exact-name matches), plus planted TYPO records — every 20th doc re-enters
    * as id+500000 with its name's 4th character dropped (edit distance 1), the
    * d10 planted-copy pattern. Both engines build the identical record set.
    */
  /** `reliable = true` swaps the eager localCheckpoint snap (executor-local
    * blocks, lost on executor death) for checkpoint-dir-backed `checkpoint()`
    * — the rankLoop escape hatch (GraphOps.scala), r15 verdict nit #3. The
    * bench/gate entries keep the default: the snap is KBs and re-derivable;
    * a 100 TB deployment sets a checkpoint dir and passes true.
    */
  private[graft] def erRecords(
      s: SparkSession, dir: String, guardSplit: Boolean = false,
      reliable: Boolean = false): DataFrame = {
    if (reliable)
      require(s.sparkContext.getCheckpointDir.isDefined,
        "erRecords(reliable = true) needs spark.sparkContext.setCheckpointDir")
    // The er3 dirty/catalog SPLIT assumes base doc_id < 500000; a gate fixture
    // grown past that would silently misclassify rows IN BOTH ENGINES (so the
    // oracle could not catch it) — er3 passes guardSplit = true and the guard
    // raises loudly, inline in the name expression (distributed, no extra
    // scan). The other er queries take no split: for them a base id >= 500000
    // merely aliases a typo id, identically in both engines — and the scale
    // smoke's synthetic 10x corpora (ids to ~9M) rely on exactly that, so the
    // guard must NOT apply there.
    val base0 = docs(s, dir).select(col("doc_id").alias("id"),
      concat_ws(" ", slice(Dedup.wordsArray(col("text")), 1, 6)).alias("name"))
    val baseGuarded = if (!guardSplit) base0 else
      base0.withColumn("name", when(col("id") < 500000L, col("name"))
        .otherwise(raise_error(lit(
          "erRecords: doc_id >= 500000 breaks er3's dirty/catalog split — " +
            "raise the offset before growing the gate fixture"))))
    // Materialize the normalized names ONCE per query invocation: every er
    // entry fans `recs` into several consumers (blocking-key aggregate, the
    // capped block join's two sides, the canonical join-back, er3/er4's
    // splits), and without this snap each consumer re-ran the parquet scan +
    // lower/regexp/split normalization — measured 4–10 full document scans
    // per er query at sf0.1 (guide §1.2 step 1: don't compute things twice).
    // The snapped frame is (id, 6-word name) — KBs per 1k docs, batch-sized.
    val base = if (reliable) baseGuarded.checkpoint(true)
      else baseGuarded.localCheckpoint(true)
    val typos = base.filter(col("id") % 20 === 0 && length(col("name")) >= 8)
      .select((col("id") + 500000).alias("id"),
        concat(substring(col("name"), 1, 3), expr("substr(name, 5)")).alias("name"))
    base.filter(length(col("name")) > 0).union(typos)
  }

  private val duckErRecords =
    """WITH n AS MATERIALIZED (
      |  SELECT doc_id AS id,
      |    array_to_string((list_filter(string_split_regex(
      |      regexp_replace(lower(text), '[^a-z0-9一-鿿 ]', ' ', 'g'), '\s+'),
      |      x -> len(x) > 0))[1:6], ' ') AS name
      |  FROM documents
      |), recs AS MATERIALIZED (
      |  SELECT id, name FROM n WHERE len(name) > 0
      |  UNION ALL
      |  SELECT id + 500000 AS id, substr(name, 1, 3) || substr(name, 5) AS name
      |  FROM n WHERE id % 20 = 0 AND len(name) >= 8
      |)""".stripMargin

  /** DuckDB replica of [[EntityResolution.blockedFuzzyPairs]] over `recs`:
    * distinct (id, bigram-key) blocking (adjacent word pairs, single-token
    * names fall back to the token), block-size cap, pair-dedup BEFORE the
    * Levenshtein verify. Emits CTE `mp(id_a, id_b, name_a, name_b, dist)`.
    */
  private def duckFuzzyPairs(maxDist: Int, maxBlock: Int): String =
    s""", w AS (
       |  SELECT id, name, list_filter(string_split(name, ' '), x -> len(x) > 0) AS ws FROM recs
       |), t AS (
       |  SELECT DISTINCT id, name, ws[i] || ' ' || ws[i + 1] AS tok
       |  FROM w, unnest(range(1, len(ws))) AS r(i)
       |  WHERE len(ws) >= 2
       |  UNION
       |  SELECT id, name, ws[1] AS tok FROM w WHERE len(ws) = 1
       |), blk AS (
       |  SELECT tok FROM t GROUP BY tok HAVING count(*) <= $maxBlock
       |), cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
       |  FROM t a JOIN t b ON a.tok = b.tok AND a.id < b.id
       |  JOIN blk ON a.tok = blk.tok
       |), mp AS MATERIALIZED (
       |  SELECT id_a, id_b, name_a, name_b,
       |    CAST(levenshtein(name_a, name_b) AS INT) AS dist
       |  FROM cand WHERE levenshtein(name_a, name_b) <= $maxDist
       |)""".stripMargin

  /** Bigram-token CTEs over relation `src(id, name)`, emitted as `<p>w`/`<p>tk`
    * (the same shape [[duckFuzzyPairs]] builds inline). */
  private def duckToks(src: String, p: String): String =
    s"""${p}w AS (
       |  SELECT id, name, list_filter(string_split(name, ' '), x -> len(x) > 0) AS ws FROM $src
       |), ${p}tk AS MATERIALIZED (
       |  SELECT DISTINCT id, name, ws[i] || ' ' || ws[i + 1] AS tok
       |  FROM ${p}w, unnest(range(1, len(ws))) AS r(i) WHERE len(ws) >= 2
       |  UNION
       |  SELECT id, name, ws[1] AS tok FROM ${p}w WHERE len(ws) = 1
       |)""".stripMargin

  /** Self-match + recursive closure over `<p>tk` → `<p>comp(id, entity_id)`
    * (the er2 oracle shape, prefixed so several closures can coexist). */
  private def duckSelfComp(p: String, maxDist: Int, maxBlock: Int): String =
    s"""${p}blk AS (
       |  SELECT tok FROM ${p}tk GROUP BY tok HAVING count(*) <= $maxBlock
       |), ${p}pr AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b
       |  FROM ${p}tk a JOIN ${p}tk b ON a.tok = b.tok AND a.id < b.id
       |  JOIN ${p}blk ON a.tok = ${p}blk.tok
       |), ${p}m AS MATERIALIZED (
       |  SELECT id_a, id_b FROM ${p}pr WHERE levenshtein(name_a, name_b) <= $maxDist
       |), ${p}ed AS MATERIALIZED (
       |  SELECT id_a AS u, id_b AS v FROM ${p}m
       |  UNION ALL
       |  SELECT id_b AS u, id_a AS v FROM ${p}m
       |), ${p}reach(u, v) AS (
       |  SELECT u, v FROM ${p}ed
       |  UNION
       |  SELECT r.u, e2.v FROM ${p}reach r JOIN ${p}ed e2 ON r.v = e2.u
       |), ${p}comp AS MATERIALIZED (
       |  SELECT u AS id, least(u, min(v)) AS entity_id FROM ${p}reach GROUP BY u
       |)""".stripMargin

  val defs: Seq[(String, ((SparkSession, String) => DataFrame, Option[String]))] = Seq(

    // Integer-scaled PageRank on the event interaction graph: 4 power
    // iterations, damping 0.85, dangling mass redistributed evenly. The oracle
    // unrolls the identical recurrence as chained CTEs (GraphOps.duckDbPageRank
    // is generated from the SAME (scale, damping) constants, so the two texts
    // cannot drift apart silently); every sum is of BIGINTs — order-independent
    // — and every division is floor division, so the ranks hash-match exactly.
    "g1_pagerank" -> (((s: SparkSession, dir: String) => {
      GraphOps.pageRank(eventEdges(s, dir), iterations = 4, scale = 1000000000L)
        .select(col("id").alias("user_id"), col("rank"))
        .orderBy("user_id")
    },
      Some(s"""${GraphOps.duckDbPageRank(duckEdges, iterations = 4, scale = 1000000000L)}
              |SELECT id AS user_id, rank FROM r4 ORDER BY user_id""".stripMargin))),

    // g1 through the BUCKETED edge path (round-15 #7): the cluster shape the
    // rankLoop scaladoc prescribes — edges persisted as a parquet table
    // bucketed by src, so the per-iteration rank⋈edges join plans no exchange
    // on the edge side (measured −84% iteration shuffle at 10×; plan pinned
    // single-exchange in GraphOpsSpec AND GraphErSpec's g3 pin). Ranks must be
    // bit-identical to g1's, so the oracle IS g1's recurrence — the gate now
    // falsifies the bucketed path end-to-end, not just its plan shape.
    "g3_pagerank_bucketed" -> (((s: SparkSession, dir: String) => {
      val bucketed = GraphOps.bucketEdges(eventEdges(s, dir), buckets = 32,
        table = "graft_g3_edges",
        path = Some(s"${System.getProperty("java.io.tmpdir")}/graft_g3_edges"))
      GraphOps.pageRank(bucketed, iterations = 4, scale = 1000000000L)
        .select(col("id").alias("user_id"), col("rank"))
        .orderBy("user_id")
    },
      Some(s"""${GraphOps.duckDbPageRank(duckEdges, iterations = 4, scale = 1000000000L)}
              |SELECT id AS user_id, rank FROM r4 ORDER BY user_id""".stripMargin))),

    // TrustRank (Gyöngyi et al. 2004): the teleport vector concentrated on a
    // seed whitelist (every 17th user id), so trust flows OUT of the seeds and
    // spam-like neighborhoods unreachable from them score 0 — the seed-based
    // source-quality method crawl curation actually uses. Same integer-exact
    // contract as g1; the oracle recurrence is generated from the same
    // constants, with seeds intersected against the node set in both engines.
    "g2_trustrank" -> (((s: SparkSession, dir: String) => {
      val seeds = events(s, dir).select(col("user_id").alias("id"))
        .filter(col("id") % 17 === 0).distinct()
      GraphOps.trustRank(eventEdges(s, dir), seeds, iterations = 4,
          scale = 1000000000L)
        .select(col("id").alias("user_id"), col("rank"))
        .orderBy("user_id")
    },
      Some(s"""${GraphOps.duckDbTrustRank(duckEdges,
                 "seeds AS (SELECT DISTINCT user_id AS id FROM events WHERE user_id % 17 = 0)",
                 iterations = 4, scale = 1000000000L)}
              |SELECT id AS user_id, rank FROM r4 ORDER BY user_id""".stripMargin))),

    // Blocked fuzzy entity resolution: adjacent-bigram blocking (blocks stay
    // duplication-rate-sized under a fixed vocabulary — the scale-sane key;
    // see EntityResolution scaladoc), skew-guard block cap, Levenshtein<=2
    // verify on block-deduped candidates. Matches = the corpus's planted
    // near-dup prefix twins (distance 0) plus the planted typo records
    // (distance 1, ≥3 intact bigrams in a 6-word name) — both distance
    // classes exercised.
    "er1_fuzzy_pairs" -> (((s: SparkSession, dir: String) => {
      EntityResolution.blockedFuzzyPairs(erRecords(s, dir), "name", "id",
          maxDist = 2, maxBlock = 500)
        .orderBy("id_a", "id_b")
    },
      Some(s"""$duckErRecords${duckFuzzyPairs(maxDist = 2, maxBlock = 500)}
              |SELECT id_a, id_b, name_a, name_b, dist FROM mp
              |ORDER BY id_a, id_b""".stripMargin))),

    // Two-table linkage (dirty records → canonical catalog): the planted typo
    // records (id ≥ 500000) are the incoming dirty side, the base corpus is
    // the catalog; blocking keys are capped by COMBINED side frequency. Every
    // typo links to its source (distance 1) and to the source's exact twins.
    "er3_fuzzy_link" -> (((s: SparkSession, dir: String) => {
      val recs = erRecords(s, dir, guardSplit = true)
      EntityResolution.blockedFuzzyJoin(
          recs.filter(col("id") >= 500000), recs.filter(col("id") < 500000),
          "name", "id", maxDist = 2, maxBlock = 500)
        .orderBy("left_id", "right_id")
    },
      Some(s"""$duckErRecords, dirty AS (
              |  SELECT id, name FROM recs WHERE id >= 500000
              |), catal AS (
              |  SELECT id, name FROM recs WHERE id < 500000
              |), ${duckToks("dirty", "l")}, ${duckToks("catal", "r")}, blk AS (
              |  SELECT tok FROM (
              |    SELECT tok FROM ltk UNION ALL SELECT tok FROM rtk
              |  ) GROUP BY tok HAVING count(*) <= 500
              |), cand AS (
              |  SELECT DISTINCT a.id AS left_id, b.id AS right_id,
              |    a.name AS left_name, b.name AS right_name
              |  FROM ltk a JOIN blk ON a.tok = blk.tok JOIN rtk b ON a.tok = b.tok
              |), mj AS (
              |  SELECT left_id, right_id, left_name, right_name,
              |    CAST(levenshtein(left_name, right_name) AS INT) AS dist
              |  FROM cand WHERE levenshtein(left_name, right_name) <= 2
              |)
              |SELECT left_id, right_id, left_name, right_name, dist FROM mj
              |ORDER BY left_id, right_id""".stripMargin))),

    // Incremental (online) ER replayed as two explicit waves, the d11 pattern:
    // evens arrive first and canonicalize into the catalog; odds then link to
    // the catalog (best match = min distance, ties to min catalog id) or — if
    // unmatched — resolve among themselves and mint new entities. The oracle
    // replays the whole two-wave rule relationally: two recursive closures
    // (evens, unmatched odds) + the windowed best-match join between them.
    "er4_incremental_link" -> (((s: SparkSession, dir: String) => {
      val recs = erRecords(s, dir)
      val evens = recs.filter(col("id") % 2 === 0)
      val odds = recs.filter(col("id") % 2 =!= 0)
      // in the foreachBatch production shape the catalog is a materialized
      // table; localCheckpoint stands in for that (the incrementalLink-internal
      // hygiene) so the wave-1 CC pipeline isn't re-executed per consumer
      // subtree of the linkage join — and unlike a persist() the checkpointed
      // RDD is reclaimed by the ContextCleaner once unreferenced, so repeated
      // bench/driver invocations don't accumulate cached blocks across runs
      val catalog = EntityResolution.canonicalEntities(evens, "name", "id",
          maxDist = 2, maxBlock = 500)
        .filter(col("id") === col("entity_id"))
        .select(col("id"), col("name"))
        .localCheckpoint()
      val (assigned, _) = EntityResolution.incrementalLink(odds, catalog,
        "name", "id", maxDist = 2, maxBlock = 500)
      assigned.orderBy("id")
    },
      Some(s"""${duckErRecords.replaceFirst("WITH", "WITH RECURSIVE")}, ev AS MATERIALIZED (
              |  SELECT id, name FROM recs WHERE id % 2 = 0
              |), od AS MATERIALIZED (
              |  SELECT id, name FROM recs WHERE id % 2 <> 0
              |), ${duckToks("ev", "e")}, ${duckSelfComp("e", 2, 500)}, cat AS MATERIALIZED (
              |  SELECT ev.id, ev.name FROM ev LEFT JOIN ecomp ON ev.id = ecomp.id
              |  WHERE coalesce(ecomp.entity_id, ev.id) = ev.id
              |), ${duckToks("od", "o")}, ${duckToks("cat", "c")}, lblk AS (
              |  SELECT tok FROM (
              |    SELECT tok FROM otk UNION ALL SELECT tok FROM ctk
              |  ) GROUP BY tok HAVING count(*) <= 500
              |), lc AS (
              |  SELECT DISTINCT a.id AS left_id, b.id AS right_id,
              |    a.name AS ln, b.name AS rn
              |  FROM otk a JOIN lblk ON a.tok = lblk.tok JOIN ctk b ON a.tok = b.tok
              |), lv AS (
              |  SELECT left_id, right_id, levenshtein(ln, rn) AS dist
              |  FROM lc WHERE levenshtein(ln, rn) <= 2
              |), lm AS MATERIALIZED (
              |  SELECT left_id, right_id AS entity_id FROM (
              |    SELECT left_id, right_id,
              |      row_number() OVER (PARTITION BY left_id ORDER BY dist, right_id) AS rn
              |    FROM lv
              |  ) WHERE rn = 1
              |), un AS MATERIALIZED (
              |  SELECT od.id, od.name FROM od
              |  WHERE NOT EXISTS (SELECT 1 FROM lm WHERE lm.left_id = od.id)
              |), ${duckToks("un", "u")}, ${duckSelfComp("u", 2, 500)}
              |SELECT id, entity_id FROM (
              |  SELECT left_id AS id, entity_id FROM lm
              |  UNION ALL
              |  SELECT un.id, coalesce(ucomp.entity_id, un.id) AS entity_id
              |  FROM un LEFT JOIN ucomp ON un.id = ucomp.id
              |)
              |ORDER BY id""".stripMargin))),

    // Canonical entity ids: match pairs → connected components (transitive
    // closure: A~B, B~C ⇒ one entity even though (A,C) never verified) →
    // every record labeled with its component minimum; singletons keep
    // themselves. The oracle closes the same pair set with a recursive CTE
    // (the d9 pattern).
    "er2_entity_canonical" -> (((s: SparkSession, dir: String) => {
      EntityResolution.canonicalEntities(erRecords(s, dir), "name", "id",
          maxDist = 2, maxBlock = 500)
        .select(col("id"), col("entity_id"))
        .orderBy("id")
    },
      Some(s"""${duckErRecords.replaceFirst("WITH", "WITH RECURSIVE")}${duckFuzzyPairs(maxDist = 2, maxBlock = 500)}, ed AS (
              |  SELECT id_a AS u, id_b AS v FROM mp
              |  UNION ALL
              |  SELECT id_b AS u, id_a AS v FROM mp
              |), reach(u, v) AS (
              |  SELECT u, v FROM ed
              |  UNION
              |  SELECT r.u, e2.v FROM reach r JOIN ed e2 ON r.v = e2.u
              |), comp AS (
              |  SELECT u AS id, least(u, min(v)) AS entity_id FROM reach GROUP BY u
              |)
              |SELECT recs.id, coalesce(comp.entity_id, recs.id) AS entity_id
              |FROM recs LEFT JOIN comp ON recs.id = comp.id
              |ORDER BY recs.id""".stripMargin)))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, (fn, _)) => n -> fn }.toMap
  def oracles: Map[String, String] =
    defs.flatMap { case (n, (_, o)) => o.map(n -> _) }.toMap
}
