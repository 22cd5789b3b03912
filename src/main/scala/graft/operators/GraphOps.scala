package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation.
  *
  * Web-scale training corpora weight documents by the standing of their source
  * in the hyperlink graph (CommonCrawl publishes harmonic centrality / PageRank
  * ranks for exactly this; CCNet and RefinedWeb filter on them). The reference
  * engine has no graph surface — these are repo extras in the same family as
  * the dedup/curation operators, built for the 100 TB shape: per-iteration work
  * is one edge-side join + one map-side-combined aggregate, state per node is a
  * single 16-byte row, and no step ever materializes a neighbor list.
  *
  * All rank arithmetic is SCALED 64-BIT INTEGER (floor division), not floating
  * point: sums of longs are order-independent, so the result is bit-identical
  * across engines, partitionings, and retry schedules — the same determinism
  * contract the BM25/DSIR scorers follow (COVERAGE.md "cross-engine float
  * determinism"). A DuckDB oracle replays the identical recurrence.
  */
object GraphOps {

  /** PageRank over a directed edge list.
    *
    * @param edges     DataFrame with `src` and `dst` columns (any orderable,
    *                  hashable type; self-loops allowed; duplicate edges count
    *                  as parallel edges).
    * @param iterations fixed iteration count (power iteration; 100 TB graphs
    *                  converge to stable top-rank order in 5–20 rounds).
    * @param scale     initial per-node rank in scaled-integer units. Choose so
    *                  `nNodes * scale * dampingPct` stays well under 2^63: the
    *                  hottest possible hub absorbs at most the graph's total
    *                  mass (`nNodes * scale`), which the update multiplies by
    *                  `dampingPct` before dividing. 1e9 nodes × 1e6 scale ×
    *                  100 = 1e17 < 9.2e18.
    * @param dampingPct damping factor in percent (85 = the canonical 0.85).
    *
    * Returns one row per node: (`id`, `rank`) with `rank` in scaled units
    * (initial mass = `scale`; ranks of all nodes sum to ≈ nNodes·scale, minus
    * deterministic floor losses).
    *
    * Recurrence (all `div` = integer floor division, every engine identical):
    * {{{
    *   contrib(v) = Σ_{(u,v) ∈ E} rank(u) div outdeg(u)
    *   share      = (Σ_{outdeg(u)=0} rank(u)) div nNodes        // dangling mass
    *   rank'(v)   = scale·(100−d) div 100 + ((contrib(v)+share)·d) div 100
    * }}}
    *
    * Scale design: `edges` is persisted once and re-scanned per iteration (on a
    * cluster, prefer a pre-bucketed/bucketed-by-`src` table so the per-iteration
    * rank⋈edges join shuffles only the rank rows — N×16 bytes, never the edge
    * list). The contrib aggregate is a partial/final hash aggregate (map-side
    * combine), the dangling mass is a single-row aggregate collected at
    * metadata scale, and each iteration is `localCheckpoint`ed so the plan
    * doesn't nest (same hygiene as [[Curation.connectedComponents]]).
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 4,
      scale: Long = 1000000000L,
      dampingPct: Int = 85,
      reliable: Boolean = false): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct must be in [0,100]")
    if (reliable)
      require(edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "pageRank(reliable = true) needs spark.sparkContext.setCheckpointDir")
    // reliable = true swaps localCheckpoint (executor-local, lost on executor
    // death) for checkpoint-dir-backed checkpoint() — the right setting when a
    // 100 TB run's iteration chain is hours long (same switch as
    // [[Curation.connectedComponents]]).
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").alias("id"))
      .union(e.select(col("dst").alias("id")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src").alias("id"))
      .agg(count(lit(1)).alias("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNodes = nodes.count()
    // worst case: the whole graph's mass (nNodes·scale) concentrates in one
    // node's contrib sum, which the update multiplies by dampingPct (< 100)
    require(nNodes == 0 || scale <= Long.MaxValue / math.max(1L, nNodes) / 100,
      s"scale $scale overflows 64-bit rank arithmetic at $nNodes nodes " +
        s"(need scale <= ${Long.MaxValue / math.max(1L, nNodes) / 100})")
    val base = scale * (100 - dampingPct) / 100

    var rank = snap(nodes.select(col("id"), lit(scale).alias("rank")))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(rank.withColumnRenamed("id", "src"), Seq("src"))
        .join(deg.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").alias("id"), expr("rank div outdeg").alias("c"))
        .groupBy("id")
        .agg(sum("c").alias("contrib"))
      // dangling nodes (no out-edges) leak their mass; redistribute it evenly.
      // One scalar per iteration — a bounded, metadata-scale collect.
      val dangling = rank.join(deg, Seq("id"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0L)).alias("m"))
        .collect()(0).getLong(0)
      val share = if (nNodes == 0) 0L else dangling / nNodes
      rank = snap(nodes
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr(s"${base}L + ((coalesce(contrib, 0L) + ${share}L) * $dampingPct) div 100")
            .alias("rank")))
    }
    e.unpersist(); nodes.unpersist(); deg.unpersist()
    rank
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004): PageRank with
    * the teleport vector concentrated on a vetted SEED set — trust flows out
    * of known-good sources, so unreachable link-spam neighborhoods score 0.
    * The standing corpus-curation use: rank crawl sources by propagated trust
    * from a hand-audited whitelist, then weight or gate documents by source
    * trust.
    *
    * Same scaled-integer contract as [[pageRank]] (bit-reproducible across
    * engines). Recurrence differences:
    *   - rank₀ = `scale` for seeds, 0 elsewhere (total mass = nSeeds·scale)
    *   - the (1−d) base term and the dangling mass both teleport to SEEDS
    *     only: rank′(v) = s(v)·base + (contrib(v) + s(v)·share)·d div 100,
    *     with share = danglingMass div nSeeds and s(v) ∈ {0,1}.
    *
    * @param seeds one column of node ids; ids absent from the graph are
    *              ignored (intersected with the node set — the oracle must do
    *              the same).
    */
  def trustRank(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int = 4,
      scale: Long = 1000000000L,
      dampingPct: Int = 85,
      reliable: Boolean = false): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct must be in [0,100]")
    if (reliable)
      require(edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "trustRank(reliable = true) needs spark.sparkContext.setCheckpointDir")
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
    val e = edges.select(col("src"), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").alias("id"))
      .union(e.select(col("dst").alias("id")))
      .distinct()
    val deg = e.groupBy(col("src").alias("id"))
      .agg(count(lit(1)).alias("outdeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // node set with a 0/1 seed flag; the flag column rides every iteration
    val flagged = nodes
      .join(seeds.columns.headOption.map(c => seeds.select(col(c).alias("id")))
        .getOrElse(seeds).distinct().withColumn("sflag", lit(1)),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("sflag"), lit(0)).alias("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSeeds = flagged.filter(col("s") === 1).count()
    require(nSeeds > 0, "trustRank needs at least one seed present in the graph")
    // total mass = nSeeds·scale; same concentration worst case as pageRank
    require(scale <= Long.MaxValue / nSeeds / 100,
      s"scale $scale overflows 64-bit rank arithmetic at $nSeeds seeds " +
        s"(need scale <= ${Long.MaxValue / nSeeds / 100})")
    val base = scale * (100 - dampingPct) / 100

    var rank = snap(flagged.select(col("id"), col("s"),
      (col("s") * scale).cast("long").alias("rank")))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(rank.select(col("id").alias("src"), col("rank")), Seq("src"))
        .join(deg.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").alias("id"), expr("rank div outdeg").alias("c"))
        .groupBy("id")
        .agg(sum("c").alias("contrib"))
      val dangling = rank.join(deg, Seq("id"), "left_anti")
        .agg(coalesce(sum("rank"), lit(0L)).alias("m"))
        .collect()(0).getLong(0)
      val share = dangling / nSeeds
      rank = snap(flagged
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("s"),
          expr(s"${base}L * s + ((coalesce(contrib, 0L) + s * ${share}L) * $dampingPct) div 100")
            .alias("rank")))
    }
    e.unpersist(); deg.unpersist(); flagged.unpersist()
    rank.select(col("id"), col("rank"))
  }

  /** The DuckDB replay of [[trustRank]]: `edgeCte` must define `e(src, dst)`
    * and `seedCte` must be a CTE BODY (appended into the WITH list) defining
    * `seeds(id)`; the caller appends a final SELECT over `r<iterations>`.
    */
  def duckDbTrustRank(
      edgeCte: String,
      seedCte: String,
      iterations: Int = 4,
      scale: Long = 1000000000L,
      dampingPct: Int = 85): String = {
    val base = scale * (100 - dampingPct) / 100
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS id, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS contrib
         |  FROM e JOIN r${k - 1} r ON e.src = r.id JOIN deg d ON e.src = d.id
         |  GROUP BY e.dst
         |), dg$k AS (
         |  SELECT CAST(coalesce(sum(r.rank), 0) AS BIGINT) // (SELECT n FROM ns) AS share
         |  FROM r${k - 1} r LEFT JOIN deg d ON r.id = d.id WHERE d.id IS NULL
         |), r$k AS (
         |  SELECT f.id, CAST($base * f.s + ((coalesce(c.contrib, 0) + f.s * (SELECT share FROM dg$k)) * $dampingPct) // 100 AS BIGINT) AS rank
         |  FROM flagged f LEFT JOIN c$k c ON f.id = c.id
         |)""".stripMargin
    }.mkString(", ")
    s"""$edgeCte, $seedCte, nodes AS (
       |  SELECT src AS id FROM e UNION SELECT dst AS id FROM e
       |), deg AS (
       |  SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src
       |), flagged AS (
       |  SELECT n.id, CASE WHEN sd.id IS NULL THEN 0 ELSE 1 END AS s
       |  FROM nodes n LEFT JOIN (SELECT DISTINCT id FROM seeds) sd ON n.id = sd.id
       |), ns AS (
       |  SELECT count(*) AS n FROM flagged WHERE s = 1
       |), r0 AS (
       |  SELECT id, CAST(s * $scale AS BIGINT) AS rank FROM flagged
       |), $iters""".stripMargin
  }

  /** The DuckDB replay of [[pageRank]]'s recurrence, as a WITH-clause body that
    * unrolls the fixed iteration count (no recursion — each round is the same
    * three CTEs). `edgeCte` must define a CTE named `e(src, dst)`; the caller
    * appends a final SELECT over `r<iterations>`.
    *
    * Kept beside the operator so the arithmetic can never drift from the Spark
    * recurrence silently: both are generated from the same (scale, dampingPct)
    * parameters, and GraphOpsSpec replays a third, Map-based implementation
    * against the operator.
    */
  def duckDbPageRank(
      edgeCte: String,
      iterations: Int = 4,
      scale: Long = 1000000000L,
      dampingPct: Int = 85): String = {
    val base = scale * (100 - dampingPct) / 100
    val iters = (1 to iterations).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS id, CAST(sum(r.rank // d.outdeg) AS BIGINT) AS contrib
         |  FROM e JOIN r${k - 1} r ON e.src = r.id JOIN deg d ON e.src = d.id
         |  GROUP BY e.dst
         |), dg$k AS (
         |  SELECT CAST(coalesce(sum(r.rank), 0) AS BIGINT) // (SELECT n FROM nn) AS share
         |  FROM r${k - 1} r LEFT JOIN deg d ON r.id = d.id WHERE d.id IS NULL
         |), r$k AS (
         |  SELECT n.id, CAST($base + ((coalesce(c.contrib, 0) + (SELECT share FROM dg$k)) * $dampingPct) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN c$k c ON n.id = c.id
         |)""".stripMargin
    }.mkString(", ")
    s"""$edgeCte, nodes AS (
       |  SELECT src AS id FROM e UNION SELECT dst AS id FROM e
       |), deg AS (
       |  SELECT src AS id, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY src
       |), nn AS (
       |  SELECT count(*) AS n FROM nodes
       |), r0 AS (
       |  SELECT id, CAST($scale AS BIGINT) AS rank FROM nodes
       |), $iters""".stripMargin
  }
}
