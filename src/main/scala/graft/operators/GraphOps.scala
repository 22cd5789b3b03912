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
