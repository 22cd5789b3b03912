package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** PageRank is verified against a THIRD, independent implementation: a
  * driver-local Map-based replay of the scaled-integer recurrence (the driver
  * gate's DuckDB oracle is the second). Seeded random graphs keep the check
  * honest for shapes no hand-example covers: cycles, dangling sinks, parallel
  * edges, self-loops, multi-component graphs.
  */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Reference recurrence: identical integer arithmetic, pure Scala Maps. */
  private def referencePageRank(
      edges: Seq[(Long, Long)], iterations: Int,
      scale: Long, dampingPct: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = nodes.size.toLong
    val base = scale * (100 - dampingPct) / 100
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges
        .map { case (u, v) => v -> rank(u) / outdeg(u) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val dangling = nodes.filterNot(outdeg.contains).map(rank).sum
      val share = if (n == 0) 0L else dangling / n
      rank = nodes.map(v =>
        v -> (base + (contrib.getOrElse(v, 0L) + share) * dampingPct / 100)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iterations: Int = 4,
      scale: Long = 1000000000L, dampingPct: Int = 85): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.pageRank(edges.toDF("src", "dst"), iterations, scale, dampingPct)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hand-checked two-node exchange: one iteration") {
    // 1 -> 2, 2 -> 1; no dangling. rank' = 0.15·S + 0.85·S for both.
    val got = run(Seq((1L, 2L), (2L, 1L)), iterations = 1, scale = 1000L)
    // base = 150, contrib = 1000/1 = 1000, share 0: 150 + 850 = 1000
    assert(got === Map(1L -> 1000L, 2L -> 1000L))
  }

  test("hand-checked star with dangling hub") {
    // 1->3, 2->3: hub 3 has no out-edges (dangling). One iteration, S=1000:
    // contrib(3) = 1000 + 1000; dangling mass = rank(3) = 1000, share = 333.
    // r(1) = r(2) = 150 + (0 + 333)*85/100 = 150 + 283 = 433
    // r(3)        = 150 + (2000 + 333)*85/100 = 150 + 1983 = 2133
    val got = run(Seq((1L, 3L), (2L, 3L)), iterations = 1, scale = 1000L)
    assert(got === Map(1L -> 433L, 2L -> 433L, 3L -> 2133L))
  }

  test("matches the reference recurrence on seeded random graphs") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val n = 5 + rnd.nextInt(20)
      val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val iters = 1 + rnd.nextInt(4)
      val want = referencePageRank(edges, iters, 1000000L, 85)
      val got = run(edges, iters, 1000000L, 85)
      assert(got === want, s"trial $trial, $n nodes, $iters iters")
    }
  }

  test("rank is invariant under node relabeling") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 4L), (5L, 2L))
    val shift = 1000L
    val a = run(edges)
    val b = run(edges.map { case (u, v) => (u + shift, v + shift) })
    assert(a.map { case (k, v) => (k + shift, v) } === b)
  }

  test("total mass is conserved up to floor losses") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 1L), (5L, 3L))
    val scale = 1000000000L
    val ranks = run(edges, iterations = 6, scale = scale)
    val total = ranks.values.sum
    val n = ranks.size
    // each of 6 iterations can floor-lose at most ~(edges + 2) units per node
    assert(total <= n * scale)
    assert(total >= n * scale - 6L * n * 100)
  }

  test("higher in-degree hub outranks leaves") {
    val edges = (1L to 9L).map(i => (i, 10L)) // everyone points at 10
    val ranks = run(edges)
    assert(ranks(10L) > ranks(1L) * 3)
  }

  /** Reference TrustRank recurrence, pure Scala Maps (see class doc). */
  private def referenceTrustRank(
      edges: Seq[(Long, Long)], seedIds: Set[Long], iterations: Int,
      scale: Long, dampingPct: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val seeds = nodes.filter(seedIds).toSet
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nS = seeds.size.toLong
    val base = scale * (100 - dampingPct) / 100
    var rank = nodes.map(v => v -> (if (seeds(v)) scale else 0L)).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges
        .map { case (u, v) => v -> rank(u) / outdeg(u) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      val dangling = nodes.filterNot(outdeg.contains).map(rank).sum
      val share = dangling / nS
      rank = nodes.map { v =>
        val s = if (seeds(v)) 1L else 0L
        v -> (base * s + (contrib.getOrElse(v, 0L) + s * share) * dampingPct / 100)
      }.toMap
    }
    rank
  }

  private def runTrust(edges: Seq[(Long, Long)], seeds: Seq[Long],
      iterations: Int = 4, scale: Long = 1000000000L,
      dampingPct: Int = 85): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.trustRank(edges.toDF("src", "dst"), seeds.toDF("id"),
        iterations, scale, dampingPct)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("trustRank: nodes unreachable from seeds score exactly 0") {
    // 1 -> 2 -> 3 is the trusted chain; 4 -> 5 is a disjoint (spam) island
    val got = runTrust(Seq((1L, 2L), (2L, 3L), (4L, 5L)), Seq(1L))
    assert(got(4L) === 0L && got(5L) === 0L)
    assert(got(1L) > 0L && got(2L) > 0L && got(3L) > 0L)
  }

  test("trustRank matches the reference recurrence on seeded random graphs") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 4) {
      val n = 6 + rnd.nextInt(15)
      val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val seeds = nodes.filter(_ % 3 == 0)
      if (seeds.nonEmpty) {
        val iters = 1 + rnd.nextInt(4)
        val want = referenceTrustRank(edges, seeds.toSet, iters, 1000000L, 85)
        val got = runTrust(edges, seeds, iters, 1000000L, 85)
        assert(got === want, s"trial $trial, $n nodes, $iters iters")
      }
    }
  }

  test("the reduction law: trustRank with every node seeded equals pageRank") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val n = 12
    val edges = Seq.fill(n * 3)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val pr = run(edges, iterations = 3, scale = 1000000L)
    val tr = GraphOps.trustRank(edges.toDF("src", "dst"), nodes.toDF("id"),
        iterations = 3, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr === tr)
  }

  test("trustRank: seeds absent from the graph are ignored; all-absent rejects") {
    // seed 99 is not a node — mass comes only from seed 1
    val a = runTrust(Seq((1L, 2L), (2L, 1L)), Seq(1L))
    val b = runTrust(Seq((1L, 2L), (2L, 1L)), Seq(1L, 99L))
    assert(a === b)
    intercept[IllegalArgumentException] {
      runTrust(Seq((1L, 2L)), Seq(99L))
    }
  }

  test("g3 gate entry: bucketed path is bit-identical to g1 on the live fixture") {
    // the driver's DuckDB oracle for g3 IS g1's recurrence — this pin is the
    // local falsifier: any divergence between the bucketed and plain edge
    // paths (bucket pruning, sort-order sensitivity, write truncation) shows
    // here before the gate sees it
    val dir = "/root/testdata/sf0.001"
    def rows(n: String) = graft.queries.GraphEr.queries(n)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows("g3_pagerank_bucketed") === rows("g1_pagerank"))
  }

  test("bucketEdges: identical ranks, and the edge side plans no exchange") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 1L), (1L, 4L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    val bucketed = GraphOps.bucketEdges(edges.toDF("src", "dst"), 4,
      table = "graft_spec_edges", path = Some(s"$tmp/edges"))
    try {
      // bit-identical ranks through the bucketed path
      val want = run(edges)
      val got = GraphOps.pageRank(bucketed, 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want)
      // the prescribed cluster shape: with broadcast off (the 100 TB regime),
      // the src-keyed join reads the bucketed scan's HashPartitioning and
      // plans NO exchange on the edge side — only rank rows move
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val rank = Seq((1L, 1L), (2L, 1L)).toDF("src", "rank")
        val plan = bucketed.join(rank, Seq("src"))
          .queryExecution.executedPlan.toString
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        assert(exchanges === 1,
          s"expected ONE exchange (the rank side only), got $exchanges:\n$plan")
        assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
          s"edge side lost its bucketed scan:\n$plan")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS `graft_spec_edges`")
      graft.util.Fs.deleteTree(tmp)
    }
  }

  test("reliable checkpoint mode produces identical ranks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_ckpt_").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 2L))
      val a = run(edges)
      val b = GraphOps.pageRank(edges.toDF("src", "dst"), reliable = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a === b)
    } finally graft.util.Fs.deleteTree(dir)
  }

  test("an overflow-capable scale is rejected up front") {
    // 5 nodes: the guard needs scale <= MaxValue/5/100 ≈ 1.8e16
    intercept[IllegalArgumentException] {
      run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L)),
        scale = Long.MaxValue / 100)
    }
  }

  test("duckDbPageRank text embeds the same constants") {
    val sql = GraphOps.duckDbPageRank("WITH e AS (SELECT 1 AS src, 2 AS dst)",
      iterations = 2, scale = 1000L, dampingPct = 85)
    assert(sql.contains("CAST(s * 1000 AS BIGINT)"))
    assert(sql.contains("150 * f.s")) // base = 1000*15/100, flagged form
    // the PageRank reduction: every node seeded
    assert(sql.contains("seeds AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)"))
    assert(sql.contains("r2"))
    assert(!sql.contains("r3"))
  }
}
