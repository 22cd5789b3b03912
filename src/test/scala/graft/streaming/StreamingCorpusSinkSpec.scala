package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StreamingCorpusSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  final case class Doc(doc_id: Long, text: String)

  private def doc(i: Int) = Doc(i.toLong, (s"tok$i " * (5 + i % 11)).trim)

  test("shard sink packs each batch into new shards continuing per-bucket numbering") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Files.createTempDirectory("streamshards").toString
    val (dataDir, manifestDir, ckpt) =
      (s"$base/data", s"$base/manifest", s"$base/ckpt")

    val src = MemoryStream[Doc]
    val q = StreamingCorpusSink.shardSinkStream(
      src.toDF(), dataDir, manifestDir, ckpt,
      budget = 48, buckets = 4)
    src.addData((1 to 40).map(doc): _*)
    q.processAllAvailable()
    src.addData((41 to 70).map(doc): _*)
    q.processAllAvailable()
    q.stop()

    // every doc landed exactly once
    val back = spark.read.parquet(dataDir)
    assert(back.count() == 70)
    assert(back.select("doc_id").distinct().count() == 70)

    val manifest = spark.read.parquet(manifestDir)
    // manifest accounts for the same shards the data layout holds
    val diskShards = back.select("bucket", "pack_ix").distinct().count()
    assert(manifest.select("bucket", "pack_ix").distinct().count() == diskShards)
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == 70)

    // batch 2's packs continue after batch 1's per bucket — no shard is reopened
    val perBatch = manifest.groupBy("bucket").pivot("batch_id", Seq(0, 1))
      .agg(min("pack_ix").alias("lo"), max("pack_ix").alias("hi"))
    perBatch.collect().foreach { r =>
      val (hi0, lo1) = (r.getAs[Any]("0_hi"), r.getAs[Any]("1_lo"))
      if (hi0 != null && lo1 != null)
        assert(lo1.asInstanceOf[Long] == hi0.asInstanceOf[Long] + 1,
          s"bucket ${r.get(0)}: batch-1 packs must start right after batch-0's")
    }

    // budget holds: no shard exceeds budget + one-doc spill
    val maxDoc = back.agg(max("n_tokens")).head.getLong(0)
    manifest.collect().foreach { r =>
      assert(r.getAs[Long]("n_tokens") <= 48 + maxDoc)
    }

    // compaction (run with the stream stopped) collapses the per-batch files into
    // one while preserving every manifest row
    val before = manifest.orderBy("bucket", "pack_ix").collect().toSeq
    val kept = graft.sinks.CorpusSink.compactManifest(spark, manifestDir)
    assert(kept == before.size.toLong)
    val files = new java.io.File(manifestDir)
      .listFiles((_: java.io.File, n: String) => n.endsWith(".parquet"))
    assert(files.length == 1, s"expected one compacted file, got ${files.length}")
    val after = spark.read.parquet(manifestDir)
      .orderBy("bucket", "pack_ix").collect().toSeq
    assert(after.map(_.toString).sorted == before.map(_.toString).sorted)
  }

  test("shard sink replays a crashed batch exactly once (no duplicate data or manifest)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Files.createTempDirectory("streamretry").toString
    val (dataDir, manifestDir, ckpt) = (s"$base/data", s"$base/manifest", s"$base/ckpt")

    val src = MemoryStream[Doc]
    val q1 = StreamingCorpusSink.shardSinkStream(
      src.toDF(), dataDir, manifestDir, ckpt, budget = 48, buckets = 4)
    src.addData((1 to 40).map(doc): _*)
    q1.processAllAvailable()
    q1.stop()
    val committed = spark.read.parquet(dataDir).count()
    assert(committed == 40)

    // Simulate a crash AFTER the batch's writes but BEFORE the checkpoint
    // commit: delete the commit marker so a restart replays batch 0 against
    // output that already exists — the at-least-once trap this sink closes.
    val commit0 = new java.io.File(s"$ckpt/commits/0")
    assert(commit0.exists, "test setup: commit marker for batch 0 must exist")
    assert(commit0.delete())
    new java.io.File(s"$ckpt/commits/.0.crc").delete() // local-FS checksum sidecar

    val q2 = StreamingCorpusSink.shardSinkStream(
      src.toDF(), dataDir, manifestDir, ckpt, budget = 48, buckets = 4)
    q2.processAllAvailable() // replays batch 0
    src.addData((41 to 70).map(doc): _*)
    q2.processAllAvailable() // batch 1 continues numbering
    q2.stop()

    val back = spark.read.parquet(dataDir)
    assert(back.count() == 70, "replay must not duplicate data rows")
    assert(back.select("doc_id").distinct().count() == 70)
    val manifest = spark.read.parquet(manifestDir)
    assert(manifest.count() == manifest.distinct().count(),
      "replay must not duplicate manifest rows")
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == 70)
    // manifest still accounts exactly for the shards on disk
    val diskShards = back.select("bucket", "pack_ix").distinct().count()
    assert(manifest.select("bucket", "pack_ix").distinct().count() == diskShards)
    assert(manifest.count() == diskShards)
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(base))
  }

  test("a FRESH checkpoint continuing an existing corpus never purges committed data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Files.createTempDirectory("streamtakeover").toString
    val (dataDir, manifestDir) = (s"$base/data", s"$base/manifest")

    // Incarnation 1: 40 docs, checkpoint A, clean stop.
    val src1 = MemoryStream[Doc]
    val q1 = StreamingCorpusSink.shardSinkStream(
      src1.toDF(), dataDir, manifestDir, s"$base/ckptA", budget = 48, buckets = 4)
    src1.addData((1 to 40).map(doc): _*)
    q1.processAllAvailable()
    q1.stop()

    // Incarnation 2: NEW MemoryStream + NEW checkpoint over the same dirs —
    // its batch ids restart at 0, the exact scenario where an unscoped
    // "batch_id >= 0" purge rule would delete the whole committed corpus.
    val src2 = MemoryStream[Doc]
    val q2 = StreamingCorpusSink.shardSinkStream(
      src2.toDF(), dataDir, manifestDir, s"$base/ckptB", budget = 48, buckets = 4)
    src2.addData((41 to 70).map(doc): _*)
    q2.processAllAvailable()
    q2.stop()

    val back = spark.read.parquet(dataDir)
    assert(back.count() == 70, "takeover must preserve incarnation 1's data")
    assert(back.select("doc_id").distinct().count() == 70)
    val manifest = spark.read.parquet(manifestDir)
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == 70)
    // pack numbering continues across incarnations per bucket (no overlap)
    val dupPacks = manifest.groupBy("bucket", "pack_ix").count()
      .filter(col("count") > 1).count()
    assert(dupPacks == 0, "incarnation 2 must continue, not reuse, pack numbers")
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(base))
  }

  test("property: shard sink output is exact under crashes injected after random batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rnd = new scala.util.Random(42) // seeded: failures reproduce exactly
    val base = Files.createTempDirectory("streamcrashlaw").toString
    val (dataDir, manifestDir, ckpt) = (s"$base/data", s"$base/manifest", s"$base/ckpt")
    val src = MemoryStream[Doc]
    var q = StreamingCorpusSink.shardSinkStream(
      src.toDF(), dataDir, manifestDir, ckpt, budget = 48, buckets = 4)
    var crashes = 0
    val batches = Seq(1 to 15, 16 to 33, 34 to 40, 41 to 62, 63 to 75)
    for ((ids, k) <- batches.zipWithIndex) {
      src.addData(ids.map(doc): _*)
      q.processAllAvailable()
      if (rnd.nextBoolean()) {
        // crash: the batch's writes landed but its checkpoint commit did not
        q.stop()
        assert(new java.io.File(s"$ckpt/commits/$k").delete())
        new java.io.File(s"$ckpt/commits/.$k.crc").delete()
        crashes += 1
        q = StreamingCorpusSink.shardSinkStream(
          src.toDF(), dataDir, manifestDir, ckpt, budget = 48, buckets = 4)
        q.processAllAvailable() // replay batch k
      }
    }
    q.stop()
    assert(crashes > 0, "seed must inject at least one crash for the law to bite")

    val n = batches.map(_.size).sum
    val back = spark.read.parquet(dataDir)
    assert(back.count() == n, s"expected $n rows after $crashes crash-replays")
    assert(back.select("doc_id").distinct().count() == n)
    val manifest = spark.read.parquet(manifestDir)
    assert(manifest.count() == manifest.select("bucket", "pack_ix").distinct().count(),
      "manifest must hold exactly one row per shard")
    assert(manifest.agg(sum("n_docs")).head.getLong(0) == n)
    assert(manifest.select("bucket", "pack_ix").distinct().count() ==
      back.select("bucket", "pack_ix").distinct().count(),
      "manifest and disk must agree on the shard set")
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(base))
  }

  final case class Reading(sensor_id: Long, v: Long)

  test("indexed sink stream maintains the min/max index across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Files.createTempDirectory("streamindexed").toString
    val src = MemoryStream[Reading]
    val q = StreamingCorpusSink.indexedSinkStream(
      src.toDF(), s"$base/t", s"$base/ckpt", Seq("v"), batchPartitions = 2)
    // two disjoint value eras in two batches
    src.addData((0L until 500L).map(i => Reading(i, i)): _*)
    q.processAllAvailable()
    src.addData((5000L until 5500L).map(i => Reading(i, i)): _*)
    q.processAllAvailable()
    q.stop()

    assert(spark.read.parquet(s"$base/t").count() == 1000)
    // era-selective reads prune the other era's files entirely
    import graft.operators.ScaleLayout
    val oldEra = ScaleLayout.readPruned(spark, s"$base/t", Map("v" -> (0.0, 499.0)))
    assert(oldEra.count() == 500)
    val (k1, tot1) = ScaleLayout.lastPruneFor(s"$base/t").get
    assert(k1 < tot1, s"old-era read must prune batch-2 files ($k1/$tot1)")
    val newEra = ScaleLayout.readPruned(spark, s"$base/t", Map("v" -> (5000.0, 5499.0)))
    assert(newEra.count() == 500)
    val (k2, tot2) = ScaleLayout.lastPruneFor(s"$base/t").get
    assert(k2 < tot2, s"new-era read must prune batch-1 files ($k2/$tot2)")
    // the index covers every data file (the commit-point invariant)
    val indexed = spark.read
      .parquet(ScaleLayout.committedIndexDir(spark, s"$base/t").get).count()
    val onDisk = new java.io.File(s"$base/t")
      .listFiles((_: java.io.File, n: String) => n.endsWith(".parquet")).length
    assert(indexed == onDisk, s"index rows $indexed vs files $onDisk")
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(base))
  }

  test("indexed sink replays a crashed batch exactly once (index is the commit point)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Files.createTempDirectory("streamidxretry").toString
    val src = MemoryStream[Reading]
    val q1 = StreamingCorpusSink.indexedSinkStream(
      src.toDF(), s"$base/t", s"$base/ckpt", Seq("v"), batchPartitions = 2)
    src.addData((0L until 500L).map(i => Reading(i, i)): _*)
    q1.processAllAvailable()
    src.addData((5000L until 5500L).map(i => Reading(i, i)): _*)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(s"$base/t").count() == 1000)

    // Crash after batch 1's writes, before its checkpoint commit; also plant an
    // orphan data file (the data-written-index-not window) the recovery must drop.
    assert(new java.io.File(s"$base/ckpt/commits/1").delete())
    new java.io.File(s"$base/ckpt/commits/.1.crc").delete()
    val orphanSrc = new java.io.File(s"$base/t")
      .listFiles((_: java.io.File, n: String) => n.endsWith(".parquet")).head
    val orphan = new java.io.File(s"$base/t/part-orphan-deadbeef.snappy.parquet")
    java.nio.file.Files.copy(orphanSrc.toPath, orphan.toPath)

    val q2 = StreamingCorpusSink.indexedSinkStream(
      src.toDF(), s"$base/t", s"$base/ckpt", Seq("v"), batchPartitions = 2)
    q2.processAllAvailable() // replays batch 1
    src.addData((9000L until 9100L).map(i => Reading(i, i)): _*)
    q2.processAllAvailable() // batch 2
    q2.stop()

    assert(!orphan.exists, "recovery must drop the unindexed orphan file")
    assert(spark.read.parquet(s"$base/t").count() == 1100,
      "replay must not duplicate data rows")
    import graft.operators.ScaleLayout
    val idx = spark.read.parquet(ScaleLayout.committedIndexDir(spark, s"$base/t").get)
    assert(idx.select("file").distinct().count() == idx.count())
    val onDisk = new java.io.File(s"$base/t")
      .listFiles((_: java.io.File, n: String) => n.endsWith(".parquet")).length
    assert(idx.count() == onDisk, "index rows must match files after replay")
    // era pruning still exact across original, replayed, and new batches
    assert(ScaleLayout.readPruned(spark, s"$base/t", Map("v" -> (5000.0, 5499.0)))
      .count() == 500)
    assert(ScaleLayout.readPruned(spark, s"$base/t", Map("v" -> (9000.0, 9099.0)))
      .count() == 100)
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(base))
  }

  test("indexed sink: a FRESH checkpoint over an existing table preserves every row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Files.createTempDirectory("streamidxtakeover").toString
    val src1 = MemoryStream[Reading]
    val q1 = StreamingCorpusSink.indexedSinkStream(
      src1.toDF(), s"$base/t", s"$base/ckptA", Seq("v"), batchPartitions = 2)
    src1.addData((0L until 500L).map(i => Reading(i, i)): _*)
    q1.processAllAvailable()
    q1.stop()

    // New checkpoint, batch ids restart at 0: recovery must treat incarnation
    // 1's files as committed (different ckpt_id), not as an uncommitted batch 0.
    val src2 = MemoryStream[Reading]
    val q2 = StreamingCorpusSink.indexedSinkStream(
      src2.toDF(), s"$base/t", s"$base/ckptB", Seq("v"), batchPartitions = 2)
    src2.addData((5000L until 5500L).map(i => Reading(i, i)): _*)
    q2.processAllAvailable()
    q2.stop()

    assert(spark.read.parquet(s"$base/t").count() == 1000,
      "takeover must preserve incarnation 1's rows")
    import graft.operators.ScaleLayout
    val idx = spark.read.parquet(ScaleLayout.committedIndexDir(spark, s"$base/t").get)
    val onDisk = new java.io.File(s"$base/t")
      .listFiles((_: java.io.File, n: String) => n.endsWith(".parquet")).length
    assert(idx.count() == onDisk)
    assert(ScaleLayout.readPruned(spark, s"$base/t", Map("v" -> (0.0, 499.0)))
      .count() == 500)
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(base))
  }
}
