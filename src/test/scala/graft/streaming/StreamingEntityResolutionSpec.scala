package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.EntityResolution

final case class Rec(id: Long, name: String)

class StreamingEntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // wave 1 seeds three entities; wave 2 has a typo match to each of two, one
  // same-batch respelled pair (must mint ONE entity), and one singleton
  private val wave1 = Seq(
    Rec(1L, "acme steel works"), Rec(2L, "zenith glass co"), Rec(3L, "apex tools ltd"))
  private val wave2 = Seq(
    Rec(101L, "acme steel workz"),      // -> 1
    Rec(102L, "zenith glas co"),        // -> 2
    Rec(103L, "brand new widgets inc"), // new entity...
    Rec(104L, "brand new widgetz inc"), // ...same entity, same batch
    Rec(105L, "solitary record name"))  // new singleton

  private def dirs(): (String, String, String) = {
    val base = Files.createTempDirectory("streamer").toString
    (s"$base/catalog", s"$base/assign", s"$base/ckpt")
  }

  private def assignments(dir: String): Map[Long, Long] =
    spark.read.parquet(dir).select("id", "entity_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed linkage equals the explicit two-wave incrementalLink replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (catalogDir, assignDir, ckpt) = dirs()

    val src = MemoryStream[Rec]
    val q = StreamingEntityResolution.linkStream(
      src.toDF(), catalogDir, assignDir, ckpt, blocking = "token")
    src.addData(wave1: _*)
    q.processAllAvailable()
    src.addData(wave2: _*)
    q.processAllAvailable()
    q.stop()

    // batch replay: wave1 against nothing, wave2 against wave1's catalog
    val (a1, c1) = EntityResolution.incrementalLink(
      wave1.toDF("id", "name"),
      spark.emptyDataset[Rec].toDF(), "name", "id", blocking = "token")
    val (a2, _) = EntityResolution.incrementalLink(
      wave2.toDF("id", "name"), c1, "name", "id", blocking = "token")
    val want = (a1.collect() ++ a2.collect()).map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(assignments(assignDir) === want)
    // and the catalog holds exactly the canonical representatives
    val cat = spark.read.parquet(catalogDir).select("id").collect().map(_.getLong(0)).toSet
    assert(cat === Set(1L, 2L, 3L, 103L, 105L))
    // the same-batch respelling adopted 103, never minted 104
    assert(assignments(assignDir)(104L) === 103L)
  }

  test("cache-loss fallback: losing the carried snapshot mid-batch re-runs from disk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (catalogDir, assignDir, ckpt) = dirs()

    val src = MemoryStream[Rec]
    val q = StreamingEntityResolution.linkStream(
      src.toDF(), catalogDir, assignDir, ckpt, blocking = "token")
    src.addData(wave1: _*)
    q.processAllAvailable()
    // wave 2 arrives with the carried (localCheckpoint-backed) catalog
    // unreadable — the injected failure stands in for an executor loss. The
    // stream must fall back to the live on-disk generation, purge the failed
    // attempt's partial appends, and finish the batch with identical results.
    StreamingEntityResolution.failCachedCatalogOnce = true
    src.addData(wave2: _*)
    q.processAllAvailable()
    q.stop()
    assert(!StreamingEntityResolution.failCachedCatalogOnce,
      "the injected failure was never consumed — the cached path did not run")

    val (a1, c1) = EntityResolution.incrementalLink(
      wave1.toDF("id", "name"),
      spark.emptyDataset[Rec].toDF(), "name", "id", blocking = "token")
    val (a2, _) = EntityResolution.incrementalLink(
      wave2.toDF("id", "name"), c1, "name", "id", blocking = "token")
    val want = (a1.collect() ++ a2.collect()).map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assignments(assignDir) === want)
    // no duplicate rows from the failed attempt survived the purge
    val all = spark.read.parquet(assignDir).select("id").collect().map(_.getLong(0))
    assert(all.length === all.distinct.length,
      "failed-attempt partial appends leaked through the in-batch purge")
    val cat = spark.read.parquet(catalogDir).select("id").collect().map(_.getLong(0))
    assert(cat.length === cat.distinct.length)
    assert(cat.toSet === Set(1L, 2L, 3L, 103L, 105L))
  }

  test("a crashed batch replays exactly once: no duplicate assignments or catalog rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (catalogDir, assignDir, ckpt) = dirs()

    val src = MemoryStream[Rec]
    val q1 = StreamingEntityResolution.linkStream(
      src.toDF(), catalogDir, assignDir, ckpt, blocking = "token")
    src.addData(wave1: _*)
    q1.processAllAvailable()
    q1.stop()
    // simulate a crash AFTER batch 0's writes but BEFORE its commit marker
    assert(new java.io.File(s"$ckpt/commits/0").delete())
    new java.io.File(s"$ckpt/commits/.0.crc").delete()

    val q2 = StreamingEntityResolution.linkStream(
      src.toDF(), catalogDir, assignDir, ckpt, blocking = "token")
    q2.processAllAvailable() // replays batch 0 (same rows, same batch id)
    src.addData(wave2: _*)
    q2.processAllAvailable()
    q2.stop()

    val assigns = spark.read.parquet(assignDir).select("id").collect().map(_.getLong(0))
    assert(assigns.length === assigns.distinct.length, "duplicate assignment rows")
    assert(assigns.toSet === (wave1 ++ wave2).map(_.id).toSet)
    val cat = spark.read.parquet(catalogDir).select("id").collect().map(_.getLong(0))
    assert(cat.length === cat.distinct.length, "duplicate catalog rows")
    assert(cat.toSet === Set(1L, 2L, 3L, 103L, 105L))
  }

  test("a seeded (pre-protocol, untagged) catalog is linked against and never purged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (catalogDir, assignDir, ckpt) = dirs()
    // seed: plain parquet, no protocol tags
    wave1.toDF("id", "name").write.parquet(catalogDir)

    val src = MemoryStream[Rec]
    val q = StreamingEntityResolution.linkStream(
      src.toDF(), catalogDir, assignDir, ckpt, blocking = "token")
    src.addData(wave2: _*)
    q.processAllAvailable()
    q.stop()

    val a = assignments(assignDir)
    assert(a(101L) === 1L && a(102L) === 2L)
    assert(a(103L) === 103L && a(104L) === 103L && a(105L) === 105L)
    val cat = spark.read.parquet(catalogDir).select("id").collect().map(_.getLong(0)).toSet
    assert(cat === Set(1L, 2L, 3L, 103L, 105L))
  }

  private def parquetFiles(dir: String): Int = {
    val d = new java.io.File(dir)
    if (!d.exists()) 0
    else d.listFiles().count(f => f.getName.endsWith(".parquet") &&
      !f.getName.startsWith("_"))
  }

  test("compaction bounds per-trigger file count; results and replay stay exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (catalogDir, assignDir, ckpt) = dirs()
    // seed a pre-protocol catalog so compaction must fold untagged rows too
    Seq(Rec(1L, "acme steel works"), Rec(2L, "zenith glass co"))
      .toDF("id", "name").write.parquet(catalogDir)

    // six one-record batches at compactAt=2: compaction fires repeatedly
    // names share no token and sit far apart in edit distance — each batch
    // genuinely mints one new singleton entity
    val extra = (0 until 6).map(i =>
      Rec(200L + i, s"veryword$i${"x" * i} distinct$i token$i"))
    val src = MemoryStream[Rec]
    val q = StreamingEntityResolution.linkStream(
      src.toDF(), catalogDir, assignDir, ckpt, blocking = "token", compactAt = 2)
    extra.foreach { r => src.addData(r); q.processAllAvailable() }
    // the typo batch links against the CARRIED catalog (cache path, post-compaction)
    src.addData(Rec(300L, "acme steel workz"))
    q.processAllAvailable()
    q.stop()

    import graft.util.CommitPointer
    // generations exist and the live dirs are file-bounded by the threshold
    assert(CommitPointer.committedVersion(spark, catalogDir).nonEmpty,
      "catalog never compacted")
    assert(CommitPointer.committedVersion(spark, assignDir).nonEmpty,
      "assignments never compacted")
    val liveCat = CommitPointer.liveDir(spark, catalogDir)
    val liveAsg = CommitPointer.liveDir(spark, assignDir)
    assert(parquetFiles(liveCat) <= 3, s"catalog live dir holds ${parquetFiles(liveCat)} files")
    assert(parquetFiles(liveAsg) <= 3, s"assign live dir holds ${parquetFiles(liveAsg)} files")
    // the flat root migrated: no stray parquet outside _versions
    assert(parquetFiles(catalogDir) === 0 && parquetFiles(assignDir) === 0)

    // content is exactly the replay semantics: every extra record minted
    // itself; the typo adopted catalog id 1
    val a = StreamingEntityResolution.assignmentsTable(spark, assignDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === (extra.map(r => r.id -> r.id).toMap + (300L -> 1L)))
    val cat = StreamingEntityResolution.catalogTable(spark, catalogDir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(cat === (Set(1L, 2L) ++ extra.map(_.id)))

    // crash-replay AFTER compactions: delete the last commit marker and
    // restart — the purge must remove only the replayed batch's tagged files
    // (compacted untagged rows are purge-proof) and re-derive identical output
    val lastBatch = new java.io.File(s"$ckpt/commits").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).map(_.toLong).max
    assert(new java.io.File(s"$ckpt/commits/$lastBatch").delete())
    new java.io.File(s"$ckpt/commits/.$lastBatch.crc").delete()
    val q2 = StreamingEntityResolution.linkStream(
      src.toDF(), catalogDir, assignDir, ckpt, blocking = "token", compactAt = 2)
    q2.processAllAvailable()
    q2.stop()
    val a2 = StreamingEntityResolution.assignmentsTable(spark, assignDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(a2.length === a2.distinct.length, "replay duplicated assignment rows")
    assert(a2.toMap === a)
    val cat2 = StreamingEntityResolution.catalogTable(spark, catalogDir)
      .select("id").collect().map(_.getLong(0))
    assert(cat2.length === cat2.distinct.length, "replay duplicated catalog rows")
    assert(cat2.toSet === cat)
  }
}
