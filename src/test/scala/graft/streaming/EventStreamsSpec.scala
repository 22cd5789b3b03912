package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  private def runStream(name: String, df: org.apache.spark.sql.DataFrame,
      mode: String = "append"): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("streaming curation: in-stream dedup, static-index anti-join, quality gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "The quick brown fox jumps over the lazy dog and then " +
      "the dog chases the fox around the garden for a while. " * 4
    val src = MemoryStream[Doc]
    src.addData(
      Doc(1, ts("2024-01-01 10:00:00"), good),              // kept
      Doc(2, ts("2024-01-01 10:01:00"), good),              // in-stream dup of 1
      Doc(3, ts("2024-01-01 10:02:00"), good + " extra!"),  // kept (new content)
      Doc(4, ts("2024-01-01 10:03:00"), "already indexed doc body " * 20), // in index
      Doc(5, ts("2024-01-01 10:04:00"), "kurz"),            // fails quality/lang
      Doc(6, ts("2024-01-01 10:05:00"), "der die das und nicht ist auch " * 20)) // de
    val index = Seq("already indexed doc body " * 20).toDF("t")
      .select(graft.operators.TextAnalysis.fingerprint($"t").alias("fp"))
    val out = runStream("curated",
      EventStreams.curateStream(src.toDF(), index), mode = "append")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("streaming near-dup drops punctuation/case variants the exact path keeps apart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val src = MemoryStream[Doc]
    src.addData(
      Doc(1, ts("2024-01-01 10:00:00"), base),
      Doc(2, ts("2024-01-01 10:01:00"), base.toUpperCase + "!!!"), // same signature
      Doc(3, ts("2024-01-01 10:02:00"), "completely different content about " +
        "databases and distributed query engines running at scale"))
    val out = runStream("neardedup", EventStreams.nearDedupStream(src.toDF()))
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"got $kept")
  }

  test("foreachBatch near-dup curation dedups across micro-batches via the index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_neardup_").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val src = MemoryStream[Doc]
    val q = EventStreams.curateNearDupStream(src.toDF(),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckpt", threshold = 0.5)
    // batch 1: doc 2 is an in-batch near-dup of doc 1 ("today" -> "yesterday")
    src.addData(
      Doc(1, ts("2024-01-01 10:00:00"), base),
      Doc(2, ts("2024-01-01 10:01:00"), base.replace("today", "yesterday")))
    q.processAllAvailable()
    // batch 2: doc 3 near-matches INDEXED doc 1; doc 4 is fresh content
    src.addData(
      Doc(3, ts("2024-01-01 11:00:00"), base.replace("today", "tonight")),
      Doc(4, ts("2024-01-01 11:01:00"), "completely different content about " +
        "databases and distributed query engines running at massive scale"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$tmp/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"got $kept")
    // the index holds exactly the survivors' band/set rows
    val idx = spark.read.parquet(s"$tmp/index")
    assert(idx.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(idx.columns.toSet == Set("id", "bands", "s", "batch_id", "ckpt_id"))
  }

  test("near-dup curation replays a crashed batch without self-dup data loss") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_neardup_retry_").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val fresh = "completely different content about databases and distributed " +
      "query engines running at massive scale"
    val src = MemoryStream[Doc]
    val q1 = EventStreams.curateNearDupStream(src.toDF(),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckpt", threshold = 0.5)
    src.addData(Doc(1, ts("2024-01-01 10:00:00"), base),
      Doc(2, ts("2024-01-01 10:01:00"), fresh))
    q1.processAllAvailable()
    q1.stop()
    // Crash after batch 0's out+index appends, before the checkpoint commit.
    // Without recovery, the replay would find docs 1 and 2 IN THE INDEX and
    // drop both — zero survivors, silent data loss.
    assert(new java.io.File(s"$tmp/ckpt/commits/0").delete())
    new java.io.File(s"$tmp/ckpt/commits/.0.crc").delete()
    val q2 = EventStreams.curateNearDupStream(src.toDF(),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckpt", threshold = 0.5)
    q2.processAllAvailable() // replays batch 0 against the purged (empty) index
    src.addData(Doc(3, ts("2024-01-01 11:00:00"), base.replace("today", "tonight")))
    q2.processAllAvailable() // near-dups indexed doc 1 -> dropped
    q2.stop()
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "replay must keep batch 0's survivors exactly once")
    assert(out.count() == 2, "no duplicate rows after replay")
    val idx = spark.read.parquet(s"$tmp/index")
    assert(idx.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("near-dup curation: index compaction bounds files, stays exact, survives crash-replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_neardup_compact_").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val fresh = Seq(
      "completely different content about databases and distributed query engines",
      "a travel journal describing mountain villages and ancient stone bridges",
      "recipes for winter soups with roasted vegetables and fresh garden herbs",
      "notes on orchestral composition harmony counterpoint and baroque style")
    val src = MemoryStream[Doc]
    val q1 = EventStreams.curateNearDupStream(src.toDF(),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckpt", threshold = 0.5, compactIndexAt = 4)
    // four singleton batches: four index files accumulate in the flat dir
    src.addData(Doc(1, ts("2024-01-01 10:00:00"), base)); q1.processAllAvailable()
    (0 until 3).foreach { i =>
      src.addData(Doc(2 + i, ts(s"2024-01-01 10:0${i + 1}:00"), fresh(i)))
      q1.processAllAvailable()
    }
    // batch 4 hits the threshold: compaction flips the pointer, then the batch
    // probes the COMPACTED index — doc 5 near-dups doc 1 and must still drop
    src.addData(
      Doc(5, ts("2024-01-01 11:00:00"), base.replace("today", "tonight")),
      Doc(6, ts("2024-01-01 11:01:00"), fresh(3)))
    q1.processAllAvailable()
    q1.stop()
    val live = graft.util.CommitPointer.liveDir(spark, s"$tmp/index")
    assert(live != s"$tmp/index", "the pointer must have flipped to a compacted generation")
    val liveFiles = new java.io.File(live)
      .listFiles((_: java.io.File, n: String) => n.endsWith(".parquet")).length
    assert(liveFiles <= 2, s"compaction must bound the file count, got $liveFiles")
    assert(spark.read.parquet(s"$tmp/out").select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 6L))
    // crash-replay AFTER compaction: the compacted rows are untagged (committed
    // by construction) so the purge must keep them, while batch 4's own tagged
    // appends purge and replay exactly once
    assert(new java.io.File(s"$tmp/ckpt/commits/4").delete())
    new java.io.File(s"$tmp/ckpt/commits/.4.crc").delete()
    val q2 = EventStreams.curateNearDupStream(src.toDF(),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckpt", threshold = 0.5, compactIndexAt = 4)
    q2.processAllAvailable() // replays batch 4
    q2.stop()
    val out = spark.read.parquet(s"$tmp/out")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L, 6L), "replay after compaction must keep survivors exactly")
    assert(out.count() == 5, "no duplicate rows after replay")
    val idx = spark.read.parquet(graft.util.CommitPointer.liveDir(spark, s"$tmp/index"))
    assert(idx.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 6L))
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("near-dup curation: a fresh checkpoint inherits the index instead of purging it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_neardup_takeover_").toString
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val src1 = MemoryStream[Doc]
    val q1 = EventStreams.curateNearDupStream(src1.toDF(),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckptA", threshold = 0.5)
    src1.addData(Doc(1, ts("2024-01-01 10:00:00"), base))
    q1.processAllAvailable()
    q1.stop()
    // New checkpoint, batch ids restart at 0 — the inherited index must survive
    // recovery, so incarnation 2 still dedups against incarnation 1's docs.
    val src2 = MemoryStream[Doc]
    val q2 = EventStreams.curateNearDupStream(src2.toDF(),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckptB", threshold = 0.5)
    src2.addData(
      Doc(2, ts("2024-01-01 11:00:00"), base.replace("today", "tonight")), // near-dup of 1
      Doc(3, ts("2024-01-01 11:01:00"), "completely different content about " +
        "databases and distributed query engines running at massive scale"))
    q2.processAllAvailable()
    q2.stop()
    val kept = spark.read.parquet(s"$tmp/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L),
      s"takeover must keep doc 1, drop its near-dup 2, keep fresh 3 — got $kept")
    graft.util.Fs.deleteTree(java.nio.file.Paths.get(tmp))
  }

  test("streaming media near-dup: perceptual index accumulates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_media_").toString
    final case class M(doc_id: Long)
    val src = MemoryStream[Long]
    val q = EventStreams.mediaNearDupStream(
      src.toDF().withColumnRenamed("value", "doc_id"),
      s"$tmp/index", s"$tmp/out", s"$tmp/ckpt",
      sigFn = df => graft.operators.Multimodal.perceptualHash(
        graft.operators.Multimodal.attachTexturedImagePayload(df, "doc_id")))
    // batch 1: ids 2 and 3 render distinct textures (groups 2, 3); both survive
    src.addData(2L, 3L)
    q.processAllAvailable()
    // batch 2: 204 re-renders group 2 exactly, 103 is its one-pixel edit — both
    // drop against the INDEXED 2; 5 is a fresh texture and survives
    src.addData(204L, 103L, 5L)
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$tmp/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 5L), s"got $kept")
    val idx = spark.read.parquet(s"$tmp/index")
    assert(idx.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L, 5L))
    assert(idx.columns.toSet == Set("id", "simhash", "batch_id", "ckpt_id"))
  }

  test("hourly rollup closes windows once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    src.addData(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-01 10:55:00"), 2, "click", 2.0),
      Ev(3, ts("2024-01-01 11:10:00"), 1, "view", 5.0),
      // advances the watermark past 11:00 + 30min so the 10:00 window emits
      Ev(4, ts("2024-01-01 13:00:00"), 3, "view", 1.0))
    val out = runStream("rollup", EventStreams.hourlyRollup(src.toDF()))
    val rows = out.collect()
    assert(rows.exists(r => r.getAs[Timestamp]("hour_start") == ts("2024-01-01 10:00:00")
      && r.getAs[String]("event_type") == "click" && r.getAs[Long]("n") == 2))
    // the 13:00 window is still open (watermark has not passed its end)
    assert(!rows.exists(_.getAs[Timestamp]("hour_start") == ts("2024-01-01 13:00:00")))
  }

  test("session windows split on the inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    src.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 7, "a", 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 7, "a", 1.0), // same session (gap 30m)
      Ev(3, ts("2024-01-01 12:00:00"), 7, "a", 1.0), // new session
      Ev(4, ts("2024-01-01 15:00:00"), 9, "a", 1.0)) // watermark push
    val out = runStream("sessions", EventStreams.sessionize(src.toDF(), gap = "30 minutes"))
    val u7 = out.filter(col("user_id") === 7).collect()
    assert(u7.length == 2, s"expected 2 closed sessions, got ${u7.length}")
    assert(u7.exists(_.getAs[Long]("n_events") == 2))
  }

  test("flatMapGroupsWithState keeps running totals across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningTotals(src.toDS()).writeStream
      .format("memory").queryName("totals").outputMode("append").start()
    src.addData(EventStreams.UserEvent(1, ts("2024-01-01 10:00:00"), 2.0))
    q.processAllAvailable()
    src.addData(EventStreams.UserEvent(1, ts("2024-01-01 10:01:00"), 3.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("totals").collect()
    // second trigger sees state from the first: total 5.0 over 2 events
    assert(rows.exists(r => r.getAs[Long]("n_events") == 2 && r.getAs[Double]("total_value") == 5.0))
  }

  test("streaming as-of enrichment: batch-exact ordering, state carries across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{TaggedEvent => T}
    val src = MemoryStream[T]
    val q = EventStreams.asofEnrichStream(src.toDS()).writeStream
      .format("memory").queryName("asof").outputMode("append").start()
    // batch 1: quote@100 then lookup@150 (in-batch match), lookup@50 (no quote yet),
    // same-instant quote+lookup@200 (inclusive boundary), quote tie at 200
    src.addData(
      T(1, 100L, isRight = true, tie = 1L, value = 10.0),
      T(1, 150L, isRight = false, tie = 0L, value = 0.0),
      T(1, 50L, isRight = false, tie = 0L, value = 0.0),
      T(1, 200L, isRight = true, tie = 2L, value = 20.0),
      T(1, 200L, isRight = true, tie = 3L, value = 21.0),
      T(1, 200L, isRight = false, tie = 0L, value = 0.0))
    q.processAllAvailable()
    // batch 2: lookup@300 must see batch 1's best quote (200, tie 3) from state
    src.addData(T(1, 300L, isRight = false, tie = 0L, value = 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("asof").orderBy("ts").collect()
      .map(r => (r.getAs[Long]("ts"), Option(r.getAs[Any]("asof_ts")),
        Option(r.getAs[Any]("asof_value"))))
    assert(rows(0) == ((50L, None, None)),           "lookup before any quote")
    assert(rows(1) == ((150L, Some(100L), Some(10.0))), "in-batch preceding quote")
    assert(rows(2) == ((200L, Some(200L), Some(21.0))), "same-instant + tie by max tie")
    assert(rows(3) == ((300L, Some(200L), Some(21.0))), "state carries across triggers")
  }

  test("dropDuplicatesWithinWatermark removes redelivered events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    src.addData(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
      Ev(1, ts("2024-01-01 10:00:05"), 1, "a", 1.0), // duplicate id within horizon
      Ev(2, ts("2024-01-01 10:01:00"), 1, "a", 1.0))
    val out = runStream("dedup", EventStreams.dedupStream(src.toDF()))
    assert(out.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
