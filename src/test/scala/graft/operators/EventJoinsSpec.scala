package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** As-of and range join semantics on hand-computable fixtures: boundary
  * inclusivity, strict mode, ties, no-match nulls, and pair uniqueness of the
  * binned range join (each true pair produced exactly once, no distinct).
  */
class EventJoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (id, key, ts) probes
  private lazy val left = Seq(
    (1L, "a", 100L), (2L, "a", 250L), (3L, "a", 300L), (4L, "b", 50L), (5L, "c", 999L)
  ).toDF("id", "k", "ts")
  // (key, ts, v, tie) quotes — includes a same-instant pair on (a, 300)
  private lazy val right = Seq(
    ("a", 100L, 10.0, 1L), ("a", 200L, 20.0, 2L),
    ("a", 300L, 30.0, 3L), ("a", 300L, 31.0, 4L),
    ("b", 60L, 40.0, 5L)
  ).toDF("k", "ts", "v", "tie")

  test("asofJoin inclusive: latest right at-or-before, ties broken by tieCol, no-match null") {
    val out = EventOps.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), "tie")
      .orderBy("id")
      .select("id", "asof_v", "asof_ts")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out(0) == ((1L, Some(10.0), Some(100L)))) // same-instant right IS visible
    assert(out(1) == ((2L, Some(20.0), Some(200L)))) // latest preceding, not first
    assert(out(2) == ((3L, Some(31.0), Some(300L)))) // tie at 300 -> max tieCol wins
    assert(out(3) == ((4L, None, None)))             // b@50 precedes b@60 -> no match
    assert(out(4) == ((5L, None, None)))             // key with no right rows
  }

  test("asofJoin strict: same-instant right is NOT visible") {
    val out = EventOps.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), "tie",
        strict = true)
      .orderBy("id").select("id", "asof_ts")
      .collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(out(0) == ((1L, None)))        // right@100 excluded under <
    assert(out(2) == ((3L, Some(200L))))  // 300-instant rows excluded, 200 matches
  }

  test("asofJoin preserves every left row and all left columns") {
    val out = EventOps.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("v"), "tie")
    assert(out.count() == left.count())
    assert(Seq("id", "k", "ts", "asof_v", "asof_ts").forall(out.columns.contains))
  }

  test("rangeJoin matches the exact interval predicate, bounds inclusive, once per pair") {
    // window [ts-100, ts+100]; right rows land in same or adjacent bins
    val out = EventOps.rangeJoin(left, right, Seq("k"), "ts", "ts", -100L, 100L)
    val pairs = out.select("id", "r_tie").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // brute-force expectation
    val l = Seq((1L, "a", 100L), (2L, "a", 250L), (3L, "a", 300L), (4L, "b", 50L), (5L, "c", 999L))
    val r = Seq(("a", 100L, 1L), ("a", 200L, 2L), ("a", 300L, 3L), ("a", 300L, 4L), ("b", 60L, 5L))
    val expect = (for {
      (id, lk, lts) <- l; (rk, rts, tie) <- r
      if lk == rk && rts >= lts - 100 && rts <= lts + 100
    } yield (id, tie)).sorted
    assert(pairs == expect, s"got $pairs expected $expect")
    assert(pairs.size == pairs.distinct.size, "a pair was generated twice")
  }

  test("rangeJoin asymmetric window [0, hi] sees only later rows") {
    val out = EventOps.rangeJoin(left, right, Seq("k"), "ts", "ts", 0L, 50L)
      .select("id", "r_tie").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // id1@100: right@100 (dt=0) and @150? none -> (1,1); id2@250: right@300 x2 (dt=50)
    assert(out == Seq((1L, 1L), (2L, 3L), (2L, 4L), (3L, 3L), (3L, 4L), (4L, 5L)))
  }

  test("rangeJoin survives ns-scale epochs (exact long binning)") {
    val base = 1704067200000000000L // 2024-01-01 in ns — beyond double's 2^53
    val lNs = Seq((1L, "a", base), (2L, "a", base + 400000000000L)).toDF("id", "k", "ts")
    val rNs = Seq(("a", base + 100000000000L, 9L)).toDF("k", "ts", "tie")
    val out = EventOps.rangeJoin(lNs, rNs, Seq("k"), "ts", "ts",
        -300000000000L, 300000000000L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L)) // dt = +100s and -300s (inclusive bound)
  }

  // ---- fixture-representation drift (the regression that broke round 5) ----
  //
  // events.parquet has shipped `ts` both as raw INT64 epoch NANOS and as
  // TIMESTAMP(MICROS, isAdjustedToUTC=false). Queries must absorb either shape
  // (queries.Relational.normalizeEventTs): write the SAME events under both
  // representations and require the event queries to return identical rows.

  private def writeEventFixtures(): (String, String, String) = {
    import org.apache.spark.sql.types._
    val baseUs = 1704067200000000L // 2024-01-01 in µs
    val rng = new scala.util.Random(7)
    val types = Array("view", "click", "purchase", "error")
    val rows = (0 until 400).map { i =>
      val us = baseUs + rng.nextInt(6 * 3600) * 1000000L + rng.nextInt(1000) * 1000L
      (i.toLong, us, (i % 17).toLong, types(rng.nextInt(4)),
        rng.nextInt(1000) / 10.0, s"""{"k": ${rng.nextInt(50)}}""")
    }
    val df = rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val dirLong = java.nio.file.Files.createTempDirectory("graft_ev_nslong_").toString
    val dirTs = java.nio.file.Files.createTempDirectory("graft_ev_ustz_").toString
    // shape 1: epoch-ns long (the legacy contract the queries are written against)
    df.select(col("event_id"), (col("ts_us") * 1000).alias("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dirLong/events.parquet")
    // shape 2: µs TIMESTAMP_NTZ (the current fixture: MICROS, isAdjustedToUTC=0)
    val ntz = df.select(col("event_id"),
        expr("timestampadd(MICROSECOND, ts_us, TIMESTAMP_NTZ '1970-01-01 00:00:00')").alias("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    ntz.coalesce(1).write.mode("overwrite").parquet(s"$dirTs/events.parquet")
    // shape 3: µs TIMESTAMP (MICROS, isAdjustedToUTC=1 — tz-adjusted instants).
    // Written under a session tz far from UTC: parquet must still store the
    // UTC-normalized instant, which is what makes the unix_micros() arm of
    // normalizeEventTs correct regardless of who wrote the file.
    val dirTz = java.nio.file.Files.createTempDirectory("graft_ev_usutc_").toString
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    val prevOut = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      df.select(col("event_id"), expr("timestamp_micros(ts_us)").alias("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dirTz/events.parquet")
    } finally {
      spark.conf.set("spark.sql.session.timeZone", prevTz)
      spark.conf.set("spark.sql.parquet.outputTimestampType", prevOut)
    }
    // the written shapes must actually differ on read
    assert(spark.read.parquet(s"$dirLong/events.parquet").schema("ts").dataType == LongType)
    assert(spark.read.parquet(s"$dirTs/events.parquet").schema("ts").dataType == TimestampNTZType)
    assert(spark.read.parquet(s"$dirTz/events.parquet").schema("ts").dataType == TimestampType)
    (dirLong, dirTs, dirTz)
  }

  test("event queries are representation-agnostic: ns-long, µs-NTZ and µs-tz-adjusted agree") {
    val (dirLong, dirTs, dirTz) = writeEventFixtures()
    for (q <- Seq("e1_sessionize", "e6_asof_join", "e7_range_join")) {
      val fn = graft.SparkEntry.queries(q)
      val a = fn(spark, dirLong).collect().map(_.toString).toSeq
      val b = fn(spark, dirTs).collect().map(_.toString).toSeq
      val c = fn(spark, dirTz).collect().map(_.toString).toSeq
      assert(a.nonEmpty, s"$q returned no rows on the fixture")
      assert(a == b, s"$q drifted between ns-long and NTZ representations")
      assert(a == c, s"$q drifted between ns-long and tz-adjusted representations")
    }
  }
}
