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
}
