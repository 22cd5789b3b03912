package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events shape: ordered funnels and cohort
  * retention. Both are composed from joins/aggregations Catalyst plans natively
  * (no MATCH_RECOGNIZE engine needed): each funnel step is one aggregation of the
  * events table filtered to that step, shuffled by user — at scale, k steps cost k
  * passes over the (pre-filtered) event log, all map-side-prunable by event type.
  */
object EventOps {

  /** Ordered funnel: for each user, the earliest time of step i that is strictly
    * after their step i-1 time. Returns one row per user who completed step 1, with
    * nullable `t1..tk` timestamps (left joins keep partial funnels).
    */
  def funnel(
      events: DataFrame, steps: Seq[String],
      idCol: String = "user_id", tsCol: String = "t", typeCol: String = "event_type")
      : DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val s1 = events.filter(col(typeCol) === steps.head)
      .groupBy(col(idCol)).agg(min(col(tsCol)).alias("t1"))
    val (full, _) = steps.zipWithIndex.drop(1).foldLeft((s1, "t1")) {
      case ((acc, prevT), (step, i)) =>
        val tN = s"t${i + 1}"
        val sN = events.filter(col(typeCol) === step)
          .join(acc.select(col(idCol), col(prevT)), idCol)
          .filter(col(tsCol) > col(prevT))
          .groupBy(col(idCol)).agg(min(col(tsCol)).alias(tN))
        (acc.join(sN, Seq(idCol), "left_outer"), tN)
    }
    full
  }

  /** Step-completion counts for a funnel result: row per step with the number of
    * users whose funnel reached it.
    */
  def funnelCounts(funnelDF: DataFrame, k: Int): DataFrame = {
    val counts = (1 to k).map(i => count(col(s"t$i")).alias(s"step$i"))
    val wide = funnelDF.agg(counts.head, counts.tail: _*)
    val pairs = (1 to k).map(i =>
      struct(lit(i).alias("step"), col(s"step$i").alias("users")))
    wide.select(explode(array(pairs: _*)).alias("s"))
      .select(col("s.step").alias("step"), col("s.users").alias("users"))
  }

  /** As-of join: for every left row, the single right row with the greatest
    * `rightTs <= leftTs` (inclusive, DuckDB/kdb `ASOF JOIN` semantics; `strict =
    * true` for `<`) within the same `keys` group. Spark has no native as-of join,
    * and the naive inequality join degenerates to a per-key cartesian that a range
    * planner must then prune; instead both inputs are UNIONed with a side tag and
    * scanned once per key in timestamp order, carrying the most recent right-side
    * values forward with `last(_, ignoreNulls)` over an unbounded-preceding window.
    * One shuffle of each input by `keys`, O(n log n) per key for the sort, zero
    * row amplification — the shape that survives a 100 TB event log (each key's
    * scan is independent; hot keys cost their own length, never |L|x|R|).
    *
    * Equal-timestamp right rows are ordered by `tieCol` so the LAST one under that
    * ordering wins deterministically (the relational argmax both engines agree on);
    * right rows sort before (inclusive) or after (strict) left rows at the same
    * instant, which is exactly the `>=` vs `>` boundary.
    *
    * Output: every left column, plus each `rightVals` column prefixed
    * `asof_` and the matched right timestamp as `asof_ts` (nulls when no
    * right row precedes).
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      tieCol: String, strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val leftCols = left.columns.toSeq
    val carried = rightVals :+ rightTs
    // Side tag ordering at an equal timestamp decides the >= / > boundary:
    // inclusive puts right rows first (visible to same-instant left rows).
    val (rSide, lSide) = if (strict) (1, 0) else (0, 1)
    val l = left.select(
      (keys.map(col) :+ col(leftTs).alias("__ts") :+ lit(lSide).alias("__side") :+
        lit(null).cast("long").alias("__tie")) ++
        leftCols.map(c => col(c).alias(s"__l_$c")) ++
        carried.map(c => lit(null).cast(right.schema(c).dataType).alias(s"__r_$c")): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).alias("__ts") :+ lit(rSide).alias("__side") :+
        col(tieCol).cast("long").alias("__tie")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).alias(s"__l_$c")) ++
        carried.map(c => col(c).alias(s"__r_$c")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = l.unionByName(r).select(
      (col("*") +:
        carried.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w)
          .alias(s"__m_$c"))): _*)
    withMatch.filter(col("__side") === lSide && col("__tie").isNull)
      .select(leftCols.map(c => col(s"__l_$c").alias(c)) ++
        rightVals.map(c => col(s"__m_$c").alias(s"asof_$c")) :+
        col(s"__m_$rightTs").alias("asof_ts"): _*)
  }

  /** Range (interval) join: all (left, right) pairs in the same `keys` group with
    * `rightTs` inside `[leftTs + lo, leftTs + hi]` (both bounds inclusive, `lo`/`hi`
    * in the timestamp's own unit). Spark plans a raw inequality join as a per-key
    * nested loop; instead both sides are binned at `hi - lo` width so every true
    * pair shares a bin or sits in adjacent ones — the left side joins each of its
    * bin's two candidate bins (bin, bin+1) against right rows mapped to (bin(r),
    * bin(r)-… ) via a compact 2x left expansion, then the exact predicate filters.
    * Row amplification is bounded at 2x the LEFT side (never the big right side),
    * shuffles hash on (keys, bin) so skew spreads across bins, and each candidate
    * pair is generated exactly once — no distinct needed.
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, lo: Long, hi: Long): DataFrame = {
    require(hi >= lo, s"rangeJoin needs hi >= lo, got [$lo, $hi]")
    val width = math.max(hi - lo, 1L)
    // Left row covers [ts+lo, ts+hi] — at bin width = the interval length that
    // window spans at most two bins starting at floor((ts+lo)/width). Binning is
    // exact LONG arithmetic (`div`): ns-scale epochs exceed 2^53 and a double
    // floor-divide would misplace boundary rows. `div` truncates toward zero, so
    // timestamps (and ts + lo) are required non-negative — true for any epoch.
    val lBinned = left.select(col("*"),
      explode(array(lit(0L), lit(1L))).alias("__probe"))
      .withColumn("__bin",
        expr(s"(CAST($leftTs AS BIGINT) + ${lo}L) div ${width}L") + col("__probe"))
      .drop("__probe")
    // The right side is renamed wholesale (left/right usually slice the SAME
    // event log, and prefixed names sidestep Catalyst's self-join attribute
    // ambiguity while giving the output distinct column names for free).
    val rBinned = right.select(
      right.columns.toSeq.map(c => col(c).alias(s"r_$c")) :+
        expr(s"CAST($rightTs AS BIGINT) div ${width}L").alias("__rbin"): _*)
    val cond = keys.map(k => col(k) === col(s"r_$k")).reduce(_ && _) &&
      col("__bin") === col("__rbin") &&
      col(s"r_$rightTs").cast("long").between(
        col(leftTs).cast("long") + lo, col(leftTs).cast("long") + hi)
    lBinned.join(rBinned, cond, "inner")
      .drop("__bin", "__rbin")
  }

  /** Cohort retention: users grouped by first-activity period, counted per
    * subsequent period offset. One aggregation for cohorts (shuffle by user), one
    * for activity, one join — the standard layout whose output is tiny regardless
    * of input scale.
    */
  def retention(
      events: DataFrame, period: String = "week",
      idCol: String = "user_id", tsCol: String = "t"): DataFrame = {
    val cohorts = events.groupBy(col(idCol))
      .agg(date_trunc(period, min(col(tsCol))).alias("cohort"))
    val active = events
      .select(col(idCol), date_trunc(period, col(tsCol)).alias("p"))
      .distinct()
    active.join(cohorts, idCol)
      .groupBy(col("cohort"),
        datediff(col("p"), col("cohort")).alias("offset_days"))
      .agg(countDistinct(col(idCol)).alias("users"))
  }
}
