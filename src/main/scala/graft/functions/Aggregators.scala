package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregates for the two reference aggregate functions Spark lacks
  * (`wren-core/core/src/mdl/function/aggregate/mod.rs:39-49`):
  *
  *   - `approx_percentile_cont_with_weight(x, w, p)` — DataFusion backs this with a
  *     t-digest; here a deterministic mergeable centroid sketch with the same shape:
  *     bounded memory (O(maxCentroids) per group regardless of group size), partial
  *     aggregation + merge across partitions, uniform ~1/maxCentroids rank error.
  *     Spark's built-in exact `percentile(x, p, w)` buffers every distinct value per
  *     group (an OpenHashMap) — correct, but memory grows with group cardinality; at
  *     100 TB a hot group dies. This sketch is the scale path.
  *   - `nth_value_agg(x, n)` — DataFusion's nth_value aggregate. Keeps only the |n|
  *     smallest (n > 0) or largest (n < 0) values, so state is O(|n|), not O(group).
  *     Ordered by the value itself (ascending), which makes the result deterministic
  *     under Spark's unordered shuffle; n is 1-based, negative counts from the end,
  *     NULL when the group has fewer than |n| rows. Registered as `nth_value_agg`
  *     because `nth_value` must keep naming Spark's built-in *window* function.
  *
  * Both are `Aggregator[IN, BUF, OUT]` per SURVEY §2.B's plan (ObjectHashAggregate
  * execution — genuinely stateful sketches, not expressible as codegen expressions).
  * Buffers are mutated in place (Spark only serializes them at partition
  * boundaries), so per-row cost is O(1) amortized, not an array copy.
  */
object Aggregators {

  /** Centroid sketch buffer: value/weight arrays filled to `cnt`, plus the constant
    * percentile argument (NaN until the first row is seen).
    */
  final case class PctBuf(
      var vs: Array[Double], var ws: Array[Double], var cnt: Int, var p: Double)

  class ApproxWeightedPercentile(maxCentroids: Int = 1024)
      extends Aggregator[(java.lang.Double, java.lang.Double, java.lang.Double), PctBuf, java.lang.Double] {

    private val softCap = 2 * maxCentroids

    override def zero: PctBuf = PctBuf(Array.empty, Array.empty, 0, Double.NaN)

    /** Sort the live prefix by value and greedily merge adjacent points so no merged
      * centroid exceeds totalW/maxCentroids — deterministic, order-insensitive once
      * inputs are value-sorted (ties merge in weight order).
      */
    private def compress(b: PctBuf): Unit = {
      if (b.cnt <= maxCentroids) return
      val order = (0 until b.cnt).sortBy(i => (b.vs(i), b.ws(i)))
      var totalW = 0.0
      var i = 0
      while (i < b.cnt) { totalW += b.ws(i); i += 1 }
      val limit = totalW / maxCentroids
      val outV = new Array[Double](b.vs.length)
      val outW = new Array[Double](b.ws.length)
      var out = 0
      var accW = 0.0
      var accVW = 0.0
      order.foreach { j =>
        if (accW > 0 && accW + b.ws(j) > limit) {
          outV(out) = accVW / accW; outW(out) = accW; out += 1
          accW = 0.0; accVW = 0.0
        }
        accW += b.ws(j); accVW += b.vs(j) * b.ws(j)
      }
      if (accW > 0) { outV(out) = accVW / accW; outW(out) = accW; out += 1 }
      b.vs = outV; b.ws = outW; b.cnt = out
    }

    private def append(b: PctBuf, x: Double, w: Double): Unit = {
      if (b.vs.length == 0) { b.vs = new Array[Double](softCap); b.ws = new Array[Double](softCap) }
      if (b.cnt == b.vs.length) compress(b)
      b.vs(b.cnt) = x; b.ws(b.cnt) = w; b.cnt += 1
    }

    // NULL x/w/p rows are skipped, like the DataFusion reference aggregate
    override def reduce(b: PctBuf, in: (java.lang.Double, java.lang.Double, java.lang.Double)): PctBuf = {
      val (x, w, p) = in
      if (b.p.isNaN && p != null) b.p = p
      if (x != null && w != null && w > 0 && !x.isNaN) append(b, x, w)
      b
    }

    override def merge(a: PctBuf, b: PctBuf): PctBuf = {
      if (a.p.isNaN) a.p = b.p
      var i = 0
      while (i < b.cnt) { append(a, b.vs(i), b.ws(i)); i += 1 }
      a
    }

    override def finish(b: PctBuf): java.lang.Double = {
      if (b.cnt == 0 || b.p.isNaN) return null
      val order = (0 until b.cnt).sortBy(i => (b.vs(i), b.ws(i)))
      var totalW = 0.0
      order.foreach(i => totalW += b.ws(i))
      val target = b.p.max(0.0).min(1.0) * totalW
      // t-digest-style quantile walk: centroid centers sit at cumulative-weight
      // midpoints; interpolate linearly between neighbors, clamp at the extremes.
      var cum = 0.0
      var prevC = Double.NaN
      var prevV = b.vs(order.head)
      var k = 0
      while (k < order.length) {
        val i = order(k)
        val center = cum + b.ws(i) / 2
        if (target <= center) {
          return if (prevC.isNaN || center == prevC) b.vs(i)
          else prevV + (b.vs(i) - prevV) * (target - prevC) / (center - prevC)
        }
        cum += b.ws(i); prevC = center; prevV = b.vs(i)
        k += 1
      }
      b.vs(order.last)
    }

    override def bufferEncoder: Encoder[PctBuf] = Encoders.product[PctBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Bounded nth-value buffer: ascending-sorted retained values + the constant n. */
  final case class NthBuf(var vs: Array[Double], var n: Long)

  class NthValueAgg(maxN: Int = 100000)
      extends Aggregator[(java.lang.Double, java.lang.Long), NthBuf, java.lang.Double] {

    override def zero: NthBuf = NthBuf(Array.empty, 0L)

    private def bound(sorted: Array[Double], n: Long): Array[Double] = {
      val cap = math.abs(n).toInt
      if (cap == 0 || sorted.length <= cap) sorted
      else if (n > 0) sorted.take(cap) // n-th from the start: keep smallest
      else sorted.takeRight(cap) //      n-th from the end:   keep largest
    }

    // NULL values are skipped (DataFusion nth_value ignores nulls)
    override def reduce(b: NthBuf, in: (java.lang.Double, java.lang.Long)): NthBuf = {
      val (xBoxed, nBoxed) = in
      if (xBoxed == null) return b
      val x = xBoxed.doubleValue
      val n = if (nBoxed == null) b.n else nBoxed.longValue
      require(math.abs(n) <= maxN, s"nth_value_agg: |n| must be <= $maxN")
      if (b.n == 0L) b.n = n
      val at = java.util.Arrays.binarySearch(b.vs, x)
      val ins = if (at >= 0) at else -(at + 1)
      val vs = new Array[Double](b.vs.length + 1)
      System.arraycopy(b.vs, 0, vs, 0, ins)
      vs(ins) = x
      System.arraycopy(b.vs, ins, vs, ins + 1, b.vs.length - ins)
      b.vs = bound(vs, b.n)
      b
    }

    override def merge(a: NthBuf, b: NthBuf): NthBuf = {
      if (a.n == 0L) a.n = b.n
      a.vs = bound((a.vs ++ b.vs).sorted, a.n)
      a
    }

    override def finish(b: NthBuf): java.lang.Double = {
      val idx = if (b.n > 0) b.n - 1 else b.vs.length + b.n
      if (b.n == 0 || idx < 0 || idx >= b.vs.length) null else b.vs(idx.toInt)
    }

    override def bufferEncoder: Encoder[NthBuf] = Encoders.product[NthBuf]
    override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** Size-bounded sorted collect: gathers up to `cap` longs per group; a group that
    * exceeds the cap yields NULL (the caller filters it — the "too hot to pair"
    * posting list). Unlike `collect_list` + post-hoc size filter, the BUFFER is
    * bounded: once a group overflows, accumulation stops and the array is freed, so
    * a pathological hot key (a boilerplate shingle present in millions of documents)
    * costs O(cap) memory instead of an executor OOM. Output is ascending-sorted.
    */
  final case class BoundedBuf(var vs: Array[Long], var cnt: Int, var over: Boolean)

  class BoundedSortedCollect(cap: Int)
      extends Aggregator[java.lang.Long, BoundedBuf, Array[Long]] {
    require(cap >= 1, "BoundedSortedCollect cap must be >= 1")

    override def zero: BoundedBuf = BoundedBuf(Array.empty, 0, over = false)

    override def reduce(b: BoundedBuf, x: java.lang.Long): BoundedBuf = {
      if (b.over || x == null) return b
      if (b.cnt == cap) { b.vs = Array.empty; b.cnt = 0; b.over = true; return b }
      if (b.cnt == b.vs.length)
        b.vs = java.util.Arrays.copyOf(b.vs, math.min(math.max(4, b.vs.length * 2), cap))
      b.vs(b.cnt) = x.longValue
      b.cnt += 1
      b
    }

    override def merge(a: BoundedBuf, b: BoundedBuf): BoundedBuf = {
      if (a.over || b.over || a.cnt + b.cnt > cap) {
        a.vs = Array.empty; a.cnt = 0; a.over = true; return a
      }
      val out = java.util.Arrays.copyOf(a.vs, a.cnt + b.cnt)
      System.arraycopy(b.vs, 0, out, a.cnt, b.cnt)
      a.vs = out
      a.cnt += b.cnt
      a
    }

    override def finish(b: BoundedBuf): Array[Long] =
      if (b.over) null
      else {
        val out = java.util.Arrays.copyOf(b.vs, b.cnt)
        java.util.Arrays.sort(out)
        out
      }

    override def bufferEncoder: Encoder[BoundedBuf] = Encoders.product[BoundedBuf]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** [[BoundedSortedCollect]] for ER posting lists: gathers up to `cap`
    * `(side, id, name)` records per blocking key, NULL once the group exceeds
    * the cap (the "block too hot to pair" rule, applied WITHOUT first paying a
    * separate count aggregation + join back). Same bounded-buffer guarantee:
    * an overflowing block frees its arrays and stops accumulating, so a hot
    * key costs O(cap) memory. Output is (side, id)-ascending so pair expansion
    * can emit `id_a < id_b` by position, mirroring [[BoundedSortedCollect]]'s
    * sorted contract.
    */
  final case class RecsBuf(
      var sides: Array[Int], var ids: Array[Long], var names: Array[String],
      var cnt: Int, var over: Boolean)

  class BoundedSortedCollectRecs(cap: Int)
      extends Aggregator[(java.lang.Integer, java.lang.Long, String), RecsBuf,
        Array[(Int, Long, String)]] {
    require(cap >= 1, "BoundedSortedCollectRecs cap must be >= 1")

    override def zero: RecsBuf =
      RecsBuf(Array.empty, Array.empty, Array.empty, 0, over = false)

    private def drop(b: RecsBuf): RecsBuf = {
      b.sides = Array.empty; b.ids = Array.empty; b.names = Array.empty
      b.cnt = 0; b.over = true
      b
    }

    override def reduce(
        b: RecsBuf, x: (java.lang.Integer, java.lang.Long, String)): RecsBuf = {
      if (b.over || x == null || x._2 == null) return b
      if (b.cnt == cap) return drop(b)
      if (b.cnt == b.ids.length) {
        val n = math.min(math.max(4, b.ids.length * 2), cap)
        b.sides = java.util.Arrays.copyOf(b.sides, n)
        b.ids = java.util.Arrays.copyOf(b.ids, n)
        b.names = java.util.Arrays.copyOf(b.names, n)
      }
      b.sides(b.cnt) = if (x._1 == null) 0 else x._1.intValue
      b.ids(b.cnt) = x._2.longValue
      b.names(b.cnt) = x._3
      b.cnt += 1
      b
    }

    override def merge(a: RecsBuf, b: RecsBuf): RecsBuf = {
      if (a.over || b.over || a.cnt + b.cnt > cap) return drop(a)
      val n = a.cnt + b.cnt
      val sides = java.util.Arrays.copyOf(a.sides, n)
      val ids = java.util.Arrays.copyOf(a.ids, n)
      val names = java.util.Arrays.copyOf(a.names, n)
      System.arraycopy(b.sides, 0, sides, a.cnt, b.cnt)
      System.arraycopy(b.ids, 0, ids, a.cnt, b.cnt)
      System.arraycopy(b.names, 0, names, a.cnt, b.cnt)
      a.sides = sides; a.ids = ids; a.names = names; a.cnt = n
      a
    }

    override def finish(b: RecsBuf): Array[(Int, Long, String)] =
      if (b.over) null
      else (0 until b.cnt).map(i => (b.sides(i), b.ids(i), b.names(i)))
        .sortBy(t => (t._1, t._2)).toArray

    override def bufferEncoder: Encoder[RecsBuf] = Encoders.product[RecsBuf]
    override def outputEncoder: Encoder[Array[(Int, Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Int, Long, String)]]()
  }

  /** Misra-Gries heavy-hitters sketch (Misra & Gries 1982; mergeable-summaries
    * merge per Agarwal et al. 2012): at most `k` (item, counter) entries per buffer,
    * guaranteeing every item with true frequency > N/(k+1) survives to the output
    * (undercount error ≤ N/(k+1), no false negatives above that bar). `reduce` is
    * the classic counter scheme (hit → +1; room → insert; full → decrement all);
    * `merge` sums counters and subtracts the (k+1)-th largest, which preserves the
    * error bound — so Spark's partial/final aggregation plan IS the mergeable
    * summaries construction, and the sketch state is bounded at k entries per
    * partition no matter how many distinct items stream through.
    *
    * The candidate SET can vary with merge order (like any MG summary); callers
    * wanting deterministic exact output recount candidates exactly —
    * [[graft.operators.Dedup.topNgramsBounded]] does, and documents the condition
    * under which that recount is provably the exact global top-K.
    */
  final case class MgBuf(var m: Map[String, Long])

  class MisraGries(k: Int) extends Aggregator[String, MgBuf, Array[String]] {
    require(k >= 1, "MisraGries needs at least one counter")

    override def zero: MgBuf = MgBuf(Map.empty)

    override def reduce(b: MgBuf, x: String): MgBuf = {
      if (x == null) return b
      b.m.get(x) match {
        case Some(c) => b.m = b.m.updated(x, c + 1L)
        case None if b.m.size < k => b.m = b.m.updated(x, 1L)
        case None =>
          b.m = b.m.collect { case (g, c) if c > 1L => g -> (c - 1L) }
      }
      b
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val comb = b.m.foldLeft(a.m) { case (m, (g, c)) =>
        m.updated(g, m.getOrElse(g, 0L) + c)
      }
      a.m =
        if (comb.size <= k) comb
        else {
          // subtract the (k+1)-th largest counter; ≤ k entries stay positive
          val cs = comb.values.toArray
          java.util.Arrays.sort(cs)
          val thr = cs(cs.length - 1 - k)
          comb.collect { case (g, c) if c > thr => g -> (c - thr) }
        }
      a
    }

    override def finish(b: MgBuf): Array[String] = {
      val out = b.m.keys.toArray
      java.util.Arrays.sort(out, Ordering[String])
      out
    }

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** Register both on the session (idempotent, like `GraftFunctions.register`). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("approx_percentile_cont_with_weight", udaf(new ApproxWeightedPercentile))
    spark.udf.register("nth_value_agg", udaf(new NthValueAgg))
  }
}
