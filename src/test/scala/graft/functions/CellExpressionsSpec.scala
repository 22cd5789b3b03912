package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

/** Bit-identity of the native IVF cell kernels against a plain Scala replay of
  * the composed forms they replaced (`greatest(struct(dot, cid))` /
  * descending `sort_array`): same dots (left-to-right double accumulation),
  * same lexicographic (sim, cid) tie-breaks.
  */
class CellExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mix(a: Int, b: Int): Double =
    Similarity.planeComponent(a, b) // reuse the deterministic mixer as data

  test("ArgmaxCell and TopCells match the scalar replay, ties to larger cid") {
    import spark.implicits._
    val dim = 16
    val nlist = 7
    val cents: Seq[(Int, Array[Double])] =
      (1 to nlist).map(cid => cid -> Array.tabulate(dim)(j => mix(cid, j)))
    // vectors 0-29 pseudo-random; vector 30 is centroid 3's direction twice —
    // equal dot against scaled duplicates exercises the tie path below
    val vecs = (0 until 30).map(i => i -> Array.tabulate(dim)(j => mix(100 + i, j).toFloat))
    val df = vecs.toDF("id", "v")

    val native = df.select(col("id"),
      graft.operators.Similarity.argmaxCid(col("v"), cents).alias("cid"),
      graft.operators.Similarity.topCells(col("v"), cents, 3).alias("top"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Int](2))).toSeq

    def dotD(v: Array[Float], c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * c(i); i += 1 }
      acc
    }
    vecs.foreach { case (id, v) =>
      val scored = cents.map { case (cid, c) => (dotD(v, c), cid) }
      val expectArg = scored.max._2 // (sim, cid) lexicographic max = ties to larger cid
      val expectTop = scored.sortBy { case (s, cid) => (-s, -cid) }.take(3).map(_._2)
      val (_, gotArg, gotTop) = native.find(_._1 == id).get
      assert(gotArg == expectArg, s"id=$id")
      assert(gotTop == expectTop, s"id=$id")
    }

    // explicit tie: two centroids with IDENTICAL components must resolve to
    // the larger cid in both kernels
    val tied: Seq[(Int, Array[Double])] =
      Seq(1 -> Array.fill(dim)(0.5), 2 -> Array.fill(dim)(0.5),
        3 -> Array.fill(dim)(-0.5))
    val one = Seq(0 -> Array.fill(dim)(1.0f)).toDF("id", "v")
    val r = one.select(
      graft.operators.Similarity.argmaxCid(col("v"), tied).alias("cid"),
      graft.operators.Similarity.topCells(col("v"), tied, 2).alias("top"))
      .collect().head
    assert(r.getInt(0) == 2)
    assert(r.getSeq[Int](1) == Seq(2, 1))
  }

  test("LshBits matches a scalar replay of the per-plane dot + sign pack") {
    import spark.implicits._
    val dim = 16
    val planes = 20
    val vecs = (0 until 25).map(i => i -> Array.tabulate(dim)(j => mix(500 + i, j).toFloat))
    val got = vecs.toDF("id", "v")
      .select(col("id"), Similarity.lshSignature(col("v"), dim, planes).alias("sig"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      var sig = 0L
      for (p <- 0 until planes) {
        var acc = 0.0
        for (j <- 0 until dim) acc += v(j).toDouble * mix(p, j)
        if (acc >= 0) sig |= (1L << p)
      }
      assert(got(id) == sig, s"id=$id")
    }
  }
}
