package graft.memory

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the equivalence [[HashedEmbedding]]'s docstring promises: the dense
  * `embedCol` vector and the sparse `bucketCounts` relation are the SAME
  * embedding (cosine over the dense arrays ≡ dot²/(norm2·qnorm2) over the
  * sparse counts), the driver-side `embed`/`bucket` agree with the Spark
  * expressions, and the documented edge semantics hold (empty text → zero
  * vector; zero lexical overlap → row absent from `scoreAgainst`).
  */
class EmbeddingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import HashedEmbedding._

  private val corpus = Seq(
    (1L, "Total price of customer orders, grouped by market segment."),
    (2L, "Column 'o_totalprice' (double) in model 'm_orders'."),
    (3L, "nation — a region's member; joins region on n_regionkey."),
    (4L, "zzz qqq xxx"), // shares no token with any query below
    (5L, "")) // empty text: no tokens at all

  private def corpusDf = {
    import spark.implicits._
    corpus.toDF("id", "text")
  }

  test("driver-side tokens/bucket/embed agree with the Spark expressions") {
    val rows = corpusDf
      .select(col("id"), tokensCol(col("text")).alias("toks"),
        embedCol(col("text")).alias("vec"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getSeq[String](1), r.getSeq[Double](2))).toMap
    corpus.foreach { case (id, text) =>
      val (sparkToks, vec) = rows(id)
      assert(sparkToks == tokens(text), s"tokens diverge for id=$id")
      assert(vec.size == DefaultDim)
      val dense = embed(text).map { case (b, w) => b -> w.toDouble }
      vec.zipWithIndex.foreach { case (v, i) =>
        assert(v == dense.getOrElse(i, 0.0), s"bucket $i of id=$id")
      }
    }
    // bucket (Scala md5 arithmetic) vs bucketCol (Dedup.md5Hash60 % dim)
    val toks = corpus.flatMap(c => tokens(c._2)).distinct
    import spark.implicits._
    val bk = toks.toDF("t").select(col("t"), bucketCol(col("t"), DefaultDim).alias("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.foreach(t => assert(bk(t) == bucket(t, DefaultDim), s"bucket('$t')"))
  }

  test("sparse scoreAgainst == cosine² over the dense embedCol vectors") {
    val query = "total customer orders by segment"
    val scored = scoreAgainst(corpusDf, "text", Seq("id"), query)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("dot"), r.getAs[Long]("norm2"), r.getAs[Double]("score"))).toMap

    // dense side: plain linear algebra over the materialized vectors
    val dense = corpusDf.select(col("id"), embedCol(col("text")).alias("v"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[Double](1)).toMap
    val qv = {
      val m = embed(query)
      (0 until DefaultDim).map(i => m.getOrElse(i, 0L).toDouble)
    }
    val qn = qv.map(x => x * x).sum
    corpus.map(_._1).foreach { id =>
      val v = dense(id)
      val dot = v.zip(qv).map { case (a, b) => a * b }.sum
      val n2 = v.map(x => x * x).sum
      if (dot == 0.0) {
        // inner bucket join: zero-overlap rows are ABSENT, not zero-scored
        assert(!scored.contains(id), s"id=$id should be absent")
      } else {
        val (sdot, sn2, score) = scored(id)
        assert(sdot.toDouble == dot && sn2.toDouble == n2)
        val cos = dot / math.sqrt(n2) / math.sqrt(qn)
        assert(math.abs(score - cos * cos) < 1e-12,
          s"id=$id: score=$score vs cos²=${cos * cos}")
      }
    }
    // ranking by score is ranking by cosine (monotone for non-negative counts)
    assert(scored.nonEmpty)
  }

  test("edge semantics: empty text, no-overlap query, norm2 never zero in results") {
    // empty text → all-zero dense vector
    val zeroVec = corpusDf.filter(col("id") === 5L)
      .select(embedCol(col("text"))).head.getSeq[Double](0)
    assert(zeroVec.forall(_ == 0.0))
    // bucketCounts has no rows for it (explode of an empty token array)
    val bc = bucketCounts(corpusDf, "text", Seq("id"))
    assert(bc.filter(col("id") === 5L).count() == 0)
    // a query sharing no token with the corpus returns the EMPTY result
    assert(scoreAgainst(corpusDf, "text", Seq("id"), "wwwww vvvvv").count() == 0)
    // surviving rows always carry positive norms (no divide-by-zero)
    val all = scoreAgainst(corpusDf, "text", Seq("id"), "customer orders region")
      .collect()
    assert(all.nonEmpty && all.forall(_.getAs[Long]("norm2") > 0))
  }

  test("bucket arithmetic is the documented DuckDB replay (md5-60bit % dim)") {
    // the exact arithmetic the m29/m30 oracles re-derive engine-side
    val t = "orders"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString.take(15)
    assert(bucket(t, DefaultDim) == (java.lang.Long.parseLong(hex, 16) % DefaultDim).toInt)
  }
}
