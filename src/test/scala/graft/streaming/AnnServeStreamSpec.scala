package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Similarity

/** Streaming ANN serving against a persisted IVF-PQ index: two micro-batches
  * of query vectors must produce exactly what the batch `ivfPqQuery` returns
  * for the union of the batches (stateless per batch — nothing accumulates,
  * nothing is dropped).
  */
class AnnServeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("annServeStream answers micro-batches exactly like the batch query") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    def vec(seed: Int): Seq[Float] =
      (0 until 16).map(j => Similarity.planeComponent(seed, j).toFloat)
    val corpus = (1 to 120).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

    val work = java.nio.file.Files.createTempDirectory("graft_ann_serve_").toString
    val index = Similarity.buildIvfPq(corpus, dim = 16, nlist = 8, m = 4, ksub = 8)
    Similarity.saveIvfPq(index, s"$work/index")

    val src = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.annServeStream(
      src.toDF.toDF("vec_id", "embedding"),
      s"$work/index", s"$work/out", s"$work/ckpt",
      k = 3, nprobe = 3, rerank = 10)
    try {
      src.addData((1001L, vec(201)), (1002L, vec(202)))
      q.processAllAvailable()
      src.addData((1003L, vec(203)))
      q.processAllAvailable()
    } finally q.stop()

    val outRead = spark.read.parquet(s"$work/out")
    assert(outRead.columns.contains("batch_id")) // per-batch idempotent layout
    val streamed = outRead.drop("batch_id")
      .orderBy("query_id", "rk").collect().map(_.toString).toSeq
    val batch = Similarity.ivfPqQuery(
      Similarity.loadIvfPq(spark, s"$work/index"),
      Seq((1001L, vec(201)), (1002L, vec(202)), (1003L, vec(203)))
        .toDF("vec_id", "embedding"),
      k = 3, nprobe = 3, rerank = 10)
      .orderBy("query_id", "rk").collect().map(_.toString).toSeq
    assert(streamed == batch)
    assert(streamed.size == 9) // 3 queries × k=3

    graft.util.Fs.deleteTree(work)
  }

  test("appendIvfPq between micro-batches is picked up live (no restart)") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

    def vec(seed: Int): Seq[Float] =
      (0 until 16).map(j => Similarity.planeComponent(seed, j).toFloat)
    val corpus = (1 to 80).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val work = java.nio.file.Files.createTempDirectory("graft_ann_grow_").toString
    Similarity.saveIvfPq(
      Similarity.buildIvfPq(corpus, dim = 16, nlist = 8, m = 4, ksub = 8),
      s"$work/index")

    val src = MemoryStream[(Long, Seq[Float])]
    val q = EventStreams.annServeStream(
      src.toDF.toDF("vec_id", "embedding"),
      s"$work/index", s"$work/out", s"$work/ckpt",
      k = 1, nprobe = 8, rerank = 10)
    try {
      // batch 0: query IS vector 500's direction, but 500 is not indexed yet
      src.addData((2001L, vec(500)))
      q.processAllAvailable()
      Similarity.appendIvfPq(spark,
        s"$work/index", Seq((500L, vec(500))).toDF("vec_id", "embedding"))
      // batch 1: same query now self-matches the appended vector
      src.addData((2002L, vec(500)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(s"$work/out")
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    assert(out(2002L) == 500L, s"post-append batch must find the new vector: $out")
    assert(out(2001L) != 500L, "pre-append batch cannot have seen it")
    graft.util.Fs.deleteTree(work)
  }
}
