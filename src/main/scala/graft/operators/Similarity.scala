package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column (`array<float>`).
  *
  * Two paths: brute-force cosine top-k as the exactness baseline, and an
  * LSH-bucketed (random-hyperplane) variant as the 100 TB scale path — signatures
  * turn the O(|Q|·|C|) cross join into per-bucket joins; multi-probe keeps recall.
  * The dot product is a sequential `aggregate` fold over `zip_with`, i.e. a codegen'd
  * expression with deterministic left-to-right double accumulation (no UDF).
  */
object Similarity {

  /** Sequential-fold dot product of two equal-length vector columns (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query against every corpus row, ranked per query.
    * Broadcast the (small) query side so the corpus streams map-side; the only wide
    * operation is the per-query top-k window.
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qv")))
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("cv"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk").cast("int").alias("rk"))
  }

  /** Deterministic pseudo-random hyperplanes: component (p, j) derived from a
    * splitmix64-style integer mix of the indices (stable across runs and engines —
    * no RNG state involved).
    */
  private def planeComponent(p: Int, j: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane signature: `planes` sign bits packed into a long. */
  def lshSignature(vec: Column, dim: Int, planes: Int = 16): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(j => lit(planeComponent(p, j))): _*)
      when(dot(vec, plane) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: join query and corpus rows sharing a signature bucket
    * (multi-probe: the exact bucket plus all 1-bit flips), rank within candidates by
    * exact cosine. Recall < 1 by construction; scale path for when brute force is
    * impossible.
    */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      planes: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = lshSignature(col(vecCol), dim, planes)
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("cv"),
      sig.alias("bucket"))
    // multi-probe: original bucket + every 1-bit flip
    val probes = array((lit(0L) +: (0 until planes).map(p => shiftleft(lit(1L), p))): _*)
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qv"), sig.alias("qsig"))
      .withColumn("bucket", explode(transform(probes, m => col("qsig").bitwiseXOR(m))))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .distinct()
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk").cast("int").alias("rk"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold) via LSH
    * buckets + exact verification.
    */
  def cosineNearDup(
      df: DataFrame, threshold: Double, dim: Int, planes: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = lshSignature(col(vecCol), dim, planes)
    val base = df.select(col(idCol).alias("id"), col(vecCol).alias("v"), sig.alias("sig"))
    val probes = array((lit(0L) +: (0 until planes).map(p => shiftleft(lit(1L), p))): _*)
    val probed = base.withColumn("bucket", explode(transform(probes, m => col("sig").bitwiseXOR(m))))
    val a = probed.alias("a")
    val b = base.withColumnRenamed("sig", "bucket").alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").alias("id_a"), col("b.id").alias("id_b"),
        col("a.v").alias("va"), col("b.v").alias("vb"))
      .distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).alias("cos"))
  }
}
