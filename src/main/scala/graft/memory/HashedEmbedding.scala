package graft.memory

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Deterministic hashed bag-of-words embeddings for the schema/query memory.
  *
  * The reference embeds with a sentence-transformers model
  * (`wren/src/wren/memory/embeddings.py:11-26`) — a float weight file this
  * engine neither ships nor needs: memory retrieval only has to rank schema
  * items and past queries by lexical affinity to a question. The hashed
  * feature map (token → md5-derived bucket, vector = bucket counts) is the
  * classic "hashing trick" — RNG-free and bit-identical on ANY engine that
  * has md5, so retrieval rankings are cross-engine REPLAYABLE (the DuckDB
  * oracle re-derives them from the raw texts; see the `m29_memory_context` /
  * `m30_memory_recall` driver entries in [[graft.queries.Memory]]).
  *
  * Both representations below are the SAME embedding:
  *  - [[embedCol]] materializes the dense `array<double>` count vector
  *    (dim buckets) — the form the ANN stack consumes ([[graft.operators.Similarity]]);
  *  - [[bucketCounts]] keeps the sparse (id, bucket, cnt) relation — the
  *    form retrieval joins against, one shuffle per corpus however large.
  * Cosine over the dense vectors ≡ dot/√(Σq²·Σi²) over the sparse counts;
  * EmbeddingSpec pins the equivalence.
  */
object HashedEmbedding {

  /** Default vector dimension (bucket count). 256 keeps the dense form small
    * while collisions stay harmless for ranking (counts add, never cancel).
    */
  val DefaultDim = 256

  // ── Tokenization (identical in Spark, Scala, and the DuckDB replay) ──

  /** Lowercase word tokens: split on runs of non-alphanumerics, drop empties.
    * ASCII-only class so every engine's regex flavor agrees byte-for-byte.
    */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** Token → bucket: the repo's portable 60-bit md5 hash mod dim (same
    * arithmetic as [[Dedup.md5Hash60]]; DuckDB replay:
    * `('0x' || substr(md5(t),1,15))::BIGINT % dim`).
    */
  def bucketCol(token: Column, dim: Int): Column =
    Dedup.md5Hash60(token) % dim

  def bucket(token: String, dim: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString // 16 hex chars; we need 15
    (java.lang.Long.parseLong(hex.take(15), 16) % dim).toInt
  }

  /** Driver-side sparse embedding of one query string: bucket → count. */
  def embed(text: String, dim: Int = DefaultDim): Map[Int, Long] =
    tokens(text).groupBy(bucket(_, dim)).map { case (b, ts) => b -> ts.size.toLong }

  /** Sum of squared counts — the squared L2 norm of [[embed]]. */
  def norm2(weights: Map[Int, Long]): Long =
    weights.valuesIterator.map(w => w * w).sum

  /** Dense `array<double>` hashed count vector of a text column — the exact
    * dense form of [[bucketCounts]] (per-row expression, no shuffle; memory
    * texts are short so the dim × tokens scan stays trivial).
    */
  def embedCol(text: Column, dim: Int = DefaultDim): Column = {
    val buckets = transform(tokensCol(text), t => bucketCol(t, dim))
    transform(sequence(lit(0), lit(dim - 1)),
      i => size(filter(buckets, b => b === i)).cast("double"))
  }

  /** Sparse (keyCols*, bucket, cnt) counts of `textCol` — one explode + one
    * aggregation, the corpus-side half of a retrieval scoring join.
    */
  def bucketCounts(df: DataFrame, textCol: String, keyCols: Seq[String],
      dim: Int = DefaultDim): DataFrame =
    df.select(keyCols.map(col) :+ explode(tokensCol(col(textCol))).alias("__tok"): _*)
      .select(keyCols.map(col) :+ bucketCol(col("__tok"), dim).alias("__bucket"): _*)
      .groupBy(keyCols.map(col) :+ col("__bucket"): _*)
      .agg(count(lit(1)).alias("__cnt"))

  /** Score every row of `df` against a query string: exact integer dot
    * product and squared norm per key — `score = dot² / (norm2 · qnorm2)`
    * is monotone in cosine (counts are non-negative) and every term is an
    * exact long, so downstream ordering is engine-independent. Rows sharing
    * no bucket with the query are ABSENT (dot would be 0) — a deliberate
    * divergence from the reference's dense vector search, which always
    * returns the k nearest even at zero lexical overlap
    * (`wren/src/wren/memory/store.py:258-273`); for a lexical embedding a
    * zero-overlap neighbor is noise, not context (MemoryStoreSpec pins the
    * empty-result behavior). The query-side
    * weights broadcast; the corpus side aggregates once — the
    * [[graft.operators.Curation.seedAffinityScores]] shape.
    */
  def scoreAgainst(df: DataFrame, textCol: String, keyCols: Seq[String],
      query: String, dim: Int = DefaultDim): DataFrame = {
    val spark = df.sparkSession
    val qw = embed(query, dim).toSeq.map { case (b, w) => (b.toLong, w) }
    val qdf = spark.createDataFrame(qw).toDF("__bucket", "__qw")
    val counts = bucketCounts(df, textCol, keyCols, dim)
    val norms = counts.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt") * col("__cnt")).alias("norm2"))
    val dots = counts.join(broadcast(qdf), Seq("__bucket"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt") * col("__qw")).alias("dot"))
    dots.join(norms, keyCols)
      .withColumn("score",
        (col("dot") * col("dot")).cast("double") / col("norm2").cast("double") /
          lit(math.max(norm2(embed(query, dim)), 1L).toDouble))
  }
}
