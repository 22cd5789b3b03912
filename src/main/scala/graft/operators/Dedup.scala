package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash-LSH, SimHash,
  * and n-gram Jaccard. Every variant is a pure DataFrame pipeline (explode → hash →
  * groupBy/join), so at 100 TB the cost profile is explicit: one shuffle per groupBy,
  * band-bucket joins instead of O(n²) pairwise comparison, and candidate verification
  * only within buckets.
  */
object Dedup {

  /** Exact dedup: keep the lowest-`idCol` row per normalized-content fingerprint.
    * The shuffle key is the 32-char md5, not the document body, so shuffle volume is
    * bounded by row count, not corpus bytes.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val w = Window.partitionBy(fp).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles of the normalized text (distinct, as one row per shingle). */
  def shingles(df: DataFrame, textCol: String, idCol: String, n: Int = 3): DataFrame = {
    val words = filter(
      split(regexp_replace(lower(col(textCol)), "[^a-z0-9一-鿿 ]", " "), "\\s+"),
      w => length(w) > 0)
    val grams = filter(
      transform(sequence(lit(0), greatest(size(words) - n, lit(0))),
        i => when(size(words) >= n, concat_ws(" ", slice(words, i + 1, lit(n))))),
      g => g.isNotNull && length(g) > 0)
    df.select(col(idCol).alias("id"), explode(array_distinct(grams)).alias("shingle"))
  }

  /** MinHash signatures: k independent permutations approximated by seeded xxhash64;
    * one aggregation produces all k min-hashes (single shuffle by document id).
    */
  def minHashSignatures(sh: DataFrame, k: Int = 32): DataFrame = {
    val mins = (0 until k).map(i =>
      min(xxhash64(col("shingle"), lit(i))).alias(s"mh_$i"))
    sh.groupBy(col("id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: split the k-wide signature into `bands` bands of k/bands rows; docs
    * sharing any band hash are candidates. Band-bucket self-join replaces the O(n²)
    * scan — the classic shingle→minhash→band→bucket-join pipeline.
    */
  def lshCandidates(sig: DataFrame, k: Int = 32, bands: Int = 16): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).alias("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*).alias("h"))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).alias("bh"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").alias("id_a"), col("b.id").alias("id_b"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs over their shingle sets; only
    * candidate pairs are scored (buckets keep this linear-ish, not O(n²)).
    */
  def verifyJaccard(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sets = sh.groupBy(col("id")).agg(collect_set(col("shingle")).alias("s"))
    cands
      .join(sets.select(col("id").alias("id_a"), col("s").alias("sa")), "id_a")
      .join(sets.select(col("id").alias("id_b"), col("s").alias("sb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("uni", size(array_union(col("sa"), col("sb"))).cast("double"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification. */
  def minHashNearDup(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, k: Int = 32, bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    val sh = shingles(df, textCol, idCol, n)
    val cands = lshCandidates(minHashSignatures(sh, k), k, bands)
    verifyJaccard(cands, sh, threshold)
  }

  /** Inverted-index n-gram Jaccard near-dup: candidate pairs share at least one
    * non-common shingle (document-frequency cap `maxDocFreq` is the rare-shingle
    * blocking that keeps hot shingles from exploding the candidate join at scale),
    * then exact-Jaccard verification. With a generous cap this is exact for any
    * realistic threshold ≥ 0.5.
    */
  def ngramJaccardNearDup(
      df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDocFreq: Int = 100): DataFrame = {
    val sh = shingles(df, textCol, idCol, n)
    val rare = sh.groupBy(col("shingle")).agg(count(lit(1)).alias("df"))
      .filter(col("df") <= maxDocFreq && col("df") >= 2)
    val shRare = sh.join(broadcast(rare.select("shingle")), "shingle")
    val a = shRare.alias("a")
    val b = shRare.alias("b")
    val cands = a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").alias("id_a"), col("b.id").alias("id_b"))
      .distinct()
    verifyJaccard(cands, sh, threshold)
  }

  /** 64-bit SimHash per document: sign-sum of per-shingle hash bits. Computed with one
    * explode + one groupBy (bit counting via 64 conditional sums kept in codegen).
    */
  def simHash(sh: DataFrame): DataFrame = {
    val h = xxhash64(col("shingle"))
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(h, i).bitwiseAND(1) === 1, 1).otherwise(-1)).alias(s"b_$i"))
    val sums = sh.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map(i =>
      when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.alias("simhash"))
  }

  /** SimHash near-dup: band the 64-bit signature into 4×16-bit chunks (any equal chunk
    * → candidate, guaranteeing recall for hamming distance ≤ 3), then verify by exact
    * hamming distance.
    */
  def simHashNearDup(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = simHash(shingles(df, textCol, idCol))
    val chunks = (0 until 4).map(i =>
      struct(lit(i).alias("c"),
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFF).alias("v")))
    val banded = sig.select(col("id"), col("simhash"), explode(array(chunks: _*)).alias("ch"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val pairs = a.join(b, col("a.ch") === col("b.ch") && col("a.id") < col("b.id"))
      .select(
        col("a.id").alias("id_a"), col("b.id").alias("id_b"),
        col("a.simhash").alias("sh_a"), col("b.simhash").alias("sh_b"))
      .distinct()
    pairs
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").alias("hamming"))
  }
}
