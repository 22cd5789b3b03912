package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Join-amplification audit for d4_ngram_jaccard / d13_containment (r16
  * verdict ask #5): quote the concrete cardinalities of every stage of the
  * prefix-filtered set-similarity join at the bench corpus, so "exploded rows
  * × exploded rows never meet" is a measured statement rather than a design
  * claim. For each operator it prints docs, shingle rows, distinct shingles,
  * the max shingle document frequency (the auto-dispatch driver), the prefix
  * index size, the candidate-pair count BEFORE verification, and the verified
  * match count — the amplification ratios are candidates/docs and
  * candidates/matches.
  *
  * Run: `sbt "runMain graft.tools.DedupAmplification"` (SPARK_GRAFT_SF_DIR).
  */
object DedupAmplification {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sets = Dedup.shingleHashSets(docs, "text", "doc_id", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = sets.count()
    val sh = sets.select(col("id"), explode(col("s")).alias("shingle"))
    val shRows = sh.count()
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).alias("__df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val distinctSh = dfreq.count()
    val maxDf = dfreq.agg(max(col("__df"))).head.getLong(0)
    println(f"[d4d13] corpus: docs=$nDocs shingleRows=$shRows " +
      f"distinctShingles=$distinctSh maxDf=$maxDf " +
      f"(maxDocFreq cap 1000 -> dispatch ${if (maxDf > 1000) "prefix" else "capped"})")
    // the capped path's pair expansion is Σ C(df,2) over shared shingles —
    // the rows the map-side transform emits BEFORE the (id_a,id_b) count agg
    val cappedPairs = dfreq.filter(col("__df") >= 2)
      .agg(sum(col("__df") * (col("__df") - 1) / 2)).head.get(0)
    println(s"[d4d13] capped-path expansion: sum C(df,2) = $cappedPairs pair " +
      s"rows map-side (bounded by cap^2/2 per shingle; never a shuffled join side)")

    def audit(name: String, threshold: Double, containment: Boolean): Unit = {
      val idx =
        if (containment) {
          // containment prefixes only the CONTAINED side; probe table is flat
          val c = Dedup.prefixContainmentCandidates(sets, threshold)
          val cn = c.count()
          val m = graft.operators.Dedup.containmentNearDup(docs, "text", "doc_id",
            n = 3, threshold = threshold).count()
          println(f"[d4d13] $name%-16s t=$threshold candidatePairs=$cn " +
            f"matches=$m candPerDoc=${cn.toDouble / nDocs}%.2f " +
            f"candPerMatch=${if (m > 0) f"${cn.toDouble / m}%.1f" else "-"}")
        } else {
          val pidx = Dedup.prefixIndex(sh, threshold).count()
          val c = Dedup.prefixJaccardCandidates(sh, threshold)
          val cn = c.count()
          val m = Dedup.ngramJaccardNearDup(docs, "text", "doc_id",
            n = 3, threshold = threshold).count()
          println(f"[d4d13] $name%-16s t=$threshold prefixIndexRows=$pidx " +
            f"(${pidx * 100.0 / shRows}%.1f%% of shingle rows) candidatePairs=$cn " +
            f"matches=$m candPerDoc=${cn.toDouble / nDocs}%.2f " +
            f"candPerMatch=${if (m > 0) f"${cn.toDouble / m}%.1f" else "-"}")
        }
      idx
    }
    audit("d4 jaccard", 0.5, containment = false)
    audit("d13 containment", 0.9, containment = true)
    spark.stop()
  }
}
