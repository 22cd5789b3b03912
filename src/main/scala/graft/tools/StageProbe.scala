package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage-timing probe for iterating on operator plans (not part of the
  * engine surface; run via `runMain graft.tools.StageProbe`).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }

    import graft.operators.Dedup
    // warm
    docs.count()
    val shRaw = Dedup.shingles(docs, "text", "doc_id", 3)
    time("shingles")(shRaw.count())
    val sh = shRaw.select(col("id"), xxhash64(col("shingle")).alias("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sh persist+count")(sh.count())
    time("dfreq")(sh.groupBy("shingle").agg(count(lit(1))).count())
    val cands = Dedup.prefixJaccardCandidates(sh, 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("prefix candidates")(cands.count())
    val sets = Dedup.shingleHashSets(docs, "text", "doc_id", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets persist+count")(sets.count())
    time("verify sets")(Dedup.verifyJaccardSets(cands, sets, 0.5).count())
    time("verify")(Dedup.verifyJaccard(cands, sh, 0.5).count())
    time("old pairJaccard path")(
      Dedup.pairJaccard(sh, 1000).filter(col("jaccard") >= 0.5).count())
    // repeat warm
    time("prefix candidates warm")(Dedup.prefixJaccardCandidates(sh, 0.5).count())
    time("verify sets warm")(Dedup.verifyJaccardSets(cands, sets, 0.5).count())
    time("full new path warm")(Dedup.ngramJaccardNearDup(docs, "text", "doc_id", 3, 0.5).count())
    time("old path warm")(
      Dedup.pairJaccard(sh, 1000).filter(col("jaccard") >= 0.5).count())
    time("full new path warm2")(Dedup.ngramJaccardNearDup(docs, "text", "doc_id", 3, 0.5).count())
    time("full new path warm3")(Dedup.ngramJaccardNearDup(docs, "text", "doc_id", 3, 0.5).count())
    val sets2 = Dedup.shingleHashSets(docs, "text", "doc_id", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sets2.count()
    val sh2 = sets2.select(col("id"), explode(col("s")).alias("shingle"))
    time("cands from sets warm")(Dedup.prefixJaccardCandidates(sh2, 0.5).count())
    time("verify from sets warm")(Dedup.verifyJaccardSets(
      Dedup.prefixJaccardCandidates(sh2, 0.5), sets2, 0.5).count())
    spark.stop()
  }
}
