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

    // warm
    docs.count()
    import graft.operators.Dedup
    time("d3 full")(Dedup.simHashNearDupNative(docs, "text", "doc_id", 3).count())
    time("d3 sig only")(Dedup.simHashSignaturesNative(docs, "text", "doc_id", 3, 60).count())
    time("d3 full warm")(Dedup.simHashNearDupNative(docs, "text", "doc_id", 3).count())
    time("d2 full")(Dedup.minHashNearDup(docs, "text", "doc_id").count())
    time("d2 sig only")(Dedup.minHashSignaturesNative(docs, "text", "doc_id").count())
    time("d2 lsh cands")(Dedup.lshCandidates(
      Dedup.minHashSignaturesNative(docs, "text", "doc_id")).count())
    time("d2 full warm")(Dedup.minHashNearDup(docs, "text", "doc_id").count())
    spark.stop()
  }
}
