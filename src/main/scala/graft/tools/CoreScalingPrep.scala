package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes a 10× corpus for the CORE-SCALING comparison (r16 verdict ask
  * #8: the driver's 8-vs-32-core block at sf0.1 is fixed-overhead-dominated
  * and uninformative — ratios need entries that run seconds, not hundreds of
  * milliseconds). Writes `documents.parquet` (ten word-salted, id-shifted
  * copies — the ScaleSmoke plain×10 recipe) and `events.parquet` (ten
  * user/event-id-shifted copies) under the target dir; the caller symlinks
  * the remaining sf0.1 tables beside them and runs `graft.Bench` twice on the
  * dir with `SPARK_GRAFT_CPUS=32` and `=8`, `SPARK_GRAFT_ONLY=<heavy set>`.
  * Core-scaling ratios compare the SAME corpus under two core counts, so the
  * synthesis only needs to be deterministic, not shape-preserving.
  *
  * Run: `sbt "runMain graft.tools.CoreScalingPrep /tmp/graft_scale10"`.
  */
object CoreScalingPrep {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scale10")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def salted(k: Int): DataFrame =
      if (k == 0) docs
      else docs.select((col("doc_id") + k * 900000L).alias("doc_id"),
        regexp_replace(lower(col("text")), "([a-z0-9一-鿿]+)", "$1xx" + k)
          .alias("text"))
    (0 until copies).map(salted).reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val events = spark.read.parquet(s"$sfDir/events.parquet")
    def shifted(k: Int): DataFrame =
      if (k == 0) events
      else events
        .withColumn("user_id", col("user_id") + k * 10000000L)
        .withColumn("event_id", col("event_id") + k * 100000000L)
    (0 until copies).map(shifted).reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    println(s"[core-scaling prep] wrote ${copies}x documents+events under $out")
    spark.stop()
  }
}
