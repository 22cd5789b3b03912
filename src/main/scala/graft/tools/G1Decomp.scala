package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 #3/#6 diagnostic: decomposes g1_pagerank's 30×-decade wall into
  * (edge construction) vs (rank loop over pre-built edges) vs (full entry),
  * two timed runs each in one JVM. Finding (2026-08-16): identical work
  * swings ~5× run-to-run (edge count 9.0 → 51.3 s; broadcast-on loop 32.6 →
  * 158.2 s) with no code/data change — the r14 driver's isolated-phase
  * bimodality, reproduced locally and attributed to box-level volatility
  * (burst throttling), not the operator. SCALE_SMOKE.md's 30× table cites
  * this; wall comparisons go through Bench's `sentinel_relative` instead.
  */
object G1Decomp {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "96")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def evCopy(k: Int): DataFrame =
      if (k == 0) ev
      else ev.withColumn("user_id", col("user_id") + k * 1000000L)
        .withColumn("event_id", col("event_id") + k * 10000000L)
        .withColumn("event_type", concat(col("event_type"), lit("_x" + k)))
    val work = java.nio.file.Files.createTempDirectory("graft_g1d_").toString
    (0 until 30).map(evCopy).reduce(_ union _).repartition(96)
      .write.parquet(s"$work/ev30/events.parquet")
    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime(); val n = f
        println(f"[g1d] $label run$i: ${(System.nanoTime()-t0)/1e9}%.1f s (rows $n)")
      }
    }
    val b = graft.queries.Relational.normalizeEventTs(
        spark.read.parquet(s"$work/ev30/events.parquet"))
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", expr("timestamp_micros(ts div 1000)")).alias("h"))
    val hub = b.groupBy("event_type", "h").agg(min("user_id").alias("hub"))
    def edges = b.join(hub, Seq("event_type", "h"))
      .filter(col("user_id") =!= col("hub"))
      .select(col("user_id").alias("src"), col("hub").alias("dst")).distinct()
    time("edge construction only")(edges.count())
    edges.write.parquet(s"$work/edges")
    val flat = spark.read.parquet(s"$work/edges")
    time("rankLoop broadcast ON, pre-built edges")(
      graft.operators.GraphOps.pageRank(flat, 4).count())
    time("g1 entry (construction + loop, broadcast ON)")(
      graft.queries.GraphEr.queries("g1_pagerank")(spark, s"$work/ev30").count())
    graft.util.Fs.deleteTree(work)
    spark.stop()
  }
}
