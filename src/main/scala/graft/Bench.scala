package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, file listing, shuffle service) outside the timings.
    try {
      spark.sql("select count(*) c from range(1000)").collect()
      spark.read.parquet(s"$sfDir/nation.parquet").count()
    } catch { case _: Throwable => }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Planning parity (BASELINE.md): warm manifest->plan latency per TPC-H query —
    // deploy once, then time analysis+optimization only (no execution), mirroring
    // the reference's transform_sql benchmark (wren-core/benchmarks/src/tpch/run.rs).
    val planningMs: Double = try {
      val session = GraftEngine.deployOnDir(spark, queries.TpcH.manifest, sfDir)
      val sqls = queries.TpcH.oracles.values.toSeq
      sqls.foreach(sql => session.query(sql).queryExecution.optimizedPlan) // warm
      val t0 = System.nanoTime()
      sqls.foreach(sql => session.query(sql).queryExecution.optimizedPlan)
      (System.nanoTime() - t0) / 1e6 / sqls.size
    } catch { case _: Throwable => -1.0 }
    val planningStr = "%.2f".formatLocal(java.util.Locale.ROOT, planningMs)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""planning_ms_per_query":$planningStr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
