package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run one named `SparkEntry.queries` entry with timing, optionally
  * dumping the formatted physical plan. `runMain graft.RunOne <name> [sfDir] [--plan]`.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).filterNot(_.startsWith("--")).getOrElse("/root/testdata/sf0.1")
    val showPlan = args.contains("--plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("select count(*) from range(1000)").collect() // warm codegen path
    val fn = SparkEntry.queries(name)
    var last = 0L
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = System.nanoTime() - t0
      last = dt
      println(f"[$name] run$i: rows=$n time=${dt / 1e9}%.3f s")
    }
    if (showPlan) println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
