package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named SparkEntry queries to files — the
  * plan-evidence capture behind `plans/r*`'s before/after pairs (ad-hoc tool,
  * not part of the engine surface).
  *
  * Usage: `runMain graft.tools.PlanDump <outDir> <entry>[,<entry>...]`
  * Session config mirrors graft.Bench so the captured plans are the benched
  * plans (same AQE, shuffle-partition and parquet settings).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <entry>[,<entry>...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val names = args.drop(1).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
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
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown entry: $n"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"$n.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] $n -> ${outDir.resolve(s"$n.txt")}")
    }
    spark.stop()
  }
}
