package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler for warm planning latency (not part of the driver contract). */
object PlanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-planprofile").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val session = GraftEngine.deployOnDir(spark, queries.TpcH.manifest, sfDir)
    val sqls = queries.TpcH.oracles.values.toSeq

    def time(what: String)(f: => Unit): Unit = {
      f // warm
      f
      val t0 = System.nanoTime()
      var i = 0
      while (i < 3) { f; i += 1 }
      println(f"$what%-28s ${(System.nanoTime() - t0) / 1e6 / 3 / sqls.size}%8.2f ms/query")
    }

    val parser = spark.sessionState.sqlParser
    time("parse")(sqls.foreach(parser.parsePlan))
    time("parse+analyze")(sqls.foreach(sql => spark.sql(sql)))
    time("parse+analyze+optimize")(sqls.foreach(sql => spark.sql(sql).queryExecution.optimizedPlan))
    time("full session.query")(sqls.foreach(sql => session.query(sql).queryExecution.optimizedPlan))
    spark.stop()
  }
}
