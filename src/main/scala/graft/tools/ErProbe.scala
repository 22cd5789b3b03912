package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.EntityResolution
import graft.queries.GraphEr

/** Phase-level wall breakdown of `er4_incremental_link` (r16 verdict ask #4:
  * at 5.7 s it is the heaviest non-harness entry). The entry's phases each
  * end in an EAGER materialization (localCheckpoint / the CC probe collect),
  * so timing between those boundaries attributes the wall exactly; phases
  * replicate the entry's code 1:1 (GraphEr.scala `er4_incremental_link`).
  *
  * Run: `sbt "runMain graft.tools.ErProbe"` (SPARK_GRAFT_SF_DIR as usual).
  */
object ErProbe {
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
    val meter = new SmokeMeter
    spark.sparkContext.addSparkListener(meter)

    def phased(run: Int): Unit = {
      val t = new java.util.ArrayList[(String, Double, Long)]()
      var t0 = System.nanoTime()
      def mark(label: String): Unit = {
        org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
        t.add((label, (System.nanoTime() - t0) / 1e9, meter.total.get))
        meter.reset()
        t0 = System.nanoTime()
      }
      spark.catalog.clearCache()
      meter.reset()
      t0 = System.nanoTime()

      val recs = GraphEr.erRecords(spark, sfDir)
      recs.count() // erRecords' snap is eager; count just exposes its wall
      mark("erRecords snap")
      val evens = recs.filter(col("id") % 2 === 0)
      val odds = recs.filter(col("id") % 2 =!= 0)
      val catalog = EntityResolution.canonicalEntities(evens, "name", "id",
          maxDist = 2, maxBlock = 500)
        .filter(col("id") === col("entity_id"))
        .select(col("id"), col("name"))
        .localCheckpoint()
      mark("wave1 canonical(evens) + catalog snap")
      val (assigned, _) = EntityResolution.incrementalLink(odds, catalog,
        "name", "id", maxDist = 2, maxBlock = 500)
      mark("incrementalLink eager part (links+fresh snaps)")
      assigned.orderBy("id").write.format("noop").mode("overwrite").save()
      mark("final union + sort + noop")

      import scala.jdk.CollectionConverters._
      val total = t.asScala.map(_._2).sum
      println(f"[er4 probe] run $run total=$total%6.2f s")
      t.asScala.foreach { case (l, s, b) =>
        println(f"[er4 probe]   $l%-45s $s%6.2f s  shuffle=${b / 1e6}%7.1f MB")
      }
    }
    (1 to 3).foreach(phased)
    spark.stop()
  }
}
