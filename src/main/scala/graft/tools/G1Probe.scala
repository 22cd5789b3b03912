package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Round-15 #3 adjudication probe: g1_pagerank read 21.9 s ISOLATED vs 4.2 s
  * co-scheduled in r14's driver bench (same JVM, plan unchanged and
  * plan-pinned). The loop is checkpoint-snapped — each iteration is exactly
  * one job (the localCheckpoint materialization) — so a per-JOB wall
  * breakdown localizes where an isolated rerun's time goes: a slow first
  * job = cold scan/codegen, uniformly slow iterations = environment
  * throttling, one slow iteration = a checkpoint/GC stall.
  *
  * Protocol mirrors Bench's isolated phase exactly (clearCache + System.gc +
  * 2 s settle, then warm pass + 3 timed runs), with a job-level listener and
  * the tpch_q6 sentinel read before/after so environment throttling is
  * separable from real cost. Findings land in BENCH_TREND.md.
  */
object G1Probe {
  final class JobMeter extends SparkListener {
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    override def onJobStart(js: SparkListenerJobStart): Unit =
      jobs.put(js.jobId, (js.time, 0L))
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val st = Option(jobs.get(je.jobId)).map(_._1).getOrElse(je.time)
      jobs.put(je.jobId, (st, je.time))
    }
    def reset(): Unit = jobs.clear()
    def durationsMs: Seq[(Int, Long)] = {
      import scala.jdk.CollectionConverters._
      jobs.asScala.toSeq.sortBy(_._1)
        .map { case (id, (s, e)) => (id, math.max(0L, e - s)) }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val g1 = SparkEntry.queries("g1_pagerank")
    val q6 = SparkEntry.queries("tpch_q6")
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double = {
      val ws = Seq.fill(3)(once(q6)).sorted; ws(1)
    }
    // co-scheduled-ish warm context: a few other families touch the JVM first,
    // then g1 warm samples (the bench's interleaved regime, abbreviated)
    Seq("tpch_q6", "q1_agg", "er1_fuzzy_pairs").foreach(n =>
      once(SparkEntry.queries(n)))
    val coMeds = Seq.fill(3)(once(g1))
    println(f"[g1probe] co-scheduled-ish walls: ${coMeds.map(w => f"$w%.2f").mkString(", ")} s")
    println(f"[g1probe] sentinel before isolated: ${sentinel()}%.3f s")

    // the bench's isolated protocol, instrumented per job
    val meter = new JobMeter
    spark.sparkContext.addSparkListener(meter)
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)
    once(g1) // warm pass outside the timing, as isolatedTotal does
    for (run <- 1 to 3) {
      meter.reset()
      val w = once(g1)
      org.apache.spark.sql.graft.Bridge.drainListenerBus(spark)
      val js = meter.durationsMs
      println(f"[g1probe] isolated run $run: wall $w%.2f s; " +
        s"${js.size} jobs: ${js.map { case (id, ms) => s"#$id=${ms}ms" }.mkString(" ")}")
    }
    println(f"[g1probe] sentinel after isolated: ${sentinel()}%.3f s")
    spark.stop()
  }
}
