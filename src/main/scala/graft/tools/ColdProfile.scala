package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Cold-start attribution probe (round-12 ask #5: adjudicate the cold-vs-warm
  * bench gap).
  *
  * BENCH_r12's gap decomposes as: 74.4 s total over 227 entries, of which
  * 64.9 s (87%) sits in the 27 entries with >1 s delta — each the FIRST run
  * of an operator family (first curation composite, first IVF-PQ, first
  * dup-spans, first cube/rollup, first per-dialect unparse plan, the
  * streaming harness); the median per-entry delta is 0.051 s. Hypothesis:
  * the first family run pays whole-stage-codegen compilation (janino) and
  * JVM JIT once, later same-family entries hit the code caches.
  *
  * This main measures it directly on the biggest offenders: fresh session,
  * per query it samples Spark's `CodegenMetrics` compile-time histogram and
  * the JVM's `CompilationMXBean` total JIT time before/after a COLD run and
  * again on a WARM re-run, printing wall/codegen/JIT attribution per run.
  *
  * Run: `sbt "runMain graft.tools.ColdProfile"` (quiet box; ~2 min).
  */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    def codegenMs: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    def classBytes: Long =
      org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_GENERATED_CLASS_BYTECODE_SIZE.getSnapshot.getValues.sum

    val targets = Seq(
      "p7_full_curation", "d10_dup_spans", "s5_ann_ivfpq", "p2_decontam",
      "q24_cube", "m34_unparse_strings_trino")

    println("query,run,wall_s,codegen_delta_ms,jit_delta_ms,gen_class_kb")
    targets.foreach { name =>
      for (run <- Seq("cold", "warm")) {
        spark.catalog.clearCache()
        val cg0 = codegenMs; val jit0 = jit.getTotalCompilationTime
        val cb0 = classBytes
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"$name,$run,$wall%.2f,${codegenMs - cg0},${jit.getTotalCompilationTime - jit0},${(classBytes - cb0) / 1024}")
      }
    }
    spark.stop()
  }
}
