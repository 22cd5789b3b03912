package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftEngine
import graft.queries.TpcH
import graft.semantics.Transliterate

/** Dump the 22 TPC-H queries rendered in the golden-only trio dialects and
  * passed through [[Transliterate]], for pre-flighting which (query, dialect)
  * combos execute in DuckDB — the pinned set becomes `tpch_qN_translit_<d>`
  * driver entries. Run:
  * `sbt "Test/runMain graft.tools.TpchTranslitDump <outDir> [sfDir]"`.
  */
object TpchTranslitDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "/tmp/tpch_translit"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val session = GraftEngine.deployOnDir(spark, TpcH.manifest, sfDir)
    val sources = TpcH.defs.map { case (n, (_, sql)) => (n, sql) }
    for ((n, sql) <- sources;
         d <- Seq("mysql", "bigquery", "oracle",
           "clickhouse", "snowflake", "mssql")) {
      try {
        val text = session.transformSql(sql, d)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$n.$d.sql"),
          Transliterate(d, text))
      } catch { case e: Exception =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$n.$d.refused"),
          String.valueOf(e.getMessage))
      }
    }
    // the duckdb rendering as the known-good comparator for the pre-flight
    for ((n, sql) <- sources) {
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$n.duckdb.sql"),
        session.transformSql(sql, "duckdb"))
      catch { case _: Exception => () }
    }
    println(s"[tpch-translit-dump] -> $outDir")
    spark.stop()
  }
}
