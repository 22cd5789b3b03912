package graft.mdl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-file landing for the onboarding loop — the in-sandbox analogue of the
  * reference's dlt connector step (`skills/wren-dlt-connector/SKILL.md`:
  * extract SaaS/raw data into a typed local store, then auto-generate the
  * project). The network half is sandbox-inherent; this is the landing half:
  * a directory of CSV / TSV / JSON(-lines) files becomes one TYPED parquet
  * table per file, ready for [[GenerateMdl.fromParquetDir]] and a manifest
  * deploy — `ContextCli ingest` chains all three.
  *
  * Normalization mirrors dlt's naming convention: table and column names are
  * lowercased, non-identifier characters collapse to `_`, and post-collapse
  * collisions get a deterministic numeric suffix — so a header like
  * `"Total Price ($)"` lands as `total_price__`, queryable without quoting.
  *
  * Scale shape: the readers are Spark's distributed CSV/JSON sources, so the
  * landing pass parallelizes per input split like any scan; schema inference
  * costs one extra read of each file (the standing price of typed landing —
  * a 100 TB ingest would pass explicit schemas instead, which the reader
  * options accept upstream of this helper).
  */
object LandRaw {

  final case class Landed(table: String, format: String, rows: Long, cols: Int)

  /** dlt-style identifier normalization: lowercase, non `[a-z0-9_]` runs →
    * one `_`. Returns `c` for an all-symbol name so the result is never empty.
    */
  def sanitize(name: String): String = {
    val s = name.toLowerCase.replaceAll("[^a-z0-9_]+", "_")
    val t = s.dropWhile(_ == '_') match { case "" => s; case x => x }
    if (t.isEmpty || t.head.isDigit) s"c_$t" else t
  }

  private def dedup(names: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    names.map { n =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      if (k == 0) n else s"${n}_${k + 1}"
    }
  }

  /** Land every recognized raw file directly under `rawDir` as
    * `outDir/<table>.parquet`. Recognized: `.csv`, `.tsv` (header +
    * inferSchema), `.json`, `.jsonl` (JSON-lines). Deterministic table order
    * (sorted by name); unrecognized files are skipped, an empty directory is
    * an error.
    */
  def land(spark: SparkSession, rawDir: String, outDir: String): Seq[Landed] = {
    val p = new org.apache.hadoop.fs.Path(rawDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"ingest: raw directory $rawDir does not exist")
    val files = fs.listStatus(p).toSeq.filter(_.isFile)
      .map(_.getPath).sortBy(_.getName)
    val landed = files.flatMap { f =>
      val n = f.getName
      val dot = n.lastIndexOf('.')
      if (dot <= 0) None
      else {
        val (stem, ext) = (n.substring(0, dot), n.substring(dot + 1).toLowerCase)
        val df: Option[(DataFrame, String)] = ext match {
          case "csv" => Some((spark.read
            .option("header", "true").option("inferSchema", "true")
            .csv(f.toString), "csv"))
          case "tsv" => Some((spark.read
            .option("header", "true").option("inferSchema", "true")
            .option("sep", "\t").csv(f.toString), "tsv"))
          case "json" | "jsonl" =>
            Some((spark.read.json(f.toString), ext))
          case _ => None
        }
        df.map { case (raw, fmt) =>
          val table = sanitize(stem)
          val cols = dedup(raw.columns.toSeq.map(sanitize))
          val typed = raw.toDF(cols: _*)
          typed.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
          val rows = spark.read.parquet(s"$outDir/$table.parquet").count()
          Landed(table, fmt, rows, cols.size)
        }
      }
    }
    require(landed.nonEmpty,
      s"ingest: no .csv/.tsv/.json/.jsonl files directly under $rawDir")
    landed
  }
}
