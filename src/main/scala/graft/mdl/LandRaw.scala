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
  * `"Total Price ($)"` lands as `total_price_`, queryable without quoting.
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
    * one `_`; leading underscores are stripped unless nothing else remains.
    * Empty or digit-leading results get a `c_` prefix so the output is always
    * a bare-queryable identifier.
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
    * inferSchema), `.json`, `.jsonl` (JSON-lines), each optionally
    * `.gz`/`.bz2`-compressed. Deterministic table order (sorted by name);
    * unrecognized files are skipped, an empty directory is an error.
    *
    * `disposition` is dlt's write-disposition contract for RE-landing into an
    * existing table (the incremental half of the connector loop):
    *   - `replace` (default): the batch becomes the table.
    *   - `append`: the batch's rows are added; schemas must match exactly
    *     (loud error on drift — silent schema evolution corrupts the draft).
    *   - `merge`: upsert by key — batch rows WIN on key collisions, untouched
    *     rows survive. Keys come from `mergeKeys` (`table -> column`, or the
    *     `"*"` entry for all tables); a merged table without a key is a loud
    *     error, exactly dlt's primary_key requirement. Cost model: one
    *     key-shuffled anti-join + a full rewrite of the table (the honest
    *     price of upsert-on-parquet; at warehouse scale you scope the merge
    *     to affected partitions). The rewrite stages into a sibling dir and
    *     swaps in (single-writer CLI contract; server-resident tables get
    *     zero-downtime swaps from the CommitPointer machinery instead).
    */
  def land(
      spark: SparkSession, rawDir: String, outDir: String,
      disposition: String = "replace",
      mergeKeys: Map[String, String] = Map.empty): Seq[Landed] = {
    require(Set("replace", "append", "merge")(disposition),
      s"ingest: unknown disposition '$disposition' (replace|append|merge)")
    val p = new org.apache.hadoop.fs.Path(rawDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"ingest: raw directory $rawDir does not exist")
    val files = fs.listStatus(p).toSeq.filter(_.isFile)
      .map(_.getPath).sortBy(_.getName)
    val landed = files.flatMap { f =>
      // compressed raw files are the common real-world shape: the format is
      // the extension UNDER the codec suffix (orders.csv.gz → csv) — Spark's
      // text sources decompress gz/bz2 transparently (pure-Java Hadoop
      // codecs; gz is non-splittable: one task per file, the standard price)
      val n0 = f.getName
      val codec = Seq(".gz", ".bz2").find(n0.toLowerCase.endsWith(_))
      val n = codec.fold(n0)(c => n0.dropRight(c.length))
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
          val dst = s"$outDir/$table.parquet"
          writeWith(spark, typed, table, dst, disposition, mergeKeys)
          // a re-land REPLACES files under dst: persisted Datasets over the
          // old listing are invalidated here; a deployed GraftSession holds
          // its own scan FileIndexes and must call `session.refresh()` after
          // a re-land (spec-pinned in GenerateMdlSpec)
          spark.catalog.refreshByPath(dst)
          val rows = spark.read.parquet(dst).count()
          Landed(table, fmt, rows, cols.size)
        }
      }
    }
    require(landed.nonEmpty,
      s"ingest: no .csv/.tsv/.json/.jsonl files directly under $rawDir")
    landed
  }

  private def writeWith(
      spark: SparkSession, batch: DataFrame, table: String, dst: String,
      disposition: String, mergeKeys: Map[String, String]): Unit = {
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs = dstPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(dstPath)
    def requireSameSchema(old: DataFrame): Unit = {
      val (a, b) = (old.schema.map(f => (f.name, f.dataType)),
        batch.schema.map(f => (f.name, f.dataType)))
      require(a == b,
        s"ingest: schema drift on '$table' — existing ${a.mkString(", ")} vs " +
          s"batch ${b.mkString(", ")}; re-land with --disposition replace " +
          "or fix the raw file")
    }
    disposition match {
      case _ if !exists =>
        batch.write.mode("overwrite").parquet(dst)
      case "replace" =>
        batch.write.mode("overwrite").parquet(dst)
      case "append" =>
        requireSameSchema(spark.read.parquet(dst))
        batch.write.mode("append").parquet(dst)
      case "merge" =>
        val key = mergeKeys.getOrElse(table, mergeKeys.getOrElse("*",
          throw new IllegalArgumentException(
            s"ingest: merge disposition needs a key for '$table' — pass " +
              s"--merge-key $table=<col> (or --merge-key <col> for all tables)")))
        val old = spark.read.parquet(dst)
        requireSameSchema(old)
        require(batch.columns.contains(key),
          s"ingest: merge key '$key' is not a column of '$table' " +
            s"(${batch.columns.mkString(", ")})")
        // batch wins: keep every batch row + old rows whose key the batch
        // does not carry (the left_anti shuffles on the key; AQE broadcasts
        // a small batch side)
        val merged = batch.union(
          old.join(batch.select(key).distinct(), Seq(key), "left_anti")
            .select(batch.columns.map(org.apache.spark.sql.functions.col): _*))
        // stage + swap: the merged frame READS `dst`, so it must be fully
        // materialized elsewhere before dst is replaced
        val tmp = s"$dst.__staging"
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
        merged.write.mode("overwrite").parquet(tmp)
        fs.delete(dstPath, true)
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dstPath),
          s"ingest: staging swap failed for $dst — data is intact at $tmp")
    }
  }
}
