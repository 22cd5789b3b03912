package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout utilities for the 100 TB path: skew-salted joins and bucketed
  * table layouts. AQE's skew-join splitting handles moderate skew at runtime; these
  * are for the cases the optimizer can't fix — a known ultra-hot key set (salting
  * beats AQE when one key alone exceeds executor memory) and repeated co-located
  * joins over the same key (bucketing removes the shuffle from every downstream
  * join, not just one).
  */
object ScaleLayout {

  /** Salted inner equi-join for skewed fact→dim joins: the fact side's key is salted
    * into `saltFactor` virtual keys, the (small, but not broadcastable) dim side is
    * replicated once per salt, so one hot key spreads over `saltFactor` tasks instead
    * of one straggler.
    */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String, saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only — the dim side is replicated per " +
        s"salt, so right/full outer would emit unmatched dim rows $saltFactor times")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write `df` as a bucketed+sorted managed table: downstream equi-joins and
    * aggregations on the bucket keys read co-located data and skip the exchange
    * entirely (verified in ScaleLayoutSpec by asserting a shuffle-free join plan).
    * The 100 TB contract: pick `buckets` so a bucket of the biggest table fits an
    * executor's memory (~total/buckets ≤ a few GB).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Repartition-and-sort layout for downstream merge-friendly consumption without a
    * catalog table (e.g. before writing partitioned parquet): one shuffle now, zero
    * in every reader that needs the same distribution.
    */
  def clustered(df: DataFrame, partitions: Int, keys: Seq[String]): DataFrame =
    df.repartition(partitions, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)

  // ---------------------------------------------------------------- z-order skipping

  /** Morton (Z-order) sort key over already-bucketed integer columns (each in
    * `[0, 2^bits)`): one `LongType` key whose sort order clusters rows close in
    * EVERY dimension — the layout under Delta/Iceberg `OPTIMIZE ZORDER BY`, here a
    * native codegen'd kernel ([[graft.functions.InterleaveBits]]) with generated
    * code size independent of `bits`.
    */
  def zorderKey(df: DataFrame, cols: Seq[Column], bits: Int = 16): Column = {
    val br = org.apache.spark.sql.graft.Bridge
    br.column(graft.functions.InterleaveBits(
      cols.map(c => br.toExpression(df.sparkSession, c)), bits))
  }

  /** Lay `df` out in Z-order: range-partition by the interleaved key into `files`
    * output files and sort within each, so every file covers a compact Z-curve
    * segment = a small box in every dimension. One shuffle to write; every
    * multi-dimensional box predicate afterwards prunes at FILE granularity via
    * [[writeIndexed]]'s min/max index — the scan cost becomes proportional to the
    * box, not the table.
    */
  def zorderLayout(df: DataFrame, cols: Seq[Column], files: Int, bits: Int = 16): DataFrame = {
    require(!df.columns.contains("__z"),
      "zorderLayout input must not carry a '__z' column (it is the layout's sort key)")
    val z = zorderKey(df, cols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Index rows key files by BASENAME (tables written here are flat — no
    * partitionBy dirs), so the index survives table relocation/rename: part-file
    * names embed a write-unique UUID.
    */
  private def fileBasename: Column =
    regexp_extract(input_file_name(), "[^/]+$", 0)

  /** Write `df` as parquet plus a per-file min/max index of `statCols` (numeric
    * columns), stored as parquet under `_graft_index` (underscore-prefixed, so
    * plain `spark.read.parquet(path)` ignores it). The index is built with ONE
    * distributed pass grouped by `input_file_name` — no driver-side state; its
    * size is one row per data file (a 100 TB table at 1 GB files is a 10^5-row
    * index, itself pruned-readable).
    */
  def writeIndexed(df: DataFrame, path: String, statCols: Seq[String]): Unit =
    writeIndexed(df, path, statCols, Nil)

  /** `indexExtra` appends literal columns to every index row (e.g. a stream's
    * `batch_id` commit tag); pruning ignores them.
    */
  def writeIndexed(df: DataFrame, path: String, statCols: Seq[String],
      indexExtra: Seq[(String, Column)]): Unit = {
    require(statCols.nonEmpty, "writeIndexed needs at least one stat column")
    df.write.mode(SaveMode.Overwrite).parquet(path)
    buildIndexRows(df.sparkSession.read.parquet(path), statCols, indexExtra)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_graft_index")
  }

  /** One index row per file of `src`: per-file min/max of every stat column
    * plus any extra literal columns — the single definition both the full
    * build and the incremental append write.
    */
  private def buildIndexRows(
      src: DataFrame, statCols: Seq[String],
      indexExtra: Seq[(String, Column)]): DataFrame = {
    val aggs = statCols.flatMap { c =>
      Seq(min(col(c).cast("double")).alias(s"min_$c"),
        max(col(c).cast("double")).alias(s"max_$c"))
    }
    indexExtra.foldLeft(
      src.groupBy(fileBasename.alias("file")).agg(aggs.head, aggs.tail: _*)) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
  }

  /** Append a batch to a [[writeIndexed]] table, extending the index with stats
    * for the NEW files only: the existing file set is read off the index (one
    * file-count-sized column), and the post-append listing is diffed against it,
    * so the stats pass scans just the appended data — an append to a 100 TB
    * table costs the batch, never a table rescan. Existing files are immutable
    * (parquet append writes new files), so their index rows stay valid.
    */
  def appendIndexed(df: DataFrame, path: String, statCols: Seq[String]): Unit =
    appendIndexed(df, path, statCols, Nil)

  def appendIndexed(df: DataFrame, path: String, statCols: Seq[String],
      indexExtra: Seq[(String, Column)]): Unit = {
    require(statCols.nonEmpty, "appendIndexed needs at least one stat column")
    val spark = df.sparkSession
    val known = spark.read.parquet(s"$path/_graft_index")
      .select("file").collect().map(_.getString(0)).toSet
    df.write.mode(SaveMode.Append).parquet(path)
    // File-LEVEL diff (a driver listing bounded by the file count, same bound as
    // readPruned's index collect), so the stats pass reads ONLY the new files —
    // an anti-join over input_file_name would scan the whole table to drop the
    // old rows.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Diff on basenames (the index stores basenames; part-file names embed a
    // UUID, unique per write).
    val newFiles = fs.listStatus(hPath).iterator
      .map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_")
        && !known.contains(p.getName))
      .map(_.toUri.toString)
      .toIndexedSeq
    if (newFiles.isEmpty) return
    buildIndexRows(spark.read.parquet(newFiles: _*), statCols, indexExtra)
      .write.mode(SaveMode.Append).parquet(s"$path/_graft_index")
  }

  /** Range-bucket a raw numeric column into `[0, buckets)` over a known
    * `[lo, hi]` envelope — the normalization step before [[zorderKey]]. Double
    * arithmetic: exact placement is irrelevant (the min/max index records TRUE
    * per-file envelopes, so read correctness never depends on bucketing), but
    * keys whose magnitude exceeds 2^53 (e.g. nanosecond epochs) should be
    * pre-scaled by the caller to keep buckets distinct.
    */
  def bucketize(c: Column, lo: Double, hi: Double, buckets: Int): Column = {
    val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
    least(greatest(
      floor((c.cast("double") - lit(lo)) * lit(buckets.toDouble) / lit(span * (1 + 1e-9)))
        .cast("long"), lit(0L)), lit((buckets - 1).toLong))
  }

  /** Re-cluster an indexed table in place: read, Z-order on `cols`, rewrite data
    * + index (Delta/Iceberg `OPTIMIZE ZORDER BY` for plain parquet). Streaming
    * appends keep per-BATCH locality ([[graft.streaming.StreamingCorpusSink
    * .indexedSinkStream]]) but eras interleave across files as batches accumulate;
    * a periodic optimize restores global clustering so box predicates prune to
    * the minimum file set again.
    *
    * MAINTENANCE OPERATION, single writer, no concurrent readers: plain parquet
    * has no metadata layer to version the swap, so there is a window between the
    * two renames where `path` does not exist, and a reader that listed files
    * before the swap can lose them — schedule it like any compaction downtime,
    * or put a transactional table format under the same two-phase shape. Every
    * rename/delete result is CHECKED: a failed swap rolls back to the original
    * layout and throws instead of proceeding to a delete that could destroy the
    * only copy. A leftover `path + ".old"` from a crashed run is rejected
    * loudly (it may hold the only good data — inspect, restore or remove it by
    * hand). One shuffle of the table, same cost class as any compaction.
    */
  def optimizeZorder(
      spark: org.apache.spark.sql.SparkSession, path: String, cols: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$path.old")
    val tmpP = new org.apache.hadoop.fs.Path(s"$path.tmp")
    require(!fs.exists(old),
      s"$old exists — a previous optimize crashed mid-swap; it may hold the " +
        "only good copy of the table. Inspect and restore or remove it first.")
    if (fs.exists(tmpP)) fs.delete(tmpP, true) // stale staging from a crashed run
    val df = spark.read.parquet(path)
    // Bucket each raw column into [0, 2^bits) over its own min/max (one bounded
    // stats pass), z-order on the BUCKETS, but index the RAW columns — pruning
    // predicates stay in value space. Bucket placement only affects clustering
    // quality, never read correctness (the index records true per-file min/max).
    val n = 1 << bits
    val aggs = count(lit(1)) +: cols.flatMap(c =>
      Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val st = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (st.getLong(0) == 0L) return // empty table: nothing to re-cluster
    val zcols = cols.zipWithIndex.map { case (c, i) =>
      require(!st.isNullAt(1 + 2 * i) && !st.isNullAt(2 + 2 * i),
        s"optimizeZorder: column '$c' has no non-null numeric values to bucket on")
      bucketize(col(c), st.getDouble(1 + 2 * i), st.getDouble(2 + 2 * i), n)
    }
    writeIndexed(zorderLayout(df, zcols, files, bits), tmpP.toString, cols)
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(s"optimizeZorder: rename $hPath -> $old failed")
    if (!fs.rename(tmpP, hPath)) {
      val rolledBack = fs.rename(old, hPath) // restore the original layout
      throw new java.io.IOException(
        s"optimizeZorder: rename $tmpP -> $hPath failed; " +
          (if (rolledBack) s"original layout restored (staging left at $tmpP)"
           else s"ROLLBACK ALSO FAILED — table data is at $old, staging at $tmpP"))
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(
        s"optimizeZorder: swap succeeded but deleting $old failed — remove it " +
          "by hand (the table itself is consistent)")
  }

  /** Files kept / total by the last [[readPruned]] call (test/observability hook). */
  @volatile var lastPrune: (Int, Int) = (0, 0)

  /** Read back a [[writeIndexed]] table, skipping every file whose `[min, max]`
    * envelope misses any of the requested `ranges` (`col -> (lo, hi)`, inclusive).
    * Pruning is conservative — a kept file may still hold non-matching rows, so
    * callers apply their real filter on top; correctness never depends on the
    * index. The index collect is bounded by the FILE count, not the row count.
    */
  def readPruned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      ranges: Map[String, (Double, Double)]): DataFrame = {
    // One index scan: collect (file, keep) and count locally — the collect is
    // already bounded by the file count, and a second count() job would reopen
    // the index on every pruned read.
    val keep = ranges.foldLeft(lit(true)) { case (acc, (c, (lo, hi))) =>
      acc && col(s"max_$c") >= lit(lo) && col(s"min_$c") <= lit(hi)
    }
    // Null stats mean the file's column is ALL null — no row can satisfy a
    // range predicate there, so dropping it is still conservative-correct.
    val entries = spark.read.parquet(s"$path/_graft_index")
      .select(col("file"), coalesce(keep, lit(false)).alias("keep")).collect()
    val files = entries.collect { case r if r.getBoolean(1) =>
      s"$path/${r.getString(0)}" }
    lastPrune = (files.length, entries.length)
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }
}
