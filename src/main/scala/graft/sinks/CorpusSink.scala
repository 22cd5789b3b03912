package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Training-corpus output: the write side of the curation pipeline.
  *
  * A curated corpus leaves the engine in one of two shapes:
  *
  *   - '''token-budgeted shards''' ([[writeShards]]): documents are assigned to
  *     fixed-token-budget shards with [[Curation.packSequences]]' deterministic
  *     concat-and-cut rule, then each (bucket, pack) lands in exactly one output
  *     file — the layout a data loader streams sequentially, one shard per reader,
  *     no shard ever larger than its token budget by more than one document.
  *   - '''JSONL export''' ([[writeJsonl]]): one JSON object per line, the lingua
  *     franca of tokenizer/training tooling.
  *
  * Both paths also produce a driver-sized '''shard manifest''' ([[shardManifest]]):
  * one row per shard with document/token counts and id bounds, the artifact a
  * training job uses for deterministic resume and per-shard accounting.
  *
  * Scale notes. Shard assignment is packSequences' bucketed cumulative-sum window —
  * parallel across `buckets`, never a single global sort. The physical write
  * repartitions by (bucket, pack_ix), so one shuffle sized by the corpus; files come
  * out one-per-shard via `partitionBy` directory layout. The manifest is an
  * aggregation collapsing to |shards| rows — always driver-safe. Nothing here
  * collects document text to the driver.
  */
object CorpusSink {

  /** Assign each document to a (bucket, pack_ix) shard under `budget` tokens via
    * the packSequences rule, returning the input columns plus `bucket`, `pack_ix`,
    * and `n_tokens`. `tokens` defaults to whitespace-word count when not supplied
    * as a column name present in `df`.
    */
  def assignShards(
      df: DataFrame, textCol: String, idCol: String,
      budget: Int = 2048, buckets: Int = 8, tokensCol: Option[String] = None)
      : DataFrame = {
    // bucket/pack_ix are output columns this sink owns, and n_tokens is derived
    // unless the caller names it as the token source — a pre-existing column of the
    // same name would either collide in the join-back or be silently replaced
    val reserved = Seq("bucket", "pack_ix") ++
      (if (tokensCol.contains("n_tokens")) Nil else Seq("n_tokens"))
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"assignShards input must not carry reserved column(s) ${clash.mkString(", ")} " +
        "(rename them, or pass tokensCol to reuse a precomputed token count)")
    val toks = tokensCol.map(col).getOrElse(
      array_size(graft.operators.Dedup.wordsArray(col(textCol))))
    val staged = df.withColumn("n_tokens", toks.cast("long"))
    val packed = Curation.packSequences(staged, idCol, col("n_tokens"),
      budget = budget, buckets = buckets)
      .select(col("id").alias(idCol), col("bucket"), col("pack_ix"))
    staged.join(packed, Seq(idCol))
  }

  /** Write `df` as token-budgeted parquet shards under `path`:
    * `path/bucket=N/pack_ix=M/part-*.parquet`, exactly one file per shard
    * (each (bucket, pack) group is repartitioned into its own task). Returns the
    * shard manifest of what was written — computed from the FILES ON DISK, so
    * consuming it never re-runs the tokenize/pack assignment, and it reports
    * exactly what a reader will see.
    */
  def writeShards(
      df: DataFrame, path: String, textCol: String, idCol: String,
      budget: Int = 2048, buckets: Int = 8, mode: SaveMode = SaveMode.Overwrite)
      : DataFrame = {
    assignShards(df, textCol, idCol, budget, buckets)
      .repartition(col("bucket"), col("pack_ix"))
      .write.mode(mode)
      .partitionBy("bucket", "pack_ix")
      .parquet(path)
    // partition discovery types directory values as int; restore the long schema
    val back = df.sparkSession.read.parquet(path)
      .withColumn("bucket", col("bucket").cast("long"))
      .withColumn("pack_ix", col("pack_ix").cast("long"))
    shardManifest(back, idCol)
  }

  /** One row per shard: document count, token sum, id bounds — the resume/accounting
    * artifact. Input must carry `bucket`, `pack_ix`, `n_tokens` (assignShards
    * output).
    */
  def shardManifest(assigned: DataFrame, idCol: String): DataFrame =
    assigned.groupBy(col("bucket"), col("pack_ix"))
      .agg(
        count(lit(1)).alias("n_docs"),
        sum(col("n_tokens")).alias("n_tokens"),
        min(col(idCol)).alias("min_id"),
        max(col(idCol)).alias("max_id"))
      .orderBy("bucket", "pack_ix")

  /** Rewrite a shard manifest directory as a single parquet file, preserving every
    * row. The streaming sink ([[graft.streaming.StreamingCorpusSink]]) appends one
    * small file per batch, so a long-lived stream accumulates thousands of tiny
    * files; restart recovery (and any ad-hoc manifest read) then pays the full
    * listing. Run this while the stream is STOPPED — the swap is
    * write-to-sibling-then-rename via the Hadoop FileSystem API (works on local
    * paths and cluster filesystems alike), not atomic against concurrent writers.
    * Returns the row count preserved.
    */
  def compactManifest(spark: org.apache.spark.sql.SparkSession, manifestDir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(manifestDir)
    val tmp = new org.apache.hadoop.fs.Path(manifestDir + ".compact.tmp")
    val fs = dir.getFileSystem(conf)
    val n = spark.read.parquet(manifestDir).count()
    spark.read.parquet(manifestDir).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.delete(dir, true), s"could not remove $manifestDir for swap")
    require(fs.rename(tmp, dir), s"could not move compacted manifest into $manifestDir")
    n
  }

  /** Export as JSONL (one JSON object per line, text format the tokenizer stack
    * reads): each output column becomes a JSON field; one file per `bucket` of the
    * deterministic md5 id-hash so export parallelism and file count are explicit
    * and reproducible.
    */
  def writeJsonl(
      df: DataFrame, path: String, idCol: String, files: Int = 8,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(!df.columns.contains("bucket"),
      "writeJsonl input must not carry a 'bucket' column (it is the export's file key)")
    val bucket = graft.operators.Dedup.md5Hash60(col(idCol).cast("string")) % files
    df.withColumn("bucket", bucket)
      .repartition(col("bucket"))
      .write.mode(mode)
      .partitionBy("bucket")
      .json(path)
  }
}
