package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sinks.CorpusSink

/** Streaming side of [[graft.sinks.CorpusSink]]: micro-batches of curated documents
  * land as token-budgeted parquet shards under a continuously-extended manifest —
  * the tail of a streaming curation pipeline (dedup → gate → '''shard sink'''), so
  * a training job can start reading finished shards while the crawl is still
  * arriving.
  *
  * Each batch packs its own documents into NEW shards whose `pack_ix` continues
  * per-bucket numbering from the persisted manifest (shards already written are
  * immutable — a reader never observes a shard growing). The cost of that
  * immutability is bounded underfill: at most one under-budget shard per bucket per
  * batch, which small batches amortize by raising the trigger interval rather than
  * reopening files.
  *
  * Scale shape: the manifest read collapses to |buckets| offset rows (broadcast);
  * packing is the bucketed cumulative-sum window; the data write is one shuffle
  * sized by the batch. Parquet appends are at-least-once on failure/retry — same
  * caveat as [[EventStreams.curateNearDupStream]]; a transactional table format
  * slots in at the two `write` calls for exactly-once.
  */
object StreamingCorpusSink {

  /** Start the shard sink over a streaming document frame. Data lands under
    * `dataDir/bucket=N/pack_ix=M/`, manifest rows (with `batch_id`) under
    * `manifestDir`.
    *
    * Per-bucket pack offsets are carried FORWARD between batches in driver memory
    * (≤ `buckets` longs) and read from the manifest only on the run's first batch
    * (restart recovery) — the manifest grows by one file per batch over a stream's
    * lifetime, and re-listing it every trigger would make batch latency grow with
    * stream age. Periodic manifest compaction is a table-format concern, not this
    * sink's.
    */
  def shardSinkStream(
      docs: DataFrame, dataDir: String, manifestDir: String, checkpointDir: String,
      textCol: String = "text", idCol: String = "doc_id",
      budget: Int = 2048, buckets: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val step = new ((Dataset[Row], Long) => Unit) with Serializable {
      // bucket -> next free pack_ix; None until first batch recovers it
      private var nextPack: Option[Map[Long, Long]] = None

      override def apply(batch: Dataset[Row], batchId: Long): Unit = {
        val spark = batch.sparkSession
        val offMap: Map[Long, Long] = nextPack.getOrElse {
          try spark.read.parquet(manifestDir)
            .groupBy(col("bucket")).agg((max(col("pack_ix")) + 1).alias("off"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          catch { case _: org.apache.spark.sql.AnalysisException => Map.empty }
        }
        val fresh = CorpusSink.assignShards(
          batch.toDF(), textCol, idCol, budget, buckets)
        val assigned = if (offMap.isEmpty) fresh else {
          val off = spark.createDataFrame(offMap.toSeq).toDF("bucket", "__off")
          fresh.join(broadcast(off), Seq("bucket"), "left")
            .withColumn("pack_ix", col("pack_ix") + coalesce(col("__off"), lit(0L)))
            .drop("__off")
        }
        // two actions consume the assignment (data write + manifest agg): persist
        // the batch-sized frame spill-safely so packing runs once
        val p = assigned.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          p.repartition(col("bucket"), col("pack_ix"))
            .write.mode("append").partitionBy("bucket", "pack_ix").parquet(dataDir)
          val manifestDf = CorpusSink.shardManifest(p, idCol)
            .withColumn("batch_id", lit(batchId))
          // |shards-this-batch| rows: tiny — collect once to feed BOTH the manifest
          // append and the forward-carried offsets without a second packing job
          val manifest = manifestDf.collect()
          spark.createDataFrame(
            spark.sparkContext.parallelize(manifest.toIndexedSeq, 1), manifestDf.schema)
            .write.mode("append").parquet(manifestDir)
          val batchMax = manifest
            .groupBy(_.getAs[Long]("bucket"))
            .map { case (b, rows) => b -> (rows.map(_.getAs[Long]("pack_ix")).max + 1) }
          nextPack = Some(offMap ++ batchMax.map { case (b, nx) =>
            b -> math.max(nx, offMap.getOrElse(b, 0L))
          })
        } finally p.unpersist()
      }
    }
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((b: Dataset[Row], id: Long) => step(b, id))
      .start()
  }
}
