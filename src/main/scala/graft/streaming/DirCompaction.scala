package graft.streaming

import org.apache.spark.sql.SparkSession

/** Bound the accumulated FILE count of a directory that a streaming sink
  * appends one small parquet file-set to per batch: a months-long stream
  * would otherwise pay O(batches) listing/footer/task overhead per trigger —
  * the per-batch creep StreamScaleSmoke measures. Shared by the near-dup
  * index sinks ([[EventStreams]]) and the entity-resolution catalog/assignment
  * sink ([[StreamingEntityResolution]]).
  *
  * When the live dir reaches `threshold` files, rewrite it as one generation
  * under `dir/_versions/v<N>` and flip the [[graft.util.CommitPointer]]
  * atomically; the superseded generation is dropped on the NEXT maintenance
  * cycle (the stream is the dir's only writer, and never mid-read between
  * batches). Compacted rows get their protocol tags STRIPPED — they are
  * committed by construction (call only AFTER the restart purge, and only at
  * a batch boundary: every prior batch's foreachBatch returned before this
  * one started), and untagged rows are exactly what [[ExactlyOnce.purge]]
  * never deletes, so a compacted file can never be judged "uncommitted" by a
  * later recovery (the multi-batch-file hazard purge refuses loudly). A
  * crash before the pointer flip leaves the old generation live and the
  * staging dir as garbage removed by the next compaction. Amortized cost:
  * one rewrite per `threshold` batches — O(|dir| / threshold) per batch.
  */
private[streaming] object DirCompaction {

  /** Compact `dir` if its live generation holds >= `threshold` parquet files;
    * returns the (possibly new) live directory appenders and readers should
    * use for THIS batch. `threshold <= 0` disables compaction.
    */
  def maintain(
      spark: SparkSession, dir: String, threshold: Int,
      rowsPerFile: Double = 4e6): String = {
    import graft.util.CommitPointer
    val live = CommitPointer.liveDir(spark, dir)
    val livePath = new org.apache.hadoop.fs.Path(live)
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (threshold <= 0 || !fs.exists(livePath)) return live
    val files = fs.listStatus(livePath).count(st =>
      st.getPath.getName.endsWith(".parquet") && !st.getPath.getName.startsWith("_"))
    if (files < threshold) return live
    CommitPointer.dropStaleVersions(spark, dir) // crashed stagings + N-1 gen
    val next = CommitPointer.committedVersion(spark, dir).getOrElse(0) + 1
    val cur = spark.read.parquet(live)
    val rows = cur.count()
    val outFiles = math.max(1, math.ceil(rows / rowsPerFile).toInt)
    // tag columns survive as NULL (untagged = committed forever); files that
    // never carried them (seeded/pre-protocol data) gain the null columns, so
    // one schema covers every generation
    cur.withColumn("batch_id", org.apache.spark.sql.functions.lit(null).cast("long"))
      .withColumn("ckpt_id", org.apache.spark.sql.functions.lit(null).cast("string"))
      .repartition(outFiles)
      .write.mode("overwrite").parquet(CommitPointer.versionDir(dir, next))
    CommitPointer.commit(spark, dir, next)
    // The flat legacy root keeps only _versions/_commit (one-time migration);
    // a superseded VERSIONED generation is NOT deleted here — its marker is
    // retained by commit() so a stale object-store listing that misses the
    // new marker resolves the previous committed version, and the previous
    // version must then still be readable. The next maintenance cycle's
    // dropStaleVersions (above) reclaims dir + marker together.
    if (live == dir)
      fs.listStatus(livePath).foreach { st =>
        val n0 = st.getPath.getName
        if (!n0.startsWith("_")) fs.delete(st.getPath, st.isDirectory)
      }
    CommitPointer.versionDir(dir, next)
  }
}
