package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Crash-replay idempotence for `foreachBatch` parquet appends.
  *
  * Protocol: every append tags its rows with the writing batch's id; on restart
  * the query's FIRST batch calls [[purge]] on each appended directory before
  * writing anything. Files whose rows all belong to batches ≥ the replayed one
  * are uncommitted leftovers of the crashed attempt (per-file `min(batch_id)`
  * decides — each batch's append writes whole files) and are deleted, so the
  * replay sees the exact pre-crash state. This removes both the at-least-once
  * duplicate rows AND the subtler failure of dedup-against-index operators:
  * replaying a batch against an index polluted by the crashed attempt's own
  * rows would drop every replayed row as a "duplicate" — silent data loss, not
  * just duplication.
  */
private[streaming] object ExactlyOnce {

  /** Delete files under `dir` owned by batches ≥ `batchId`. Tolerates a missing
    * directory, an empty directory, and rows without a `batch_id` column
    * (pre-protocol data is never purged). The listing is one Spark job over the
    * directory; deletions are file-granular.
    */
  def purge(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return
    val stale =
      try spark.read.parquet(dir)
        .withColumn("__f", input_file_name())
        .groupBy(col("__f")).agg(min(col("batch_id")).alias("mn"))
        .collect().filter(_.getAs[Long]("mn") >= batchId)
      catch { case _: org.apache.spark.sql.AnalysisException => Array.empty[org.apache.spark.sql.Row] }
    stale.foreach { r =>
      val p = new org.apache.hadoop.fs.Path(new java.net.URI(r.getString(0)))
      p.getFileSystem(conf).delete(p, false)
    }
  }
}
