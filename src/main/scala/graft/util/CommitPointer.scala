package graft.util

import org.apache.spark.sql.SparkSession

/** Atomic generation pointer for a directory whose contents are periodically
  * rewritten (compaction): generations live under `dir/_versions/v<N>`
  * (underscore-prefixed, so a flat parquet read of `dir` never sees them), and
  * the single small `dir/_commit` file names the live one — published by
  * FileContext rename with OVERWRITE (atomic on HDFS and POSIX; on object
  * stores the PUT itself is atomic). Until a first commit exists, the live
  * directory is `dir` itself (flat legacy layout), so pre-pointer data needs
  * no migration. The same shape as `operators.ScaleLayout`'s table-level
  * commit, packaged for any directory-valued state.
  */
object CommitPointer {

  private def fsFor(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def versionDir(dir: String, v: Int): String = s"$dir/_versions/v$v"

  def committedVersion(spark: SparkSession, dir: String): Option[Int] = {
    val fs = fsFor(spark, dir)
    val cp = new org.apache.hadoop.fs.Path(s"$dir/_commit")
    if (!fs.exists(cp)) None
    else {
      val in = fs.open(cp)
      val txt = try {
        val out = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
        out.toString("UTF-8").trim
      } finally in.close()
      require(txt.matches("v\\d+"), s"corrupt commit pointer $cp: '$txt'")
      Some(txt.drop(1).toInt)
    }
  }

  /** The directory readers and appenders should use right now. */
  def liveDir(spark: SparkSession, dir: String): String =
    committedVersion(spark, dir) match {
      case Some(v) => versionDir(dir, v)
      case None => dir
    }

  /** Publish `version` as live. The version dir must be fully written first; a
    * crash before this call leaves the previous generation live and the new
    * one as unreferenced staging.
    */
  def commit(spark: SparkSession, dir: String, version: Int): Unit = {
    val fs = fsFor(spark, dir)
    val tmp = new org.apache.hadoop.fs.Path(s"$dir/_commit.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"v$version".getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      tmp.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(s"$dir/_commit"),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Delete version dirs other than the committed one (crashed stagings,
    * superseded generations) — call only when no reader can hold the previous
    * generation (a single-writer stream between batches). With no commit at
    * all, EVERY version dir is uncommitted staging — the flat dir is the live
    * data — so all of them are dropped (the crashed-first-compaction case).
    */
  def dropStaleVersions(spark: SparkSession, dir: String): Unit = {
    val fs = fsFor(spark, dir)
    val root = new org.apache.hadoop.fs.Path(s"$dir/_versions")
    if (!fs.exists(root)) return
    val keep = committedVersion(spark, dir).map(v => s"v$v")
    fs.listStatus(root).foreach { st =>
      if (!keep.contains(st.getPath.getName)) fs.delete(st.getPath, true)
    }
  }
}
