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

  private val markerRe = "_commit_v(\\d+)".r

  /** Commits are IMMUTABLE `_versions/_commit_v<N>` marker files and the
    * committed version is the largest N present: a single mutable pointer
    * replaced by rename is not atomic on every filesystem (Hadoop's local-FS
    * rename-with-OVERWRITE deletes the destination first, leaving a
    * pointerless instant a concurrent reader can observe). A legacy `_commit`
    * pointer file is still honored for directories written before markers.
    */
  def committedVersion(spark: SparkSession, dir: String): Option[Int] = {
    val fs = fsFor(spark, dir)
    val root = new org.apache.hadoop.fs.Path(s"$dir/_versions")
    val markers =
      if (!fs.exists(root)) Nil
      else fs.listStatus(root).toSeq.map(_.getPath.getName).collect {
        case markerRe(n) => n.toInt
      }
    if (markers.nonEmpty) Some(markers.max)
    else {
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
  }

  /** The directory readers and appenders should use right now. */
  def liveDir(spark: SparkSession, dir: String): String =
    committedVersion(spark, dir) match {
      case Some(v) => versionDir(dir, v)
      case None => dir
    }

  /** Publish `version` as live: atomically CREATE the immutable marker, then
    * lazily drop older markers and any legacy pointer — at every instant at
    * least one committed marker exists and resolution takes the max. The
    * version dir must be fully written first; a crash before this call leaves
    * the previous generation live and the new one as unreferenced staging.
    *
    * The PREVIOUS version's marker is retained (only markers `< version - 1`
    * are dropped): object-store listings are not read-after-write consistent
    * with a concurrent lister, so a reader whose listing misses the
    * just-created marker must still resolve the previous COMMITTED version —
    * never fall through to the flat legacy dir. Staleness spanning two
    * commits is outside the model (commits are maintenance-rate, listings
    * converge in seconds). [[dropStaleVersions]] — gated on "no readers" —
    * is where the N-1 marker and dir are finally reclaimed.
    */
  def commit(spark: SparkSession, dir: String, version: Int): Unit = {
    val fs = fsFor(spark, dir)
    fs.create(new org.apache.hadoop.fs.Path(
      s"$dir/_versions/_commit_v$version"), true).close()
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_versions")).foreach { st =>
      st.getPath.getName match {
        case markerRe(n) if n.toInt < version - 1 => fs.delete(st.getPath, false)
        case _ =>
      }
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_commit"), false)
    ()
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
    val keep = committedVersion(spark, dir)
      .map(v => Set(s"v$v", s"_commit_v$v")).getOrElse(Set.empty[String])
    fs.listStatus(root).foreach { st =>
      if (!keep.contains(st.getPath.getName)) fs.delete(st.getPath, true)
    }
  }
}
