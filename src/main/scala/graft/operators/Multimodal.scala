package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract run as partition-wise
  * batch operators (`mapPartitions`) so a real decoder (JNI/ffmpeg/jpeg) drops in
  * without changing the plan shape. The decode itself is STUBBED here (no media libs
  * in this container) with a deterministic fake that preserves the real batch shape:
  * binary in → fixed-width feature vector + metadata out.
  */
object Multimodal {

  /** Deterministic fake payload: expands a document's fingerprint into N pseudo-bytes.
    * Stands in for `spark.read.format("binaryFile")` content.
    */
  def attachFakePayload(df: DataFrame, textCol: String, repeats: Int = 4): DataFrame =
    df.withColumn("media_format",
        element_at(array(lit("jpeg"), lit("png"), lit("wav")),
          (pmod(length(col(textCol)), lit(3)) + 1).cast("int")))
      .withColumn("payload",
        encode(repeat(TextAnalysis.fingerprint(col(textCol)), repeats), "UTF-8"))
      .withColumn("media_meta", struct(
        col("media_format").alias("format"),
        length(col("payload")).alias("n_bytes")))

  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int,
      byte_mean: Double, byte_min: Int, byte_max: Int, head: Array[Byte])

  /** Partition-wise "decode": consumes (id, format, payload) rows in batches and emits
    * fixed-shape features. The inner `decodeOne` is the stub a real codec replaces;
    * everything around it — encoders, batching, schema — is the production plumbing.
    */
  def decodeFeatures(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.select(
      col(idCol).cast("long").alias("id"),
      col("media_meta.format").alias("format"),
      col("payload"))
    val out = in.as[(Long, String, Array[Byte])].mapPartitions { it =>
      it.map { case (id, format, bytes) => decodeOne(id, format, bytes) }
    }
    out.toDF()
  }

  /** STUB decoder — a real implementation would JNI into a codec here. Deterministic:
    * derives "features" from the payload bytes themselves.
    */
  private def decodeOne(id: Long, format: String, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var mn = 255
    var mx = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      sum += b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    MediaFeatures(id, format, bytes.length, mean, if (bytes.isEmpty) 0 else mn, mx,
      bytes.take(8))
  }

  /** Frame sampling stub: emits every `stride`-th 4-byte window as a "frame" —
    * the explode shape of real video frame extraction (one row per sampled frame).
    * Spark's `base64` is MIME-chunked (CRLF every 76 chars); strip the line breaks
    * before windowing or the `\G` chunker stalls at the first line boundary.
    */
  def sampleFrames(df: DataFrame, idCol: String = "doc_id", stride: Int = 32): DataFrame =
    df.select(
      col(idCol),
      posexplode(split(
        regexp_replace(base64(col("payload")), "[\\r\\n]", ""),
        "(?<=\\G.{" + stride + "})"))
        .as(Seq("frame_no", "frame_b64")))
      .filter(length(col("frame_b64")) > 0)
}
