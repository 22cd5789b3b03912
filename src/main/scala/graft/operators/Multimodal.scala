package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract run as partition-wise
  * batch operators (`mapPartitions`) so a real decoder (JNI/ffmpeg/libjpeg-turbo)
  * drops in without changing the plan shape.
  *
  * The IMAGE path is real: `decodeOne` decodes JPEG/PNG payloads with the JDK's
  * `javax.imageio.ImageIO` (no external dependency) and emits width/height/pixel
  * statistics from the actual raster. Audio/video decode stays STUBBED (no codec
  * libs in this container) with deterministic byte statistics that preserve the
  * production batch shape: binary in → fixed-width feature row out.
  */
object Multimodal {

  /** Deterministic fake payload: expands a document's fingerprint into N pseudo-bytes.
    * Stands in for `spark.read.format("binaryFile")` content where no real media
    * exists (the payloads are NOT decodable images — `decodeFeatures` falls back to
    * byte statistics for them, exactly as it would for a corrupt file in a crawl).
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

  /** Deterministic REAL image payloads: one uniform-gray PNG per row, dimensions and
    * gray level derived from the id (width = 4 + id%13, height = 3 + id%7,
    * gray = (id*37)%256) — so an external oracle can predict the decoded pixel
    * statistics exactly (PNG is lossless; a uniform image round-trips bit-exact).
    * Encoding runs partition-wise, the same shape a `binaryFile` scan would have.
    */
  def attachImagePayload(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 4 + java.lang.Math.floorMod(id, 13L).toInt
          val h = 3 + java.lang.Math.floorMod(id, 7L).toInt
          val g = java.lang.Math.floorMod(id * 37L, 256L).toInt
          (id, "png", encodeUniformImage(w, h, g, "png"))
        }
      }
      .toDF("doc_id", "media_format", "payload")
      .withColumn("media_meta", struct(
        col("media_format").alias("format"),
        length(col("payload")).alias("n_bytes")))
  }

  /** Encode a w×h uniform-gray image with the JDK encoder ("png" or "jpeg"). */
  private[graft] def encodeUniformImage(w: Int, h: Int, gray: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, gray); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, format, out)
    out.toByteArray
  }

  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int,
      byte_mean: Double, byte_min: Int, byte_max: Int, head: Array[Byte],
      width: Option[Int], height: Option[Int],
      px_mean: Option[Double], px_min: Option[Int], px_max: Option[Int])

  /** Partition-wise decode: consumes (id, format, payload) rows in batches and emits
    * fixed-shape features. JPEG/PNG payloads are REALLY decoded (ImageIO) into
    * width/height/pixel stats; undecodable payloads and non-image formats keep the
    * byte statistics with null image fields — the behavior a production pipeline
    * wants for corrupt files (feature row survives, decode fields null).
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

  /** Per-payload decode. Byte statistics always; real ImageIO decode for image
    * formats (raster band 0 — the gray channel for grayscale, red for RGB; our
    * generated payloads are single-band gray). A WAV/audio codec would slot in here;
    * audio stays byte-stats-only (stub) in this container.
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
    val img =
      if (format == "jpeg" || format == "jpg" || format == "png")
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: java.io.IOException => None }
      else None
    val (w, h, pMean, pMin, pMax) = img match {
      case Some(im) =>
        val raster = im.getRaster
        val (iw, ih) = (im.getWidth, im.getHeight)
        var ps = 0L
        var pmn = Int.MaxValue
        var pmx = Int.MinValue
        var y = 0
        while (y < ih) {
          var x = 0
          while (x < iw) {
            val v = raster.getSample(x, y, 0)
            ps += v
            if (v < pmn) pmn = v
            if (v > pmx) pmx = v
            x += 1
          }
          y += 1
        }
        (Some(iw), Some(ih), Some(ps.toDouble / (iw.toLong * ih)), Some(pmn), Some(pmx))
      case None => (None, None, None, None, None)
    }
    MediaFeatures(id, format, bytes.length, mean, if (bytes.isEmpty) 0 else mn, mx,
      bytes.take(8), w, h, pMean, pMin, pMax)
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
