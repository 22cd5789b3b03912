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
  * All three decode paths are REAL and dependency-free: images through the JDK's
  * `javax.imageio.ImageIO` (JPEG/PNG), audio through the RIFF/PCM-8 WAV codec below,
  * and video through the RIFF/AVI walker ([[decodeAviFrames]]) whose Motion-PNG/
  * MJPEG frame chunks are plain stills decoded per frame ([[extractFrames]]).
  * [[sampleFrames]] remains the byte-window stand-in for payloads that are not real
  * containers (the fake-payload path).
  */
object Multimodal {

  // ImageIO's ImageInputStream/ImageOutputStream default to a DISK-backed cache —
  // one temp file created and deleted per encode/decode. Per-frame stills are a
  // few KB and every call site here already holds them in byte arrays, so the
  // memory-backed stream is strictly better; this flips the JVM-wide default once
  // per executor (class-load time), turning tens of thousands of tiny-file
  // creations per partition into pure in-memory work.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Deterministic REAL audio payloads: one 8-bit PCM mono WAV per row, length and
    * samples derived from the id (n = 50 + id%50 samples at 8 kHz, sample i =
    * (id + 7i) mod 256) — WAV is a RIFF header plus raw PCM, so both the encoder
    * and the decoder below are complete, dependency-free implementations and an
    * external oracle can predict the decoded sample statistics exactly.
    */
  def attachAudioPayload(df: DataFrame, idCol: String = "doc_id", sampleRate: Int = 8000)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 50 + java.lang.Math.floorMod(id, 50L).toInt
          val samples = Array.tabulate(n)(i => java.lang.Math.floorMod(id + 7L * i, 256L).toInt)
          (id, "wav", encodeWavPcm8(samples, sampleRate))
        }
      }
      .toDF("doc_id", "media_format", "payload")
      .withColumn("media_meta", struct(
        col("media_format").alias("format"),
        length(col("payload")).alias("n_bytes")))
  }

  /** Scalar md5-60 matching [[Dedup.md5Hash60]] / DuckDB
    * `('0x' || substr(md5(key), 1, 15))::BIGINT` — the digest's top 60 bits, so
    * payload constructions using it are reproducible in an external oracle engine.
    */
  private[graft] def md5Mod(key: String, m: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xFF); i += 1 }
    h = (h << 4) | ((d(7) & 0xF0) >>> 4)
    (h % m).toInt
  }

  /** Deterministic REAL textured image payloads for perceptual-hash dedup: fixed
    * `w`×`h` gray PNGs whose pixel (x,y) is the md5-60 of
    * `"<id % groupMod>_<x>_<y>"` mod 256 — ids in the same group render the SAME
    * image, and odd ids additionally get one id-derived pixel perturbed by +64
    * (a near-duplicate, not an exact one: the kind of single-region edit
    * perceptual hashing exists to catch). PNG is lossless and the pixel function
    * is md5-replayable, so an external oracle can rebuild every decoded raster —
    * and therefore every [[perceptualHash]] — arithmetically.
    */
  def attachTexturedImagePayload(df: DataFrame, idCol: String = "doc_id",
      w: Int = 16, h: Int = 12, groupMod: Int = 101): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val g = java.lang.Math.floorMod(id, groupMod.toLong)
          val nx = java.lang.Math.floorMod(id, w.toLong).toInt
          val ny = java.lang.Math.floorMod(id, h.toLong).toInt
          val odd = java.lang.Math.floorMod(id, 2L) == 1L
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val base = md5Mod(s"${g}_${x}_${y}", 256)
              val v = if (odd && x == nx && y == ny) (base + 64) % 256 else base
              raster.setSample(x, y, 0, v)
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          (id, "png", out.toByteArray)
        }
      }
      .toDF("doc_id", "media_format", "payload")
      .withColumn("media_meta", struct(
        col("media_format").alias("format"),
        length(col("payload")).alias("n_bytes")))
  }

  /** 64-bit difference hash (dHash — the standard perceptual image fingerprint:
    * Krawetz's "Kind of Like That" construction) over REAL decoded rasters:
    * nearest-neighbor sample the gray image on a 9×8 lattice
    * (`sx = x·W/9`, `sy = y·H/8`, integer division), set bit `y·8 + x` iff the
    * right neighbor is brighter than the left. Robust to uniform brightness and
    * scale changes, and a small pixel edit flips at most two bits.
    *
    * Pure map stage, partition-wise decode: at 100 TB the corpus collapses to
    * 8 bytes of signature per image right at the scan, and near-dup detection
    * downstream ([[Dedup.hammingNearDup]]) never touches payload bytes again.
    * Undecodable payloads are dropped (no raster, no hash).
    */
  def perceptualHash(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val img =
            try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
            catch { case _: java.io.IOException => None }
          img.flatMap(dHashOf).map(hash => (id, hash))
        }
      }
      .toDF("id", "simhash")
  }

  /** The dHash kernel over one decoded raster — shared by [[perceptualHash]] and
    * [[videoFrameHashes]]. None when the image is too small for the 9×8 lattice.
    */
  private[graft] def dHashOf(im: java.awt.image.BufferedImage): Option[Long] = {
    if (im.getWidth < 9 || im.getHeight < 8) None
    else {
      val raster = im.getRaster
      val iw = im.getWidth
      val ih = im.getHeight
      var hash = 0L
      var y = 0
      while (y < 8) {
        val sy = y * ih / 8
        var x = 0
        while (x < 8) {
          val a = raster.getSample(x * iw / 9, sy, 0)
          val b = raster.getSample((x + 1) * iw / 9, sy, 0)
          if (b > a) hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      Some(hash)
    }
  }

  /** Deterministic REAL textured audio payloads for fingerprint dedup: fixed-length
    * 8-bit PCM WAVs whose sample i is the md5-60 of `"<id % groupMod>_<i>"` mod 256
    * — same-group ids render the SAME waveform, odd ids get one id-derived sample
    * perturbed by +64 (a near-duplicate: a click/dropout edit, the case audio
    * fingerprinting exists to survive). md5-replayable like the image analogue.
    */
  def attachTexturedAudioPayload(df: DataFrame, idCol: String = "doc_id",
      n: Int = 80, groupMod: Int = 101, sampleRate: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val g = java.lang.Math.floorMod(id, groupMod.toLong)
          val np = java.lang.Math.floorMod(id, n.toLong).toInt
          val odd = java.lang.Math.floorMod(id, 2L) == 1L
          val samples = Array.tabulate(n) { i =>
            val base = md5Mod(s"${g}_${i}", 256)
            if (odd && i == np) (base + 64) % 256 else base
          }
          (id, "wav", encodeWavPcm8(samples, sampleRate))
        }
      }
      .toDF("doc_id", "media_format", "payload")
      .withColumn("media_meta", struct(
        col("media_format").alias("format"),
        length(col("payload")).alias("n_bytes")))
  }

  /** 64-bit sign-of-difference audio fingerprint over the REAL decoded PCM
    * envelope — the Haitsma–Kalker construction (ISMIR '02) with the band-energy
    * deltas replaced by raw envelope deltas (our payloads are already envelopes):
    * bit `i` is set iff `sample[i+1] > sample[i]`. Robust to uniform gain, and a
    * single-sample edit flips at most two bits. Pure map stage, partition-wise
    * decode; payloads that are not PCM-8 WAVs or carry fewer than 65 samples are
    * dropped (no envelope, no fingerprint).
    */
  def audioFingerprint(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeWavPcm8(bytes).collect { case (_, s) if s.length >= 65 =>
            var hash = 0L
            var i = 0
            while (i < 64) {
              if (s(i + 1) > s(i)) hash |= 1L << i
              i += 1
            }
            (id, hash)
          }
        }
      }
      .toDF("id", "simhash")
  }

  /** Deterministic REAL textured VIDEO payloads for frame-level perceptual dedup:
    * Motion-PNG AVIs whose frame `f` pixel (x,y) is the md5-60 of
    * `"<id % groupMod>_<f>_<x>_<y>"` mod 256 — ids in the same group render the
    * SAME frame sequence. Odd ids additionally perturb ONE pixel of ONE frame
    * (+64 — a single-frame edit, the near-dup case); ids divisible by 5 carry only
    * the first `frames / 2` frames (a CLIP of the group's video — the subset case
    * frame-level matching exists to catch). PNG frames are lossless and the pixel
    * function md5-replayable, so an external oracle rebuilds every frame raster —
    * and therefore every frame dHash — arithmetically (the mm9 oracle).
    */
  def attachTexturedVideoPayload(df: DataFrame, idCol: String = "doc_id",
      frames: Int = 4, w: Int = 16, h: Int = 12, groupMod: Int = 101,
      fps: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val g = java.lang.Math.floorMod(id, groupMod.toLong)
          val nf = if (java.lang.Math.floorMod(id, 5L) == 0L) frames / 2 else frames
          val odd = java.lang.Math.floorMod(id, 2L) == 1L
          val fo = java.lang.Math.floorMod(id, nf.toLong).toInt
          val nx = java.lang.Math.floorMod(id, w.toLong).toInt
          val ny = java.lang.Math.floorMod(id, h.toLong).toInt
          val fbs = (0 until nf).map { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val base = md5Mod(s"${g}_${f}_${x}_${y}", 256)
                val v = if (odd && f == fo && x == nx && y == ny) (base + 64) % 256 else base
                raster.setSample(x, y, 0, v)
                x += 1
              }
              y += 1
            }
            val out = new ByteArrayOutputStream()
            ImageIO.write(img, "png", out)
            out.toByteArray
          }
          (id, "avi", encodeAviFrames(fbs, w, h, fps))
        }
      }
      .toDF("doc_id", "media_format", "payload")
      .withColumn("media_meta", struct(
        col("media_format").alias("format"),
        length(col("payload")).alias("n_bytes")))
  }

  /** Per-FRAME perceptual hashes over REAL decoded video payloads: RIFF-walk each
    * AVI, image-decode every frame chunk, dHash each frame — one (id, frame_no,
    * simhash) row per decodable frame. Pure map stage, partition-wise decode: at
    * 100 TB each video collapses to 8 bytes per frame right at the scan, and the
    * frame-level near-dup join downstream ([[Dedup.videoNearDup]]) never touches
    * payload bytes again. Corrupt containers and undecodable/too-small frames
    * contribute zero rows.
    */
  def videoFrameHashes(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeAviFrames(bytes).toSeq.flatMap { case (_, fbs) =>
            fbs.zipWithIndex.flatMap { case (fb, i) =>
              val img =
                try Option(ImageIO.read(new ByteArrayInputStream(fb)))
                catch { case _: java.io.IOException => None }
              img.flatMap(dHashOf).map(hash => (id, i, hash))
            }
          }
        }
      }
      .toDF("id", "frame_no", "simhash")
  }

  /** Minimal canonical WAV writer: RIFF / fmt(PCM, mono, 8-bit) / data. */
  private[graft] def encodeWavPcm8(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val n = samples.length
    val buf = java.nio.ByteBuffer.allocate(44 + n).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate = rate * channels * bytesPerSample
      .putShort(1) // block align
      .putShort(8) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(n)
    samples.foreach(s => buf.put((s & 0xFF).toByte))
    buf.array()
  }

  /** Minimal WAV reader: returns (sampleRate, unsigned 8-bit samples) for PCM mono
    * 8-bit payloads, None for anything that isn't one (corrupt file behavior).
    */
  private[graft] def decodeWavPcm8(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    if (bytes.length < 44) return None
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    if (tag4() != "RIFF") return None
    buf.getInt // riff size
    if (tag4() != "WAVE") return None
    var rate = -1
    var ok = false
    // walk chunks: fmt must declare PCM/mono/8-bit before data
    while (buf.remaining() >= 8) {
      val id = tag4()
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None
      id match {
        case "fmt " =>
          val fmt = buf.getShort; val ch = buf.getShort
          rate = buf.getInt; buf.getInt; buf.getShort
          val bits = buf.getShort
          ok = fmt == 1 && ch == 1 && bits == 8
          buf.position(buf.position() + size - 16)
        case "data" if ok && rate > 0 =>
          val out = new Array[Int](size)
          var i = 0
          while (i < size) { out(i) = buf.get() & 0xFF; i += 1 }
          return Some((rate, out))
        case _ => buf.position(buf.position() + size)
      }
    }
    None
  }

  // ------------------------------------------------------------------ video (AVI)

  /** Minimal canonical AVI writer (RIFF 'AVI ': hdrl(avih, strl(strh, strf)) +
    * movi('00dc' per frame) + idx1), carrying one video stream of independently
    * decodable image frames — the Motion-PNG/MJPEG shape, where every '00dc' chunk
    * is a complete still image. PNG frames make the pixel statistics losslessly
    * predictable by an external oracle; the same container with JPEG frames is
    * bona-fide MJPEG. `fps` lands in the stream header as rate/scale.
    */
  private[graft] def encodeAviFrames(
      frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int,
      fourcc: String = "MPNG"): Array[Byte] = {
    def even(n: Int) = n + (n & 1)
    val framesSize = frames.map(f => 8 + even(f.length)).sum
    val idx1Size = 8 + 16 * frames.size
    // hdrl list: 4 (type) + avih chunk (8+56) + strl list (8 + 4 + (8+56) + (8+40))
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + framesSize
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + idx1Size
    val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    tag("RIFF"); buf.putInt(riffSize); tag("AVI ")
    tag("LIST"); buf.putInt(hdrlSize); tag("hdrl")
    tag("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(0).putInt(0).putInt(0x10 /* AVIF_HASINDEX */)
      .putInt(frames.size).putInt(0).putInt(1).putInt(0)
      .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(strlSize); tag("strl")
    tag("strh"); buf.putInt(56)
    tag("vids"); tag(fourcc)
    buf.putInt(0).putShort(0).putShort(0).putInt(0)
      .putInt(1) // dwScale
      .putInt(fps) // dwRate -> fps = rate/scale
      .putInt(0).putInt(frames.size).putInt(0).putInt(-1).putInt(0)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
    tag("strf"); buf.putInt(40)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    tag(fourcc) // biCompression
    buf.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    tag("LIST"); buf.putInt(moviSize); tag("movi")
    val offsets = frames.map { f =>
      val off = buf.position()
      tag("00dc"); buf.putInt(f.length); buf.put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte)
      off
    }
    tag("idx1"); buf.putInt(16 * frames.size)
    frames.zip(offsets).foreach { case (f, _) =>
      tag("00dc"); buf.putInt(0x10 /* AVIIF_KEYFRAME */)
      // idx1 offsets are relative to the start of the 'movi' list data
      buf.putInt(0).putInt(f.length)
    }
    buf.array()
  }

  /** Minimal AVI reader: RIFF walk that returns (fps, frame payloads) for a
    * single-video-stream AVI — every '00dc'/'00db' chunk inside LIST('movi') is one
    * frame's complete image bytes. None for anything that isn't an AVI (corrupt
    * file behavior). Frames may still individually fail image decode downstream.
    */
  private[graft] def decodeAviFrames(bytes: Array[Byte]): Option[(Double, Seq[Array[Byte]])] = {
    if (bytes.length < 12) return None
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    if (tag4() != "RIFF") return None
    buf.getInt // riff size
    if (tag4() != "AVI ") return None
    var fps = 0.0
    val frames = Seq.newBuilder[Array[Byte]]
    // walk chunks; descend into LIST('hdrl'|'strl'|'movi'), skip everything else
    def walk(end: Int): Option[Unit] = {
      while (buf.position() + 8 <= end) {
        val id = tag4()
        val size = buf.getInt
        if (size < 0 || buf.position() + size > end) return None
        val next = buf.position() + size + (size & 1)
        id match {
          case "LIST" =>
            val listType = tag4()
            if (listType == "hdrl" || listType == "strl" || listType == "movi")
              walk(buf.position() + size - 4) match {
                case None => return None
                case _ =>
              }
          case "strh" if size >= 32 =>
            val fccType = tag4()
            tag4() // handler
            buf.getInt; buf.getShort; buf.getShort; buf.getInt
            val scale = buf.getInt
            val rate = buf.getInt
            if (fccType == "vids" && scale != 0) fps = rate.toDouble / scale
          case cc if cc.length == 4 && (cc.endsWith("dc") || cc.endsWith("db")) =>
            val f = new Array[Byte](size)
            buf.get(f)
            frames += f
          case _ =>
        }
        buf.position(math.min(next, end))
      }
      Some(())
    }
    walk(bytes.length).map(_ => (fps, frames.result()))
  }

  /** Deterministic REAL video payloads: one Motion-PNG AVI per row. Frame count,
    * geometry, and per-frame gray level are id-derived — n = 3 + id%4 frames of
    * (4 + id%6) × (3 + id%5) at 10 fps, frame f uniformly gray (id*31 + f*17) % 256 —
    * so an external oracle predicts every decoded frame statistic arithmetically
    * (PNG frames round-trip bit-exact), mirroring the WAV construction.
    */
  def attachVideoPayload(df: DataFrame, idCol: String = "doc_id", fps: Int = 10)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val n = 3 + java.lang.Math.floorMod(id, 4L).toInt
          val w = 4 + java.lang.Math.floorMod(id, 6L).toInt
          val h = 3 + java.lang.Math.floorMod(id, 5L).toInt
          val frames = (0 until n).map { f =>
            val g = java.lang.Math.floorMod(id * 31L + f * 17L, 256L).toInt
            encodeUniformImage(w, h, g, "png")
          }
          (id, "avi", encodeAviFrames(frames, w, h, fps))
        }
      }
      .toDF("doc_id", "media_format", "payload")
      .withColumn("media_meta", struct(
        col("media_format").alias("format"),
        length(col("payload")).alias("n_bytes")))
  }

  final case class FrameFeatures(
      doc_id: Long, frame_no: Int, fps: Double,
      width: Option[Int], height: Option[Int],
      px_mean: Option[Double], px_min: Option[Int], px_max: Option[Int])

  /** REAL video frame extraction: RIFF-walk each AVI payload, image-decode every
    * frame chunk (ImageIO — PNG/MJPEG frames are plain stills), and emit one row per
    * frame with pixel statistics. The explode shape of production frame sampling:
    * partition-wise batch decode, no shuffle, output rows ≈ rows × frames-per-video.
    * Corrupt containers contribute zero rows; an individually undecodable frame
    * keeps its row with null pixel fields (the per-frame corrupt-file behavior).
    */
  def extractFrames(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").alias("id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeAviFrames(bytes).toSeq.flatMap { case (fps, frames) =>
            frames.zipWithIndex.map { case (fb, i) =>
              val img =
                try Option(ImageIO.read(new ByteArrayInputStream(fb)))
                catch { case _: java.io.IOException => None }
              img match {
                case Some(im) =>
                  val (w, h, mean, mn, mx) = rasterStats(im)
                  FrameFeatures(id, i, fps, Some(w), Some(h), Some(mean), Some(mn), Some(mx))
                case None =>
                  FrameFeatures(id, i, fps, None, None, None, None, None)
              }
            }
          }
        }
      }
      .toDF()
  }

  /** Band-0 statistics over a decoded image raster: (width, height, mean, min, max). */
  private def rasterStats(im: java.awt.image.BufferedImage): (Int, Int, Double, Int, Int) = {
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
    (iw, ih, ps.toDouble / (iw.toLong * ih), pmn, pmx)
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
      px_mean: Option[Double], px_min: Option[Int], px_max: Option[Int],
      sample_rate: Option[Int], n_samples: Option[Int],
      sample_mean: Option[Double], sample_min: Option[Int], sample_max: Option[Int])

  /** Partition-wise decode: consumes (id, format, payload) rows in batches and emits
    * fixed-shape features. JPEG/PNG payloads are REALLY decoded (ImageIO) into
    * width/height/pixel stats and WAV payloads into sample-rate/PCM statistics;
    * undecodable payloads and other formats keep the byte statistics with null
    * decode fields — the behavior a production pipeline wants for corrupt files
    * (feature row survives, decode fields null).
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
    * generated payloads are single-band gray); real RIFF/PCM parse for WAV. Video
    * containers decode per frame through [[extractFrames]] (one row per frame, not
    * a fixed-width feature row).
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
    val audio = if (format == "wav") decodeWavPcm8(bytes) else None
    val (sr, nS, sMean, sMin, sMax) = audio match {
      case Some((rate, samples)) if samples.nonEmpty =>
        var ss = 0L
        var smn = Int.MaxValue
        var smx = Int.MinValue
        var j = 0
        while (j < samples.length) {
          val v = samples(j)
          ss += v
          if (v < smn) smn = v
          if (v > smx) smx = v
          j += 1
        }
        (Some(rate), Some(samples.length),
          Some(ss.toDouble / samples.length), Some(smn), Some(smx))
      case _ => (None, None, None, None, None)
    }
    val (w, h, pMean, pMin, pMax) = img match {
      case Some(im) =>
        val (iw, ih, mean2, pmn, pmx) = rasterStats(im)
        (Some(iw), Some(ih), Some(mean2), Some(pmn), Some(pmx))
      case None => (None, None, None, None, None)
    }
    MediaFeatures(id, format, bytes.length, mean, if (bytes.isEmpty) 0 else mn, mx,
      bytes.take(8), w, h, pMean, pMin, pMax, sr, nS, sMean, sMin, sMax)
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
