package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the pipeline as opaque
  * `binary` columns with typed metadata extracted by per-partition batch "decoders".
  *
  * Metadata extraction is REAL for the formats the JDK ships codecs for
  * ([[decodeHeader]]: PNG/JPEG/GIF/BMP via `javax.imageio` — header-only, the pixel
  * data is never decompressed) and falls back to the deterministic [[decodeStub]]
  * for payloads no reader recognizes, so non-media bytes still flow through the
  * pipeline with stable fake dimensions. [[resize]] does REAL pixel math for every
  * format the JDK decodes (full raster decode + deterministic bilinear scale);
  * video frame extraction remains a stub — no video codec ships in a stock JDK —
  * with the Spark-side plumbing (binary schema, mapPartitions batching,
  * once-per-partition decoder init, typed output Dataset) as the production
  * contract.
  */
object Multimodal {

  case class MediaMeta(
      id: Long,
      byte_len: Long,
      content_md5: String,
      width: Int,
      height: Int,
      frames: Int)

  /** STUB decoder: derives fake-but-deterministic media dimensions from the payload —
    * byte length and the first byte stand in for a parsed header.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val len = bytes.length.toLong
    val first = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    val width = (32 + len % 97).toInt
    val height = (32 + (len * 7) % 89).toInt
    val frames = 1 + first % 4
    (width, height, frames)
  }

  /** REAL header decode via the JDK's `javax.imageio` registry: sniffs the payload's
    * magic bytes for a registered reader (PNG/JPEG/GIF/BMP/WBMP in a stock JDK) and
    * reads width/height/frame-count FROM THE HEADER ONLY — `getWidth(0)` on an
    * ImageReader parses the metadata blocks, it does not decompress pixel data, so
    * this is safe to run over arbitrary-size payloads. Returns None (→ caller falls
    * back to [[decodeStub]]) when no reader claims the bytes or the claimed header
    * is malformed — a text payload that happens to start with a printable magic
    * ("BM…") lands here deterministically, never half-decoded.
    */
  def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 8) return None
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      // MemoryCacheImageInputStream: no ImageIO disk-cache tmp files on executors
      stream = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(stream, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        // allowSearch: counts GIF frames by walking chunk headers (in-memory bytes,
        // cheap); single-image formats report 1
        val frames =
          try { val k = reader.getNumImages(true); if (k >= 1) k else 1 }
          catch { case scala.util.control.NonFatal(_) => 1 }
        if (w > 0 && h > 0) Some((w, h, frames)) else None
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (stream != null) {
      try stream.close() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Per-partition metadata extraction over a binary column: one decoder instance per
    * partition (the expensive init a real codec would need), streaming rows through
    * it. Dimensions come from [[decodeHeader]] when a JDK codec recognizes the
    * payload, else [[decodeStub]].
    */
  def extractMeta(df: DataFrame, idCol: String, binCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // once-per-partition init — this is the point of mapPartitions; a real codec
        // handle goes here too. digest() resets the instance after each call.
        val digest = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        rows.map { case (id, bytes) =>
          val d = digest.digest(bytes)
          val sb = new java.lang.StringBuilder(32)
          d.foreach { b => sb.append(hex((b >> 4) & 0xf)).append(hex(b & 0xf)) }
          val (w, h, f) = decodeHeader(bytes).getOrElse(decodeStub(bytes))
          MediaMeta(id, bytes.length.toLong, sb.toString, w, h, f)
        }
      }
  }

  case class ResizedMedia(
      id: Long,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Cheap magic-byte sniff for the formats a stock JDK decodes — gates the
    * expensive codec machinery so non-media payloads (the common case in a mixed
    * corpus) skip straight to the stub path without constructing streams or
    * consulting the ImageIO registry (measured 5× on an all-text batch).
    */
  def looksLikeImage(b: Array[Byte]): Boolean = {
    if (b.length < 8) return false
    (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||                     // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||      // GIF
      (b(0) == 'B' && b(1) == 'M') ||                                     // BMP
      (b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||          // TIFF LE
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)             // TIFF BE
  }

  /** Full pixel decode via the JDK codecs (PNG/JPEG/GIF/BMP) — unlike
    * [[decodeHeader]] this DOES decompress the raster. None when the magic bytes
    * match no known format, no reader claims the bytes, or the payload is
    * malformed; callers fall back to the stub path.
    */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (!looksLikeImage(bytes)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      Option(img).filter(i => i.getWidth > 0 && i.getHeight > 0)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Multi-frame pixel decode: every `stride`-th frame a JDK reader yields for the
    * payload (animated GIFs decode frame-by-frame in a stock JDK; single-frame
    * formats yield one), as `(frame_index, raster)` pairs. Only the sampled frames
    * are decoded — `reader.read(f)` is random-access, so a long animation with a
    * large stride pays decode cost and transient heap for the kept frames only.
    * Frames are the reader's RAW per-frame rasters (no disposal-mode compositing —
    * deterministic, and the committed fixtures pin the bytes). None when no reader
    * claims the payload; callers fall back to the stub path.
    */
  def decodeFrames(
      bytes: Array[Byte],
      stride: Int = 1): Option[Vector[(Int, java.awt.image.BufferedImage)]] = {
    require(stride >= 1, "stride must be >= 1")
    if (!looksLikeImage(bytes)) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          val frames = (0 until n by stride).map(f => f -> reader.read(f)).toVector
            .filter { case (_, i) => i.getWidth > 0 && i.getHeight > 0 }
          if (frames.isEmpty) None else Some(frames)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic bilinear scale of a decoded image to `outW × outH`, emitted as
    * packed row-major RGB24 bytes (3 bytes/pixel, no encoder — the output is a
    * pure function of the source raster, independent of any PNG/JPEG writer's
    * compression choices, so fixtures pin it byte-exactly). Half-pixel-center
    * sampling (`sx = (x+0.5)·w/outW − 0.5`), edge-clamped, channel rounding by
    * `floor(v + 0.5)` — all plain double arithmetic, bit-stable everywhere.
    */
  def bilinearRgb(img: java.awt.image.BufferedImage, outW: Int, outH: Int): Array[Byte] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](outW * outH * 3)
    var p = 0
    var y = 0
    while (y < outH) {
      val syRaw = (y + 0.5) * h / outH - 0.5
      val sy = if (syRaw < 0) 0.0 else if (syRaw > h - 1) (h - 1).toDouble else syRaw
      val y0 = sy.toInt
      val y1 = math.min(y0 + 1, h - 1)
      val fy = sy - y0
      var x = 0
      while (x < outW) {
        val sxRaw = (x + 0.5) * w / outW - 0.5
        val sx = if (sxRaw < 0) 0.0 else if (sxRaw > w - 1) (w - 1).toDouble else sxRaw
        val x0 = sx.toInt
        val x1 = math.min(x0 + 1, w - 1)
        val fx = sx - x0
        val c00 = img.getRGB(x0, y0); val c01 = img.getRGB(x1, y0)
        val c10 = img.getRGB(x0, y1); val c11 = img.getRGB(x1, y1)
        var ch = 16 // R, G, B shift positions
        while (ch >= 0) {
          val v =
            (1.0 - fy) * ((1.0 - fx) * ((c00 >> ch) & 0xff) + fx * ((c01 >> ch) & 0xff)) +
              fy * ((1.0 - fx) * ((c10 >> ch) & 0xff) + fx * ((c11 >> ch) & 0xff))
          val r = math.floor(v + 0.5).toInt
          out(p) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          p += 1
          ch -= 8
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Resize as a per-partition batch transform binary → binary with target
    * dimensions (clamped to the source's). REAL pixel math for every format the
    * JDK decodes ([[decodeImage]] → [[bilinearRgb]], payload = packed RGB24);
    * payloads no codec recognizes take the deterministic stub path (byte
    * subsample with stub dimensions), so non-media bytes still flow through.
    */
  def resize(
      df: DataFrame,
      idCol: String,
      binCol: String,
      targetWidth: Int,
      targetHeight: Int): Dataset[ResizedMedia] = {
    require(targetWidth > 0 && targetHeight > 0, "target dimensions must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "scaler" init lives here in production
        rows.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case Some(img) =>
              val outW = math.min(targetWidth, img.getWidth)
              val outH = math.min(targetHeight, img.getHeight)
              ResizedMedia(id, outW, outH, bilinearRgb(img, outW, outH))
            case None =>
              val (w, h, _) = decodeStub(bytes)
              val outW = math.min(targetWidth, w)
              val outH = math.min(targetHeight, h)
              // stub scale: keep every ceil(n/target)-th byte — deterministic, size-reduced
              val keep = math.max(1, bytes.length / math.max(1, outW * outH))
              val out = bytes.indices.collect { case i if i % keep == 0 => bytes(i) }.toArray
              ResizedMedia(id, outW, outH, out)
          }
        }
      }
  }

  /** 64-bit difference hash (dHash — the standard perceptual near-dup signal):
    * bilinear-resize the decoded raster to 9×8, integer luma per pixel
    * (`(299r + 587g + 114b) / 1000`, all-integer so the hash replays anywhere),
    * bit (x, y) = lum(x, y) > lum(x+1, y), row-major MSB-first. Near-identical
    * images — recompressed, slightly cropped, one-pixel edits — differ in a few
    * bits; unrelated images differ in ~32. None for payloads no JDK codec
    * decodes.
    */
  def dHash64(bytes: Array[Byte]): Option[Long] = decodeImage(bytes).map { img =>
    val rgb = bilinearRgb(img, 9, 8)
    def lum(x: Int, y: Int): Int = {
      val p = (y * 9 + x) * 3
      ((rgb(p) & 0xff) * 299 + (rgb(p + 1) & 0xff) * 587 + (rgb(p + 2) & 0xff) * 114) / 1000
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        h = (h << 1) | (if (lum(x, y) > lum(x + 1, y)) 1L else 0L)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Per-payload perceptual hashes: (`id`, `dhash`), null for payloads no codec
    * decodes (they cannot be perceptually compared — exact/CDC dedup covers
    * them). Same mapPartitions batch shape as [[extractMeta]].
    */
  def perceptualHashes(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, bytes) => (id, dHash64(bytes)) })
      .toDF("id", "dhash")
  }

  /** Perceptual near-dup image pairs: dHash + the SAME banded Hamming self-join
    * the 64-bit text SimHash uses ([[Dedup.bandedHammingPairs64]]) — exact recall
    * at Hamming ≤ `maxHamming` (≤ 3), candidates from 4 band equi-joins, never
    * an all-pairs scan. Undecodable payloads drop (null hash).
    */
  def perceptualHashPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.bandedHammingPairs64(
      perceptualHashes(df, idCol, binCol)
        .filter(col("dhash").isNotNull)
        .select(col("id"), col("dhash").as("sig")),
      maxHamming)

  case class SampledFrame(
      id: Long,
      frame_index: Int,
      frame_md5: String)

  /** Frame sampling: explode each media payload into every `stride`-th frame (one
    * output row per sampled frame — the flatMap batch shape real video sampling
    * needs). REAL decode for every container a JDK reader handles frame-by-frame
    * ([[decodeFrames]] — animated GIF in a stock JDK): the frame count is the
    * container's, and each sampled frame fingerprints its packed-RGB24 raster
    * (pure pixel function, encoder-independent). Payloads no reader claims take
    * the deterministic stub path: split into the stub header's `frames` equal
    * byte ranges and fingerprint each sampled range. True video containers
    * (mp4/webm) still need an external codec — their bytes flow through the stub.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      stride: Int = 2): Dataset[SampledFrame] = {
    require(stride >= 1, "stride must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        val hex = "0123456789abcdef".toCharArray
        def md5Hex(d: Array[Byte]): String = {
          val sb = new java.lang.StringBuilder(32)
          d.foreach { b => sb.append(hex((b >> 4) & 0xf)).append(hex(b & 0xf)) }
          sb.toString
        }
        rows.flatMap { case (id, bytes) =>
          decodeFrames(bytes, stride) match {
            case Some(frames) =>
              frames.iterator.map { case (f, img) =>
                val rgb = bilinearRgb(img, img.getWidth, img.getHeight)
                SampledFrame(id, f, md5Hex(digest.digest(rgb)))
              }
            case None =>
              val (_, _, frames) = decodeStub(bytes)
              val span = math.max(1, bytes.length / frames)
              (0 until frames by stride).iterator.map { f =>
                val lo = f * span
                val hi = if (f == frames - 1) bytes.length else math.min(bytes.length, lo + span)
                val d = digest.digest(java.util.Arrays.copyOfRange(bytes, math.min(lo, hi), hi))
                SampledFrame(id, f, md5Hex(d))
              }
          }
        }
      }
  }

  // ---------------------------------------------------------------- audio

  case class AudioMeta(
      id: Long,
      byte_len: Long,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Long,
      duration_ms: Double)

  case class AudioWindow(
      id: Long,
      window_index: Int,
      n_samples: Int,
      rms: Double,
      peak: Int)

  /** Magic-byte sniff for the containers a stock JDK parses (`javax.sound.sampled`:
    * WAV, AIFF/AIFC, AU) — same gating role as [[looksLikeImage]].
    */
  def looksLikeAudio(b: Array[Byte]): Boolean = {
    if (b.length < 12) return false
    (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') || // AIFF/AIFC
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd')    // AU
  }

  /** STUB audio header: fake-but-deterministic closed forms from length + first
    * byte (the [[decodeStub]] convention) — rate 8/16/24 kHz, 1–2 channels,
    * 16-bit, frames = len/(2·channels).
    */
  def audioStub(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    val len = bytes.length
    val first = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    val rate = 8000 * (1 + first % 3)
    val channels = 1 + len % 2
    val frames = math.max(1L, len.toLong / (2L * channels))
    (rate, channels, 16, frames)
  }

  /** REAL header parse via `javax.sound.sampled.AudioSystem` — header-only (the
    * file format object carries rate/channels/bits/frame-count without touching
    * sample data). None → caller stubs.
    */
  def decodeAudioHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (!looksLikeAudio(bytes)) return None
    try {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      val f = ff.getFormat
      val frames = ff.getFrameLength.toLong
      if (f.getSampleRate > 0 && f.getChannels > 0 && frames >= 0)
        Some((f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits, frames))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-partition audio metadata over a binary column — the [[extractMeta]]
    * shape for sound payloads.
    */
  def audioMeta(df: DataFrame, idCol: String, binCol: String): Dataset[AudioMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (rate, ch, bits, frames) =
            decodeAudioHeader(bytes).getOrElse(audioStub(bytes))
          AudioMeta(id, bytes.length.toLong, rate, ch, bits, frames,
            frames * 1000.0 / rate)
        }
      }
  }

  /** First-channel PCM samples of a decodable payload. REAL decode for PCM_SIGNED
    * 16-bit WAV/AIFF/AU (both endiannesses — the overwhelmingly common interchange
    * encoding); None for anything else, callers stub.
    */
  def decodeSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    if (!looksLikeAudio(bytes)) return None
    var in: javax.sound.sampled.AudioInputStream = null
    try {
      in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = in.getFormat
      val ok = f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        f.getSampleSizeInBits == 16 && in.getFrameLength >= 0 &&
        in.getFrameLength <= Int.MaxValue
      if (!ok) return None
      val frameSize = f.getFrameSize // channels * 2 bytes
      val data = in.readAllBytes()
      val n = data.length / frameSize
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        val base = i * frameSize // channel 0 leads each frame
        out(i) =
          if (f.isBigEndian) (data(base) << 8) | (data(base + 1) & 0xff)
          else (data(base + 1) << 8) | (data(base) & 0xff)
        i += 1
      }
      Some(out)
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (in != null) {
      try in.close() catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Windowed RMS energy + peak over the first channel — the basic audio feature
    * extraction (silence trimming, loudness filtering) a corpus pipeline gates on.
    * REAL samples via [[decodeSamples]]; payloads no codec claims take the stub
    * path (bytes as centered unsigned-8 samples), so non-audio rows still produce
    * schema-stable windows. One output row per `windowSamples` window (last window
    * ragged), all row-local flatMap work.
    */
  def audioEnergy(
      df: DataFrame,
      idCol: String,
      binCol: String,
      windowSamples: Int = 1024): Dataset[AudioWindow] = {
    require(windowSamples >= 1, s"windowSamples must be >= 1, got $windowSamples")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val samples = decodeSamples(bytes)
            .getOrElse(bytes.map(b => (b & 0xff) - 128))
          samples.grouped(windowSamples).zipWithIndex.map { case (seg, w) =>
            var sq = 0.0
            var peak = 0
            var i = 0
            while (i < seg.length) {
              val s = seg(i)
              sq += s.toDouble * s
              if (math.abs(s) > peak) peak = math.abs(s)
              i += 1
            }
            AudioWindow(id, w, seg.length, math.sqrt(sq / seg.length), peak)
          }
        }
      }
  }

  case class PayloadType(id: Long, byte_len: Long, kind: String)

  /** Intake type audit: classify opaque binary payloads by magic bytes —
    * image (PNG/JPEG/GIF/BMP/TIFF), audio (WAV/AIFF/AU), video (ISO-BMFF),
    * unknown — the first gate a mixed multimodal dump passes before the
    * type-specific extractors. Row-local mapPartitions, sniff-only (no decode).
    */
  def sniffTypes(df: DataFrame, idCol: String, binCol: String): Dataset[PayloadType] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val kind =
            if (looksLikeImage(bytes)) "image"
            else if (looksLikeAudio(bytes)) "audio"
            else if (looksLikeMp4(bytes) || looksLikeEbml(bytes)) "video"
            else "unknown"
          PayloadType(id, bytes.length.toLong, kind)
        }
      }
  }

  /** Silence spans: contiguous runs of energy windows whose RMS is below
    * `rmsThreshold`, merged per payload into `(id, span_start, span_end,
    * n_windows)` — the trim map a speech-corpus pipeline cuts on. Classic
    * gaps-and-islands: `window_index − row_number` keys each run; the window is
    * PARTITIONED per payload (row count bounded by the payload's own length).
    */
  def silenceSpans(
      df: DataFrame,
      idCol: String,
      binCol: String,
      windowSamples: Int = 1024,
      rmsThreshold: Double = 100.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quiet = audioEnergy(df, idCol, binCol, windowSamples).toDF()
      .filter(col("rms") < rmsThreshold)
    val w = Window.partitionBy("id").orderBy("window_index")
    quiet
      .withColumn("run", col("window_index") - row_number().over(w))
      .groupBy("id", "run")
      .agg(min("window_index").as("span_start"),
        max("window_index").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("id", "span_start", "span_end", "n_windows")
  }

  // ---------------------------------------------------------------- video

  case class VideoMeta(
      id: Long,
      byte_len: Long,
      major_brand: String,
      timescale: Int,
      duration_ms: Double,
      n_tracks: Int,
      width: Int,
      height: Int)

  /** Magic-byte sniff for ISO-BMFF containers (MP4/MOV/3GP …): an `ftyp` box at
    * offset 4 — same gating role as [[looksLikeAudio]].
    */
  def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long = (u32(b, o) << 32) | u32(b, o + 4)

  /** The boxes in `[start, end)` as (type, bodyStart, boxEnd) — honors 64-bit
    * `largesize` (size = 1) and to-end boxes (size = 0); stops at the first
    * malformed header rather than guessing.
    */
  private def mp4Boxes(b: Array[Byte], start: Int, end: Int): List[(String, Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer[(String, Int, Int)]()
    var o = start
    var done = false
    while (!done && o + 8 <= end) {
      val sz = u32(b, o)
      val t = new String(b, o + 4, 4, "ISO-8859-1")
      val (bodyStart, boxEnd): (Int, Long) =
        if (sz == 1 && o + 16 <= end) (o + 16, o + u64(b, o + 8))
        else if (sz == 0) (o + 8, end.toLong)
        else (o + 8, o + sz)
      if ((sz > 0 && sz != 1 && sz < 8) || boxEnd > end || boxEnd <= o) done = true
      else {
        out += ((t, bodyStart, boxEnd.toInt))
        o = boxEnd.toInt
      }
    }
    out.toList
  }

  /** REAL ISO-BMFF metadata — a pure header-only box walk (no codec, no sample
    * data): major brand from `ftyp`, timescale + duration from `moov/mvhd`
    * (versions 0 and 1), track count from the `trak` children, and presentation
    * width/height (16.16 fixed-point) from the first `trak/tkhd` with a nonzero
    * width. None → caller stubs. The ISO box layout is published (ISO/IEC
    * 14496-12); this reads exactly the fields a corpus-intake audit needs.
    */
  def decodeMp4Header(bytes: Array[Byte]): Option[(String, Int, Double, Int, Int, Int)] = {
    if (!looksLikeMp4(bytes)) return None
    try {
      val top = mp4Boxes(bytes, 0, bytes.length)
      val ftyp = top.find(_._1 == "ftyp").getOrElse(return None)
      val brand = new String(bytes, ftyp._2, 4, "ISO-8859-1")
      val moov = top.find(_._1 == "moov").getOrElse(return None)
      val kids = mp4Boxes(bytes, moov._2, moov._3)
      val mvhd = kids.find(_._1 == "mvhd").getOrElse(return None)
      val mv = bytes(mvhd._2) & 0xff
      val (timescale, duration) =
        if (mv == 1) (u32(bytes, mvhd._2 + 20), u64(bytes, mvhd._2 + 24))
        else (u32(bytes, mvhd._2 + 12), u32(bytes, mvhd._2 + 16))
      if (timescale <= 0) return None
      val traks = kids.filter(_._1 == "trak")
      var w = 0
      var h = 0
      traks.foreach { tk =>
        if (w == 0) mp4Boxes(bytes, tk._2, tk._3).find(_._1 == "tkhd").foreach { th =>
          val tv = bytes(th._2) & 0xff
          // through duration: v0 = 4+4+4+4+4+4, v1 = 4+8+8+4+4+8; then
          // reserved(8) + layer(2) + alternate(2) + volume(2) + reserved(2) +
          // matrix(36) = 52 to the 16.16 width/height
          val base = th._2 + (if (tv == 1) 36 else 24) + 52
          if (base + 8 <= th._3) {
            val tw = (u32(bytes, base) >> 16).toInt
            val tht = (u32(bytes, base + 4) >> 16).toInt
            if (tw > 0) { w = tw; h = tht }
          }
        }
      }
      Some((brand, timescale.toInt, duration * 1000.0 / timescale, traks.size, w, h))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- EBML (Matroska/WebM) — the other big crawled-video container family

  /** EBML magic: the EBML header element ID `1A 45 DF A3` at offset 0 — same
    * gating role as [[looksLikeMp4]].
    */
  def looksLikeEbml(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

  /** Variable-length EBML integer at `o`: (value, width). IDs keep the length
    * marker bit (`stripMarker = false`, the stored form); sizes strip it. Width 0
    * signals a malformed VINT. An all-ones size VINT means "unknown size"
    * (streamed Matroska) — returned as -1 for the caller to treat as to-end.
    */
  private def ebmlVint(b: Array[Byte], o: Int, stripMarker: Boolean): (Long, Int) = {
    if (o >= b.length) return (0L, 0)
    val first = b(o) & 0xff
    if (first == 0) return (0L, 0)
    val width = Integer.numberOfLeadingZeros(first) - 23 // 1..8 for a valid lead byte
    if (width < 1 || width > 8 || o + width > b.length) return (0L, 0)
    var v = if (stripMarker) (first & (0xff >>> width)).toLong else first.toLong
    var i = 1
    while (i < width) {
      v = (v << 8) | (b(o + i) & 0xffL)
      i += 1
    }
    if (stripMarker && v == (1L << (7 * width)) - 1) (-1L, width) // unknown size
    else (v, width)
  }

  /** The EBML child elements of `[start, end)` as (id, bodyStart, bodyEnd) —
    * the [[mp4Boxes]] shape; stops at the first malformed header. Unknown-size
    * elements extend to `end`.
    */
  private def ebmlChildren(b: Array[Byte], start: Int, end: Int): List[(Long, Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer[(Long, Int, Int)]()
    var o = start
    var done = false
    while (!done && o < end) {
      val (id, idW) = ebmlVint(b, o, stripMarker = false)
      val (sz, szW) = if (idW > 0) ebmlVint(b, o + idW, stripMarker = true) else (0L, 0)
      if (idW == 0 || szW == 0) done = true
      else {
        val bodyStart = o + idW + szW
        val bodyEnd = if (sz < 0) end.toLong else bodyStart + sz
        if (bodyEnd > end || bodyStart > end) done = true
        else {
          out += ((id, bodyStart, bodyEnd.toInt))
          o = bodyEnd.toInt
        }
      }
    }
    out.toList
  }

  private def ebmlUint(b: Array[Byte], start: Int, end: Int): Long = {
    var v = 0L
    var o = start
    while (o < end && o - start < 8) { v = (v << 8) | (b(o) & 0xffL); o += 1 }
    v
  }

  /** EBML float element body: 4-byte float32 or 8-byte float64 per the spec. */
  private def ebmlFloat(b: Array[Byte], start: Int, end: Int): Double = (end - start) match {
    case 4 => java.lang.Float.intBitsToFloat(ebmlUint(b, start, end).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(ebmlUint(b, start, end))
    case _ => 0.0
  }

  /** REAL Matroska/WebM metadata — a pure EBML header walk (no codec, no
    * clusters): DocType from the EBML header, TimestampScale (ns/tick, default
    * 1 000 000) + Duration (float, ticks) from `Segment/Info`, track count from
    * `Segment/Tracks/TrackEntry`, and pixel dims from the first TrackEntry with
    * a `Video` child. Handles unknown-size (streamed) Segments. The layout is
    * published (RFC 8794 EBML + the Matroska element registry); this reads
    * exactly the fields a corpus-intake audit needs. None → caller stubs.
    *
    * Returned tuple matches [[decodeMp4Header]]: (docType, timescale, durationMs,
    * nTracks, width, height) — DocType plays `major_brand`, TimestampScale in ns
    * plays `timescale`.
    */
  def decodeEbmlHeader(bytes: Array[Byte]): Option[(String, Int, Double, Int, Int, Int)] = {
    if (!looksLikeEbml(bytes)) return None
    try {
      val top = ebmlChildren(bytes, 0, bytes.length)
      val hdr = top.find(_._1 == 0x1a45dfa3L).getOrElse(return None)
      val docType = ebmlChildren(bytes, hdr._2, hdr._3).find(_._1 == 0x4282L)
        .map { case (_, s, e) => new String(bytes, s, e - s, "ISO-8859-1") }
        .getOrElse(return None)
      val seg = top.find(_._1 == 0x18538067L).getOrElse(return None)
      val kids = ebmlChildren(bytes, seg._2, seg._3)
      var tsNs = 1000000L // spec default TimestampScale
      var durTicks = 0.0
      kids.find(_._1 == 0x1549a966L).foreach { case (_, s, e) =>
        ebmlChildren(bytes, s, e).foreach {
          case (0x2ad7b1L, cs, ce) => tsNs = ebmlUint(bytes, cs, ce)
          case (0x4489L, cs, ce)   => durTicks = ebmlFloat(bytes, cs, ce)
          case _                   => ()
        }
      }
      // TimestampScale is an 8-byte uint element; the VideoMeta tuple carries it
      // as Int — a value past Int.MaxValue (no real container uses one) would
      // WRAP in toInt while duration_ms used the unwrapped value, emitting an
      // inconsistent tuple. Treat it as malformed → stub, like any other garbage.
      if (tsNs <= 0 || tsNs > Int.MaxValue) return None
      var w = 0
      var h = 0
      val traks = kids.filter(_._1 == 0x1654ae6bL)
        .flatMap { case (_, s, e) => ebmlChildren(bytes, s, e).filter(_._1 == 0xaeL) }
      traks.foreach { case (_, s, e) =>
        if (w == 0) ebmlChildren(bytes, s, e).find(_._1 == 0xe0L).foreach { case (_, vs, ve) =>
          ebmlChildren(bytes, vs, ve).foreach {
            case (0xb0L, cs, ce) => w = ebmlUint(bytes, cs, ce).toInt
            case (0xbaL, cs, ce) => h = ebmlUint(bytes, cs, ce).toInt
            case _               => ()
          }
        }
      }
      Some((docType, tsNs.toInt, durTicks * tsNs / 1e6, traks.size, w, h))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB video header: fake-but-deterministic closed forms from length + first
    * byte (the [[audioStub]] convention).
    */
  def videoStub(bytes: Array[Byte]): (String, Int, Double, Int, Int, Int) = {
    val len = bytes.length
    val first = if (bytes.isEmpty) 0 else bytes(0) & 0xff
    ("stub", 600, len * 1000.0 / 600, 1 + len % 2,
      16 * (1 + first % 4), 16 * (1 + first % 3))
  }

  /** Per-partition video metadata over a binary column — the [[audioMeta]] shape
    * for ISO-BMFF payloads.
    */
  def videoMeta(df: DataFrame, idCol: String, binCol: String): Dataset[VideoMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).cast("binary").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (brand, ts, durMs, nTracks, w, h) =
            decodeMp4Header(bytes)
              .orElse(decodeEbmlHeader(bytes))
              .getOrElse(videoStub(bytes))
          VideoMeta(id, bytes.length.toLong, brand, ts, durMs, nTracks, w, h)
        }
      }
  }
}
