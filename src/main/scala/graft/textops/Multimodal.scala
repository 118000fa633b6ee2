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
  * pipeline with stable fake dimensions. The pixel transforms (resize, frame
  * extraction) remain STUBS — this container has no scaler/video codecs — but the
  * Spark-side plumbing (binary schema, mapPartitions batching, once-per-partition
  * decoder init, typed output Dataset) is the production contract.
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

  /** Resize plumbing: per-partition batch transform binary → binary with target
    * dimensions. The pixel work is a STUB (deterministic byte subsample standing in
    * for a real scaler); the contract a production codec slots into — binary in/out,
    * once-per-partition codec init, output dims clamped to the source — is real.
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

  case class SampledFrame(
      id: Long,
      frame_index: Int,
      frame_md5: String)

  /** Frame sampling plumbing: explode each media payload into every `stride`-th frame
    * (one output row per sampled frame — the flatMap batch shape real video sampling
    * needs). Frame extraction is a STUB: the payload is split into `frames` equal
    * byte ranges (from the stub header) and each sampled range is fingerprinted.
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
        rows.flatMap { case (id, bytes) =>
          val (_, _, frames) = decodeStub(bytes)
          val span = math.max(1, bytes.length / frames)
          (0 until frames by stride).iterator.map { f =>
            val lo = f * span
            val hi = if (f == frames - 1) bytes.length else math.min(bytes.length, lo + span)
            val d = digest.digest(java.util.Arrays.copyOfRange(bytes, math.min(lo, hi), hi))
            val sb = new java.lang.StringBuilder(32)
            d.foreach { b => sb.append(hex((b >> 4) & 0xf)).append(hex(b & 0xf)) }
            SampledFrame(id, f, sb.toString)
          }
        }
      }
  }
}
