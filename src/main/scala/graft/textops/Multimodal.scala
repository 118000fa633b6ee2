package graft.textops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride through the pipeline as opaque
  * `binary` columns with typed metadata extracted by per-partition batch "decoders".
  *
  * The decode step itself is a STUB — this container has no image/audio codecs — but
  * deterministic, so the Spark-side plumbing (binary schema, mapPartitions batching,
  * typed output Dataset, partition-parallel execution) is real and testable. Swap
  * [[decodeStub]] for a JNI/codec call in production; everything around it stays.
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

  /** Per-partition metadata extraction over a binary column: one decoder instance per
    * partition (the expensive init a real codec would need), streaming rows through it.
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
          val (w, h, f) = decodeStub(bytes)
          MediaMeta(id, bytes.length.toLong, sb.toString, w, h, f)
        }
      }
  }
}
