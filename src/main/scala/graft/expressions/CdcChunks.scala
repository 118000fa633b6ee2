package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Content-defined chunking of a binary column by gear rolling hash (the
  * FastCDC/rsync family: Xia et al. 2016) — the blob-dedup primitive for opaque
  * multimodal payloads, where fixed-size blocks would shift after a single inserted
  * byte but content-defined boundaries RESYNCHRONIZE: the bytes after a local edit
  * chunk identically, so shared chunks between near-identical blobs are found by a
  * plain chunk-hash equi-join.
  *
  * Boundary rule: roll `h = (h << 1) + gear(byte)` from the current chunk start; cut
  * after a byte when the chunk has reached `minSize` and `(h & mask) == 0` with
  * `mask = 2^avgBits − 1` (expected chunk size ≈ minSize + 2^avgBits), or
  * unconditionally at `maxSize`. The gear table is derived from md5 of the byte
  * value — deterministic everywhere, no RNG state to ship.
  *
  * Returns `array<struct<offset int, length int, hash long>>` where `hash` is the
  * FNV-1a 64 digest of the chunk's bytes — the join key for cross-blob dedup.
  * One O(len) codegen'd pass per row; no SQL form exists (the rolling hash is a
  * sequential prefix scan), so the operator is property-pinned in ScalaTest rather
  * than DuckDB-oracle'd.
  */
case class CdcChunks(child: Expression, minSize: Int, avgBits: Int, maxSize: Int)
  extends UnaryExpression {
  require(minSize >= 1, s"minSize must be positive, got $minSize")
  require(avgBits >= 1 && avgBits <= 30, s"avgBits must be in [1,30], got $avgBits")
  require(maxSize > minSize, s"maxSize ($maxSize) must exceed minSize ($minSize)")

  override def dataType: DataType = ArrayType(CdcChunks.schema, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]], minSize, avgBits, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CdcChunks.compute($c, $minSize, $avgBits, $maxSize);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  val schema: StructType = StructType(Seq(
    StructField("offset", IntegerType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false)))

  /** Deterministic gear table: first 8 md5 bytes of the byte value's decimal
    * string, big-endian — the same portable-md5 seeding the minhash/LSH family
    * uses, so the chunking reproduces on any engine or language.
    */
  private[expressions] val Gear: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { i =>
      val d = md.digest(i.toString.getBytes("UTF-8"))
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      h
    }
  }

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def compute(bytes: Array[Byte], minSize: Int, avgBits: Int, maxSize: Int): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << avgBits) - 1L
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if (len >= maxSize || (len >= minSize && (h & mask) == 0L) || i == n - 1) {
        var fnv = FnvOffset
        var j = start
        while (j <= i) { fnv = (fnv ^ (bytes(j) & 0xffL)) * FnvPrime; j += 1 }
        out += InternalRow(start, len, fnv)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
