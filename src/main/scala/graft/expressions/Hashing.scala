package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 8 bytes of md5(string) as a big-endian signed long.
  *
  * Bit-compatible with parsing the first 16 hex characters of `md5(s)`: hex char `j`
  * is nibble `(result >>> (60 − 4·j)) & 15`. SimHash needs those nibbles per token —
  * the string route (md5 hex string + 16 `substring`/`instr` probes) allocates ~17
  * UTF8Strings per row on a corpus-wide explode; this is one digest and shifts.
  * Portable: any engine reproduces it from its own md5 (the DuckDB oracle keeps the
  * hex-string form and hashes match exactly).
  */
case class Md5PrefixLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Md5PrefixLong.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Md5PrefixLong.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003):
  * Rabin-Karp rolling hashes of character `k`-grams (`h = (h·B + c) mod M`, computed
  * in O(len) with the leading term subtracted per step), then the minimum hash of
  * every sliding window of `w` positions, deduplicated and sorted.
  *
  * Character = UTF-16 code unit (≡ code point ≡ ASCII byte for ASCII text — the
  * DuckDB oracle reproduces the arithmetic with `ascii()` code points, so the
  * semantic is defined on code points ≤ BMP). B = 131, M = 1e9+7: every intermediate
  * fits a signed 64-bit integer in both engines.
  */
case class RollingFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    RollingFingerprints.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RollingFingerprints.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprints =
    copy(child = newChild)
}

object RollingFingerprints {
  val B = 131L
  val M = 1000000007L

  def compute(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val n = str.length
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    if (n < k) return empty
    // rolling k-gram hashes
    val nh = n - k + 1
    val hashes = new Array[Long](nh)
    var pow = 1L // B^(k-1) mod M
    var j = 1
    while (j < k) { pow = pow * B % M; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = (h * B + str.charAt(i)) % M; i += 1 }
    hashes(0) = h
    i = 1
    while (i < nh) {
      h = ((h - str.charAt(i - 1) * pow % M + M) % M * B + str.charAt(i + k - 1)) % M
      hashes(i) = h
      i += 1
    }
    // sliding-window minima via monotonic deque (O(nh))
    val win = math.min(w, nh)
    val mins = scala.collection.mutable.SortedSet[Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < nh) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - win) deque.pollFirst()
      if (i >= win - 1) mins += hashes(deque.peekFirst())
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins.toArray)
  }
}

/** MinHash signature of the distinct word n-gram shingle set, one pass per row.
  *
  * Element `j` (0-based) is `min(md5(concat(j, ':', shingle)))` over the shingles,
  * as the lowercase hex string — identical to the explode → k-min-aggregate
  * formulation (and its DuckDB oracle): hex encoding is order-preserving, so the
  * minimum is tracked on the 16 raw digest bytes and encoded once at the end.
  * NULL for a document with no shingles (fewer than `n` words) — exactly the rows
  * the aggregate formulation dropped.
  *
  * This replaces a corpus-wide shingle explode + shuffle through a k-column min
  * aggregate keyed by doc with a stateless projection: no shuffle at any scale.
  */
case class MinhashSignatures(child: Expression, k: Int, shingleN: Int)
  extends UnaryExpression {
  require(k >= 1 && shingleN >= 1, "k and shingleN must be positive")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    MinhashSignatures.compute(s.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value}_r =
         |  graft.expressions.MinhashSignatures.compute($c, $k, $shingleN);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatures =
    copy(child = newChild)
}

object MinhashSignatures {
  private val HexDigits = "0123456789abcdef".toCharArray

  // "j:" prefixes never change — precompute per hash index, cached across calls
  // (the k's seen by one executor are a handful of constants)
  @volatile private var prefixCache: Array[Array[Byte]] = Array.empty
  private def prefixes(k: Int): Array[Array[Byte]] = {
    val cached = prefixCache
    if (cached.length >= k) cached
    else {
      val built = Array.tabulate(k)(j =>
        (String.valueOf(j) + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      prefixCache = built
      built
    }
  }

  def compute(s: UTF8String, k: Int, shingleN: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val shingles = WordShingles.shingle(s.toString, shingleN, distinct = true)
    val n = shingles.numElements()
    if (n == 0) return null
    val md = Md5PrefixLong.threadDigest()
    val pre = prefixes(k)
    val mins = Array.ofDim[Byte](k, 16)
    var first = true
    var i = 0
    while (i < n) {
      // getBytes returns the UTF-8 bytes directly — no String decode/re-encode
      val shingleBytes = shingles.getUTF8String(i).getBytes
      var j = 0
      while (j < k) {
        md.reset()
        md.update(pre(j))
        md.update(shingleBytes)
        val d = md.digest()
        if (first || unsignedLess(d, mins(j))) System.arraycopy(d, 0, mins(j), 0, 16)
        j += 1
      }
      first = false
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((mins(j)(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(mins(j)(b) & 0xf)
        b += 1
      }
      out(j) = UTF8String.fromString(new String(hex))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}

/** 64-bit SimHash of the distinct whitespace-token set, one pass per row.
  *
  * Semantics are identical to the explode → 64-sum-aggregate formulation (and its
  * DuckDB oracle): tokens = `split(trim(s), "\\s+")` minus empties, deduplicated;
  * per token, bit `p` of the signature reads bit `60 − 4·(p/4) + p%4` of
  * [[Md5PrefixLong]] (hex nibble `p/4`, bit `p%4`); counters accumulate ±1 and bit
  * `p` is set when its counter ends ≥ 0. NULL for a token-less document — exactly
  * the rows the aggregate formulation dropped.
  *
  * This replaces a corpus-wide explode + shuffle (every token row through a 64-column
  * hash aggregate keyed by doc) with a stateless projection: no shuffle at any scale.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any): Any =
    SimHash64.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long ${ev.value}_r = graft.expressions.SimHash64.compute($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Boxed so a token-less document can yield SQL NULL. */
  def compute(s: UTF8String): java.lang.Long = {
    val str = s.toString.trim
    if (str.isEmpty) return null
    val seen = new java.util.HashSet[String]()
    val counters = new Array[Int](64)
    val parts = str.split("\\s+")
    var t = 0
    while (t < parts.length) {
      val tok = parts(t)
      if (tok.nonEmpty && seen.add(tok)) {
        val h = Md5PrefixLong.compute(UTF8String.fromString(tok))
        var p = 0
        while (p < 64) {
          val bit = (h >>> (60 - 4 * (p / 4) + p % 4)) & 1L
          counters(p) += (if (bit == 1L) 1 else -1)
          p += 1
        }
      }
      t += 1
    }
    if (seen.isEmpty) return null
    var sig = 0L
    var p = 0
    while (p < 64) {
      if (counters(p) >= 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

object Md5PrefixLong {
  // MessageDigest is not thread-safe and allocation is the expensive part — one
  // instance per executor thread, reset implicitly by digest()
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[expressions] def threadDigest(): MessageDigest = digests.get()

  def compute(s: UTF8String): Long = {
    val bytes = digests.get().digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 8) { acc = (acc << 8) | (bytes(i) & 0xffL); i += 1 }
    acc
  }
}
