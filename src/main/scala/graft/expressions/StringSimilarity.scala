package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — needed for the J2 comparison levels; Spark has no built-in
  * (reference call site: python/arc/autolinker/autolinker.py:452-457 via Splink's
  * `jaro_winkler_at_thresholds`). Classic Winkler definition: Jaro similarity plus a
  * prefix bonus `min(prefix,4) * 0.1 * (1 - jaro)` applied only when `jaro > 0.7`
  * (the original boost threshold); either string empty → 0.0. Verified bit-exact
  * against DuckDB's `jaro_winkler_similarity`, which the correctness oracle uses.
  *
  * Implemented with `doGenCode` delegating to the static scorer so the expression stays
  * inside whole-stage codegen — this runs once per candidate pair, the hottest path of
  * the scorer at 100 TB.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.JaroWinkler.similarity($l.toString(), $r.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def jaro(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val matchDist = math.max(math.max(len1, len2) / 2 - 1, 0)
    val matched1 = new Array[Boolean](len1)
    val matched2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(len2 - 1, i + matchDist)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!matched2(j) && s1.charAt(i) == s2.charAt(j)) {
          matched1(i) = true
          matched2(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (matched1(i)) {
        while (!matched2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / len1 + m / len2 + (m - transpositions / 2.0) / m) / 3.0
  }

  def similarity(s1: String, s2: String): Double = {
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var prefix = 0
    val maxPrefix = math.min(4, math.min(s1.length, s2.length))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    j + prefix * 0.1 * (1.0 - j)
  }
}

/** Threshold-bounded Levenshtein distance: the exact distance when it is ≤ `threshold`,
  * −1 otherwise. The J2 gamma ladder only ever asks "is the distance within t", so the
  * DP runs a 2t+1-wide band (O(t·len) instead of O(len²)) over a code-point array and
  * exits as soon as every band cell exceeds t. Spark's built-in (even the 3-arg banded
  * form) pays per-cell UTF8String handling — measured ~4× slower on the 890k-pair
  * gamma scan this feeds.
  *
  * Semantics match `levenshtein(l, r) <= t` (and DuckDB's `levenshtein`, which the
  * correctness oracle uses): unit = one comparison per Unicode code point.
  */
case class BoundedLevenshtein(left: Expression, right: Expression, threshold: Int)
  extends BinaryExpression {
  require(threshold >= 0, s"threshold must be >= 0, got $threshold")
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshtein.within(a.toString, b.toString, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.BoundedLevenshtein.within(" +
        s"$l.toString(), $r.toString(), $threshold);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLevenshtein =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshtein {
  /** Edit distance if ≤ t, else −1 — over Unicode CODE POINTS, like Spark's built-in
    * and DuckDB's `levenshtein` (UTF-16 chars would double-count supplementary
    * characters). BMP-only strings (the overwhelming majority) take the cheap path
    * where chars are code points.
    */
  def within(s1: String, s2: String, t: Int): Int =
    withinCp(codePoints(s1), codePoints(s2), t)

  private def codePoints(s: String): Array[Int] = {
    val n = s.length
    val a = new Array[Int](n)
    var i = 0
    var k = 0
    var bmp = true
    while (i < n && bmp) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) bmp = false
      else { a(k) = c; k += 1; i += 1 }
    }
    if (bmp) a
    else s.codePoints().toArray
  }

  /** Two-row banded DP, cells outside the band = t+1. */
  private def withinCp(s1: Array[Int], s2: Array[Int], t: Int): Int = {
    val n = s1.length
    val m = s2.length
    if (math.abs(n - m) > t) return -1
    if (n == 0) return m // |n-m| <= t already guarantees m <= t
    if (m == 0) return n
    val inf = t + 1
    var prev = new Array[Int](m + 1)
    var curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= t) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val from = math.max(1, i - t)
      val to = math.min(m, i + t)
      // cells the previous row never wrote (outside its band) must read as inf
      if (i + t <= m) prev(i + t) = inf
      curr(0) = if (i <= t) i else inf
      if (from > 1) curr(from - 1) = inf
      var best = inf
      val c1 = s1(i - 1)
      j = from
      while (j <= to) {
        val cost = if (c1 == s2(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = curr(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        curr(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best >= inf) return -1 // whole band beyond t: distance can only grow
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    if (prev(m) <= t) prev(m) else -1
  }
}

/** Character-set Jaccard similarity: `|A∩B| / |A∪B|` over the distinct characters of
  * the two strings — the J2 `jaccard_at_thresholds` comparison metric. Matches DuckDB's
  * `jaccard()` (typo-sensitive on single-token attribute values, unlike token Jaccard);
  * either string empty → 0.0 (DuckDB errors there; callers guard).
  */
case class CharSetJaccard(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    CharSetJaccard.similarity(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.CharSetJaccard.similarity($l.toString(), $r.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharSetJaccard =
    copy(left = newLeft, right = newRight)
}

object CharSetJaccard {
  def similarity(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val a = s1.toSet
    val b = s2.toSet
    val union = (a ++ b).size
    if (union == 0) 0.0 else (a & b).size.toDouble / union
  }
}

/** Whitespace-token set Jaccard similarity: `|A∩B| / |A∪B|` over distinct tokens —
  * used by the document-dedup operators. Empty∪empty → 0.0.
  */
case class TokenSetJaccard(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    TokenSetJaccard.similarity(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.TokenSetJaccard.similarity($l.toString(), $r.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSetJaccard =
    copy(left = newLeft, right = newRight)
}

object TokenSetJaccard {
  def tokens(s: String): Set[String] = {
    val t = s.trim
    if (t.isEmpty) Set.empty else t.split("\\s+").toSet
  }
  def similarity(s1: String, s2: String): Double = {
    val a = tokens(s1)
    val b = tokens(s2)
    val union = (a ++ b).size
    if (union == 0) 0.0 else (a & b).size.toDouble / union
  }
}
