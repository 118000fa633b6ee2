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
