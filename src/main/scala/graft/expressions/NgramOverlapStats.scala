package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Clipped n-gram overlap statistics of a (candidate, reference) string pair for
  * every order n = 1..maxN, in ONE row-local pass: per order, the multiset
  * intersection count Σ_g min(count_cand(g), count_ref(g)) plus both sides'
  * totals — the shared core of BLEU / ROUGE-N / chrF / token-F1.
  *
  * Both texts live in the same row, so the metrics need NO explode, NO hash
  * aggregation, NO join: the relational formulation shuffled ~2·Σ_n (len−n+1)
  * gram rows per pair through a (pair, n, gram) exchange and measured 4.7×
  * superlinear at a 4× scale step (chrF, SCALING.md round 9); this expression
  * replaces all of it with a codegen'd projection.
  *
  * `charMode = false`: grams over whitespace tokens (the [[WordShingles]]
  * convention). `charMode = true`: grams over the whitespace-stripped character
  * sequence (the [[CharShingles]] convention, chrF).
  *
  * Output: `array<struct<n:int, matched:long, cand_total:long, ref_total:long>>`
  * of length maxN (orders with no grams report explicit zeros).
  */
case class NgramOverlapStats(
    left: Expression,
    right: Expression,
    maxN: Int,
    charMode: Boolean) extends BinaryExpression with ImplicitCastInputTypes {
  require(maxN >= 1, s"maxN must be >= 1, got $maxN")

  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("matched", LongType, nullable = false),
    StructField("cand_total", LongType, nullable = false),
    StructField("ref_total", LongType, nullable = false))))

  override def nullSafeEval(l: Any, r: Any): Any =
    NgramOverlapStats.stats(l.toString, r.toString, maxN, charMode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""${ev.value} = graft.expressions.NgramOverlapStats.stats(
         |  $l.toString(), $r.toString(), $maxN, $charMode);""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramOverlapStats =
    copy(left = newLeft, right = newRight)
}

object NgramOverlapStats {

  def stats(cand: String, ref: String, maxN: Int, charMode: Boolean): GenericArrayData = {
    val c = units(cand, charMode)
    val r = units(ref, charMode)
    val out = new Array[Any](maxN)
    var n = 1
    while (n <= maxN) {
      val ct = math.max(0, c.length - n + 1)
      val rt = math.max(0, r.length - n + 1)
      var matched = 0L
      if (ct > 0 && rt > 0) {
        val counts = new java.util.HashMap[String, Integer](rt * 2)
        var j = 0
        while (j < rt) {
          counts.merge(gram(r, j, n, charMode), 1, (a, b) => a + b)
          j += 1
        }
        var i = 0
        while (i < ct) {
          val g = gram(c, i, n, charMode)
          val left = counts.get(g)
          if (left != null && left > 0) {
            matched += 1
            counts.put(g, left - 1)
          }
          i += 1
        }
      }
      out(n - 1) = new GenericInternalRow(
        Array[Any](n, matched, ct.toLong, rt.toLong)): InternalRow
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Word tokens or (whitespace-stripped) characters, as strings. */
  private def units(text: String, charMode: Boolean): Array[String] =
    if (charMode) {
      val sb = new java.lang.StringBuilder(text.length)
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        if (!(ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r' || ch == '\f'))
          sb.append(ch)
        i += 1
      }
      val s = sb.toString
      Array.tabulate(s.length)(k => String.valueOf(s.charAt(k)))
    } else text.trim.split("\\s+").filter(_.nonEmpty)

  private def gram(u: Array[String], start: Int, n: Int, charMode: Boolean): String =
    if (n == 1) u(start)
    else {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0 && !charMode) sb.append(' ')
        sb.append(u(start + j))
        j += 1
      }
      sb.toString
    }
}
