package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ImplicitCastInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Length of the longest common subsequence of two string arrays — the ROUGE-L
  * (Lin 2004) core. Classic two-row DP, O(n·m) time and O(m) space per row, fully
  * row-local (zero shuffles; ROUGE-L runs over eval-set sentences, whose bounded
  * lengths keep the quadratic per-row cost flat). Null array elements are treated
  * as matching nothing.
  */
case class LcsLength(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = IntegerType
  // analysis-time type check: SQL misuse (non-array args) fails with a clear
  // error instead of a ClassCastException inside codegen
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def nullSafeEval(l: Any, r: Any): Any =
    LcsLength.lcs(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.LcsLength.lcs($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

object LcsLength {
  def lcs(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      j = 1
      while (j <= m) {
        val diag =
          if (ai != null && bs(j - 1) != null && ai.equals(bs(j - 1))) prev(j - 1) + 1
          else 0
        val best = math.max(math.max(prev(j), cur(j - 1)), diag)
        cur(j) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }
}
