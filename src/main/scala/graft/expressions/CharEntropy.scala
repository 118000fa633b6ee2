package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a string's character distribution — the
  * compression-ratio proxy a junk gate thresholds on: base64/minified/binary
  * spill scores high, boilerplate and repeated filler low, natural prose sits
  * in a narrow band. One row-local counting pass; the entropy sum runs in
  * SORTED-character order so the floating-point accumulation is reproducible
  * bit-for-bit by an oracle that sums a sorted list. Empty string → 0.
  */
case class CharEntropy(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharEntropy.entropy($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  private val Ln2 = math.log(2.0)

  def entropy(s: String): Double = {
    val n = s.length
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[Char, Int]()
    var i = 0
    while (i < n) {
      counts.merge(s.charAt(i), 1, (a, b) => a + b)
      i += 1
    }
    // ascending char order — the oracle sums the same sorted sequence
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      h += -p * (math.log(p) / Ln2)
    }
    h
  }
}
