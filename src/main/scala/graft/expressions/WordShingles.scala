package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a string, in one pass.
  *
  * The composable form — `transform(sequence(...), i -> concat_ws(element_at(tokens)))`
  * — re-evaluates the regex tokenization inside the lambda for every shingle element
  * (Catalyst does no CSE across higher-order-function boundaries), which made shingling
  * dominate the dedup scans. This expression tokenizes once per row.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType)

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.toString, n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WordShingles.shingle($c.toString(), $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def shingle(text: String, n: Int, distinct: Boolean): GenericArrayData = {
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length - n + 1)
    val seen = if (distinct) new scala.collection.mutable.HashSet[String] else null
    var i = 0
    while (i <= words.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen == null || seen.add(s)) out += UTF8String.fromString(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
