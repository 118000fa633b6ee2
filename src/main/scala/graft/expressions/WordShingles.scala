package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ImplicitCastInputTypes, Expression, UnaryExpression}
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
  extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = ArrayType(StringType)
  override def inputTypes: Seq[DataType] = Seq(StringType)

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

/** Character n-gram shingles of a whitespace-stripped string, in one pass — the
  * chrF (Popović 2015) gram primitive. Composable HOFs would re-run the
  * whitespace strip inside the lambda for every gram (no CSE across HOF
  * boundaries — the [[WordShingles]] rationale); this strips once per row and
  * emits the grams by index.
  *
  * Whitespace is the explicit ASCII class `[ \t\n\r\f]` so the DuckDB
  * oracle's RE2 `regexp_replace` and Java agree character-for-character.
  */
case class CharShingles(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType)
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    CharShingles.shingle(input.toString, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CharShingles.shingle($c.toString(), $n);")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

object CharShingles {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  def shingle(text: String, n: Int): GenericArrayData = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      if (!isWs(text.charAt(i))) sb.append(text.charAt(i))
      i += 1
    }
    val s = sb.toString
    if (s.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](s.length - n + 1)
    var j = 0
    while (j <= s.length - n) {
      out(j) = UTF8String.fromString(s.substring(j, j + n))
      j += 1
    }
    new GenericArrayData(out)
  }
}
