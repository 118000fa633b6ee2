package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding: `array<string>` whitespace words → `array<string>` subword tokens,
  * applying a trained, bounded merge list (e.g. from `Curation.trainBpeMerges`).
  *
  * Each word splits to characters plus a terminal `</w>` marker; then the standard
  * Sennrich encode loop runs: repeatedly find the adjacent symbol pair with the
  * LOWEST merge rank present in the table and fuse its occurrences left-to-right,
  * until no adjacent pair has a rank. (Equivalent to applying merges in rank order:
  * a merge can only create adjacencies involving its own output symbol, which only
  * later-ranked merges reference.)
  *
  * Same scale shape as [[VocabEncode]]: the merge table is bounded (≤ ~100k pairs),
  * rides the expression as a reference object, and each row is encoded inside
  * whole-stage codegen — no join, no shuffle, corpus-sized work stays row-local.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // rank probe keyed on "left right" (a space can't occur inside a symbol:
  // words come from whitespace tokenization and the marker is `</w>`)
  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(v: Any): Any =
    BpeEncode.encode(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("bpeTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BpeEncode.encode($c, $tableRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {

  val WordEnd = "</w>"

  /** Encodes one word (chars + terminal marker) against the rank table. */
  private def encodeWord(
      word: String,
      table: java.util.HashMap[String, Integer],
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    syms += WordEnd
    var continue = syms.length > 1
    while (continue) {
      // lowest-rank adjacent pair present in the table
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = table.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = j }
        j += 1
      }
      if (best < 0) continue = false
      else {
        // fuse ALL occurrences of that pair, left-to-right
        val (l, r) = (syms(best), syms(best + 1))
        val next = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
            next += l + r; k += 2
          } else { next += syms(k); k += 1 }
        }
        syms = next
        continue = syms.length > 1
      }
    }
    syms.foreach(s => out += UTF8String.fromString(s))
  }

  def encode(words: ArrayData, table: java.util.HashMap[String, Integer]): ArrayData = {
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n * 4)
    var i = 0
    while (i < n) {
      encodeWord(words.getUTF8String(i).toString, table, out)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
