package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) subword encoding: `array<string>` whitespace
  * words → `array<string>` pieces via per-word VITERBI segmentation under a trained
  * piece → log-probability table (e.g. from `Curation.trainUnigramLm`) — the second
  * of the two real-world LLM tokenizer families next to [[BpeEncode]].
  *
  * Viterbi: `best(i) = max over j in [i-maxPieceLen, i) of best(j) + lp(word[j,i))`;
  * a single character absent from the table scores `unkLogprob` (a large negative
  * floor), so every word segments. Ties break DETERMINISTICALLY to the smallest
  * start `j` (the scan order uses strict `>`), i.e. the longest final piece — the
  * trainer's driver-side E-step calls the identical code, so training and serving
  * can never disagree on a segmentation.
  *
  * Same scale shape as [[VocabEncode]]/[[BpeEncode]]: the bounded piece table rides
  * the expression as a reference object, each row encodes inside whole-stage
  * codegen — no join, no shuffle; per-word cost O(len · maxPieceLen).
  */
case class UnigramEncode(
    child: Expression,
    pieces: Map[String, Double],
    unkLogprob: Double = UnigramEncode.UnkLogprob,
    maxPieceLen: Int = UnigramEncode.MaxPieceLen)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }

  override def nullSafeEval(v: Any): Any =
    UnigramEncode.encode(v.asInstanceOf[ArrayData], table, unkLogprob, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.UnigramEncode.encode($c, $tableRef, " +
        s"${unkLogprob}D, $maxPieceLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramEncode =
    copy(child = newChild)
}

object UnigramEncode {

  /** Floor log-prob for a single character absent from the piece table — low enough
    * that any in-table segmentation beats an unk path, high enough to stay finite. */
  val UnkLogprob: Double = -20.0

  val MaxPieceLen: Int = 8

  /** Viterbi-segment one word; shared verbatim by the serve expression and the
    * trainer's driver-side E-step. Returns the piece list (never empty for a
    * non-empty word). */
  def segment(
      word: String,
      table: java.util.HashMap[String, java.lang.Double],
      unk: Double,
      maxPieceLen: Int): Array[String] = {
    val n = word.length
    if (n == 0) return Array.empty
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      back(i) = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val lp = table.get(word.substring(j, i))
        val score =
          if (lp != null) best(j) + lp.doubleValue()
          else if (i - j == 1) best(j) + unk // unk only ever covers ONE char
          else Double.NegativeInfinity
        if (score > best(i)) { best(i) = score; back(i) = j } // strict >: first j wins ties
        j += 1
      }
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[String](4)
    var k = n
    while (k > 0) { out += word.substring(back(k), k); k = back(k) }
    out.reverseIterator.toArray
  }

  def encode(
      words: ArrayData,
      table: java.util.HashMap[String, java.lang.Double],
      unk: Double,
      maxPieceLen: Int): ArrayData = {
    val n = words.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n * 3)
    var i = 0
    while (i < n) {
      val ps = segment(words.getUTF8String(i).toString, table, unk, maxPieceLen)
      var j = 0
      while (j < ps.length) { out += UTF8String.fromString(ps(j)); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}
