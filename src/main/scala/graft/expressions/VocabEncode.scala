package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary encoding: `array<string>` tokens → `array<int>` ids, OOV → `unkId`.
  *
  * The vocabulary rides the expression as a reference object (same pattern as
  * [[NearestCentroid]]'s centroids): a per-token hash probe inside whole-stage
  * codegen — no join, no shuffle, no per-row map construction. This is the right
  * shape for applying a bounded (≤ ~1M entries) vocabulary to 100 TB of text; an
  * unbounded vocabulary would instead need the explode + broadcast-join route.
  *
  * Keys are stored as `UTF8String` so the probe compares the token bytes in place —
  * no per-token `String` decode on the hot path.
  */
case class VocabEncode(child: Expression, vocab: Map[String, Int], unkId: Int = 0)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(UTF8String.fromString(k), Integer.valueOf(v)) }
    m
  }

  override def nullSafeEval(v: Any): Any =
    VocabEncode.encode(v.asInstanceOf[ArrayData], table, unkId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("vocabTable", table, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VocabEncode.encode($c, $tableRef, $unkId);")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncode =
    copy(child = newChild)
}

object VocabEncode {
  def encode(
      tokens: ArrayData,
      table: java.util.HashMap[UTF8String, Integer],
      unk: Int): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val id = table.get(tokens.getUTF8String(i))
      out(i) = if (id == null) unk else id.intValue()
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Vocabulary decoding — the inverse of [[VocabEncode]]: `array<int>` ids →
  * `array<string>` tokens, unknown ids → `unkToken`. Same reference-object shape:
  * a bounded id→token table probed inside codegen, no join against the corpus.
  * `decode(encode(toks))` restores every in-vocabulary token exactly (OOV → unk).
  */
case class VocabDecode(child: Expression, vocab: Map[Int, String],
    unkToken: String = "<unk>") extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val table: java.util.HashMap[Integer, UTF8String] = {
    val m = new java.util.HashMap[Integer, UTF8String](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(Integer.valueOf(k), UTF8String.fromString(v)) }
    m
  }

  @transient private lazy val unkU8: UTF8String = UTF8String.fromString(unkToken)

  override def nullSafeEval(v: Any): Any =
    VocabDecode.decode(v.asInstanceOf[ArrayData], table, unkU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("vocabDecTable", table, "java.util.HashMap")
    val unkRef = ctx.addReferenceObj("vocabDecUnk", unkU8,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.VocabDecode.decode($c, $tableRef, $unkRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabDecode =
    copy(child = newChild)
}

object VocabDecode {
  def decode(
      ids: ArrayData,
      table: java.util.HashMap[Integer, UTF8String],
      unk: UTF8String): ArrayData = {
    val n = ids.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val t = table.get(Integer.valueOf(ids.getInt(i)))
      out(i) = if (t == null) unk else t
      i += 1
    }
    new GenericArrayData(out)
  }
}
