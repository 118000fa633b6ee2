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
