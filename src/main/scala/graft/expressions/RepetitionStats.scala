package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Gopher-style repetition counters for one document, in one tokenization pass:
  * token count, the multiplicity of the most frequent token, total/distinct adjacent
  * word 2-grams and 3-grams, and the number of immediately-repeated tokens.
  *
  * Returns a struct of exact integer counts; ratio arithmetic stays in the query layer
  * so the DuckDB oracle can reproduce it bit-for-bit. The HOF composition
  * (`array_max(transform(array_distinct(toks), t -> size(filter(toks, …))))`) would
  * re-tokenize inside every lambda element (no CSE across lambda boundaries); this
  * expression is a single O(len) pass per row and stays codegen-friendly via a static
  * call, like [[WordShingles]].
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionStats.schema

  override def nullSafeEval(input: Any): Any =
    RepetitionStats.compute(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.RepetitionStats.compute($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("top_token", IntegerType, nullable = false),
    StructField("n2", IntegerType, nullable = false),
    StructField("d2", IntegerType, nullable = false),
    StructField("n3", IntegerType, nullable = false),
    StructField("d3", IntegerType, nullable = false),
    StructField("adj", IntegerType, nullable = false)))

  def compute(text: String): InternalRow = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val n = toks.length
    val counts = new scala.collection.mutable.HashMap[String, Int]
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.getOrElse(toks(i), 0) + 1
      counts.update(toks(i), c)
      if (c > top) top = c
      i += 1
    }
    val g2 = new scala.collection.mutable.HashSet[String]
    val g3 = new scala.collection.mutable.HashSet[String]
    var adj = 0
    i = 0
    while (i < n - 1) {
      if (toks(i) == toks(i + 1)) adj += 1
      g2.add(toks(i) + " " + toks(i + 1))
      if (i < n - 2) g3.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    InternalRow(n, top, math.max(n - 1, 0), g2.size, math.max(n - 2, 0), g3.size, adj)
  }
}
