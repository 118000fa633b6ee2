package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) over ONE
  * query's bounded candidate list: greedily pick `k` items maximizing
  * `λ·relevance − (1−λ)·max cosine to the already-selected set` — the classic
  * diversity re-rank between retrieval and the consumer.
  *
  * Input: `array<struct<id: long, rel: double, emb: array<double>>>` — the
  * candidates of one query, already bounded by the upstream top-N retrieval and
  * assembled by `collect_list` in a per-query aggregation. The greedy loop is
  * inherently sequential per query, but each query's work is O(k·N·dim) over a
  * BOUNDED N, and queries run data-parallel — so this is a row-local expression,
  * not a join or a shuffle.
  *
  * Deterministic: ties in the greedy argmax break to the EARLIEST candidate in the
  * input order (strict `>` scan) — feed candidates sorted (rank asc) for a stable
  * result. Returns the selected ids in pick order.
  */
case class MmrSelect(child: Expression, lambdaWeight: Double, k: Int)
  extends UnaryExpression {

  require(lambdaWeight >= 0.0 && lambdaWeight <= 1.0,
    s"lambdaWeight must be in [0,1], got $lambdaWeight")
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MmrSelect.select(v.asInstanceOf[ArrayData], lambdaWeight, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.MmrSelect.select($c, ${lambdaWeight}D, $k);")

  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

object MmrSelect {

  def select(cands: ArrayData, lam: Double, k: Int): ArrayData = {
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val embs = new Array[Array[Double]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      embs(i) = row.getArray(2).toDoubleArray()
      var s = 0.0
      val e = embs(i)
      var d = 0
      while (d < e.length) { s += e(d) * e(d); d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    def cos(a: Int, b: Int): Double = {
      if (norms(a) == 0.0 || norms(b) == 0.0) return 0.0
      val (x, y) = (embs(a), embs(b))
      var s = 0.0
      var d = 0
      val len = math.min(x.length, y.length)
      while (d < len) { s += x(d) * y(d); d += 1 }
      s / (norms(a) * norms(b))
    }
    val chosen = new Array[Boolean](n)
    val picked = new scala.collection.mutable.ArrayBuffer[Int](math.min(k, n))
    while (picked.length < math.min(k, n)) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!chosen(c)) {
          var maxSim = 0.0
          picked.foreach { p => val s = cos(c, p); if (s > maxSim) maxSim = s }
          val score = lam * rels(c) - (1.0 - lam) * maxSim
          if (score > bestScore) { bestScore = score; best = c } // first wins ties
        }
        c += 1
      }
      chosen(best) = true
      picked += best
    }
    new GenericArrayData(picked.map(ids(_)).toArray[Any])
  }
}
