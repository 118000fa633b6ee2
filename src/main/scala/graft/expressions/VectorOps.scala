package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive-loop dot product over two `array<double>` columns.
  *
  * The `zip_with + aggregate` higher-order-function form allocates per-element structs
  * per row; on an all-pairs similarity scan that allocation dominates. This expression
  * reads both arrays once with a tight double loop and stays inside whole-stage codegen
  * — the difference is ~25× on a 2M-pair × 64-dim scan.
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.expressions.ArrayDot.dot($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** All sign-random-projection LSH signatures of an `array<double>` vector in one pass.
  *
  * `planes` is the `(nSigs · bitsPerSig) × dim` plane matrix (driver-side constants,
  * serialized with the plan); the result is `array<int>` of length `nSigs`, where
  * signature `s` packs bit `i` = (vec · planes(s·bitsPerSig + i)) > 0 at position `i`.
  *
  * The higher-order-function form (`aggregate(zip_with(vec, plane, …))` per plane)
  * allocates a zipped struct array per element per plane — on a corpus-wide signature
  * scan with 80 planes that allocation dominates (same pathology [[ArrayDot]] fixes,
  * ~25× measured). This expression reads the vector once per plane with a tight
  * primitive loop over a flattened plane matrix and stays inside whole-stage codegen.
  */
case class HyperplaneSignatures(
    child: Expression,
    planes: Array[Array[Double]],
    bitsPerSig: Int)
  extends UnaryExpression {
  require(planes.nonEmpty && planes.length % bitsPerSig == 0,
    "planes must be a non-empty multiple of bitsPerSig")
  require(bitsPerSig >= 1 && bitsPerSig <= 31, "bitsPerSig must be in [1, 31]")
  require(planes.forall(_.length == planes(0).length),
    "all plane rows must have the same dimension")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val dim = planes(0).length

  // flattened row-major so the inner loop is a stride-1 scan of one primitive array
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](planes.length * dim)
    var p = 0
    while (p < planes.length) {
      System.arraycopy(planes(p), 0, out, p * dim, dim)
      p += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    HyperplaneSignatures.compute(
      v.asInstanceOf[ArrayData], flat, dim, planes.length, bitsPerSig)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.HyperplaneSignatures.compute(
         |  $c, $flatRef, $dim, ${planes.length}, $bitsPerSig);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignatures =
    copy(child = newChild)
}

/** Unit-normalized copy of an `array<double>` vector in one pass (zero vectors pass
  * through unchanged). The `transform(x, v => v / sqrt(dot(x,x)))` HOF form
  * re-evaluates the norm per ELEMENT — no common-subexpression elimination crosses a
  * lambda boundary — making normalization O(d²) per row.
  */
case class ArrayNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayNormalize.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ArrayNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ArrayNormalize =
    copy(child = newChild)
}

object ArrayNormalize {
  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      out(i) = x
      acc += x * x
      i += 1
    }
    if (acc > 0) {
      // divide (not multiply-by-reciprocal): bit-identical to the x/norm the HOF
      // form produced, so existing round-6 oracle comparisons are unaffected
      val nrm = math.sqrt(acc)
      i = 0
      while (i < n) { out(i) /= nrm; i += 1 }
    }
    new GenericArrayData(out)
  }
}

/** Index of the centroid with the largest dot product against the vector (ties → the
  * lowest index). Centroids are driver-side constants serialized with the plan, so
  * IVF cell assignment is ONE codegen'd projection — no centroid join, no k×N shuffle
  * through a window.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
  extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(centroids.forall(_.length == centroids(0).length),
    "all centroids must have the same dimension")

  override def dataType: DataType = IntegerType

  private val dim = centroids(0).length

  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      System.arraycopy(centroids(c), 0, out, c * dim, dim)
      c += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData], flat, dim, centroids.length)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.NearestCentroid.compute(
         |  $c, $flatRef, $dim, ${centroids.length});""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def compute(v: ArrayData, flat: Array[Double], dim: Int, k: Int): Int = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_centroid: vector has ${v.numElements()} elements, centroids have dim $dim")
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        acc += v.getDouble(i) * flat(off + i)
        i += 1
      }
      if (acc > bestDot) { bestDot = acc; best = c }
      c += 1
    }
    best
  }
}

/** Indices of the `nprobe` max-dot-product centroids, best first (ties → lowest
  * index) — the IVF probe-cell assignment as ONE codegen'd projection per query:
  * no centroid cross-join, no per-query ranking window.
  */
case class TopCentroids(child: Expression, centroids: Array[Array[Double]], nprobe: Int)
  extends UnaryExpression {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(centroids.forall(_.length == centroids(0).length),
    "all centroids must have the same dimension")
  require(nprobe > 0, s"nprobe must be positive, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private val dim = centroids(0).length

  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](centroids.length * dim)
    var c = 0
    while (c < centroids.length) {
      System.arraycopy(centroids(c), 0, out, c * dim, dim)
      c += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    TopCentroids.compute(v.asInstanceOf[ArrayData], flat, dim, centroids.length, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.TopCentroids.compute(
         |  $c, $flatRef, $dim, ${centroids.length}, $nprobe);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
}

object TopCentroids {
  def compute(v: ArrayData, flat: Array[Double], dim: Int, k: Int, nprobe: Int): ArrayData = {
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"top_centroids: vector has ${v.numElements()} elements, centroids have dim $dim")
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      var i = 0
      val off = c * dim
      while (i < dim) {
        acc += v.getDouble(i) * flat(off + i)
        i += 1
      }
      dots(c) = acc
      c += 1
    }
    // partial selection, best first; strict > keeps the lowest index on ties —
    // identical order to (dot DESC, cell ASC)
    val n = math.min(nprobe, k)
    val chosen = new Array[Int](n)
    val used = new Array[Boolean](k)
    var s = 0
    while (s < n) {
      var best = -1
      c = 0
      while (c < k) {
        if (!used(c) && (best < 0 || dots(c) > dots(best))) best = c
        c += 1
      }
      used(best) = true
      chosen(s) = best
      s += 1
    }
    new GenericArrayData(chosen)
  }
}

object HyperplaneSignatures {
  def compute(
      v: ArrayData,
      flat: Array[Double],
      dim: Int,
      nPlanes: Int,
      bitsPerSig: Int): ArrayData = {
    // a silently zero-padded / truncated vector would yield a plausible-but-wrong
    // signature; malformed input must fail loudly
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"hyperplane_signatures: vector has ${v.numElements()} elements, planes have dim $dim")
    var j = 0
    while (j < dim) {
      if (v.isNullAt(j))
        throw new IllegalArgumentException(
          s"hyperplane_signatures: null element at position $j (vector elements must be non-null)")
      j += 1
    }
    val n = dim
    val sigs = new Array[Int](nPlanes / bitsPerSig)
    var p = 0
    while (p < nPlanes) {
      var acc = 0.0
      var i = 0
      val off = p * dim
      while (i < n) {
        acc += v.getDouble(i) * flat(off + i)
        i += 1
      }
      if (acc > 0) sigs(p / bitsPerSig) |= 1 << (p % bitsPerSig)
      p += 1
    }
    new GenericArrayData(sigs)
  }
}
