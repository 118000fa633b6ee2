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

/** Product-quantization codes of an `array<double>` vector: the vector is split into
  * `m` contiguous subvectors (dim must be divisible by `m`) and each is assigned the
  * index of the nearest (squared-L2) centroid in its OWN subspace codebook — one
  * codegen'd projection per row, `array<int>` of length `m`. PQ quantizes residual
  * geometry, so the metric is L2 (argmax-dot is only equivalent for unit-norm FULL
  * vectors, which subvectors are not); argmin ||x−c||² is computed as
  * argmax (x·c − ||c||²/2) with the centroid half-norms precomputed driver-side.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {
  require(codebooks.nonEmpty, "codebooks must be non-empty")
  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == ksub && cb.forall(_.length == subDim)),
    "all subspace codebooks must have the same shape")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // [sub][code][i] flattened row-major; half-norms alongside so the inner loop is
  // one fused multiply-accumulate pass per centroid
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * ksub * subDim)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(s)(c), 0, out, (s * ksub + c) * subDim, subDim)
        c += 1
      }
      s += 1
    }
    out
  }
  @transient private lazy val halfNorms: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        out(s * ksub + c) = 0.5 * codebooks(s)(c).map(x => x * x).sum
        c += 1
      }
      s += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], flat, halfNorms, m, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("pqHalfNorms", halfNorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.PqEncode.compute(
         |  $c, $flatRef, $normRef, $m, $ksub, $subDim);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  def compute(
      v: ArrayData,
      flat: Array[Double],
      halfNorms: Array[Double],
      m: Int,
      ksub: Int,
      subDim: Int): ArrayData = {
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} elements, codebooks expect ${m * subDim}")
    var j = 0
    while (j < m * subDim) {
      if (v.isNullAt(j))
        throw new IllegalArgumentException(
          s"pq_encode: null element at position $j (vector elements must be non-null)")
      j += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val vOff = s * subDim
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < ksub) {
        val cOff = (s * ksub + c) * subDim
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          acc += v.getDouble(vOff + i) * flat(cOff + i)
          i += 1
        }
        // argmin L2 == argmax (dot − halfNorm); strict > keeps the lowest code on ties
        val score = acc - halfNorms(s * ksub + c)
        if (score > bestScore) { bestScore = score; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** Asymmetric-distance (ADC) dot-product estimate between a PQ `codes` row
  * (`array<int>`, left) and a full query vector (`array<double>`, right):
  * Σ_sub q_sub · codebook[sub][codes[sub]]. The original corpus vector is never
  * read — candidates are scored from their `m`-int codes alone, which is the whole
  * point of PQ at scale: the scored set rides a column ~dim/m times smaller than the
  * raw embeddings.
  */
case class PqAdcScore(
    left: Expression,
    right: Expression,
    codebooks: Array[Array[Array[Double]]])
  extends BinaryExpression {
  require(codebooks.nonEmpty, "codebooks must be non-empty")
  private val m = codebooks.length
  private val ksub = codebooks(0).length
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == ksub && cb.forall(_.length == subDim)),
    "all subspace codebooks must have the same shape")

  override def dataType: DataType = DoubleType

  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * ksub * subDim)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        System.arraycopy(codebooks(s)(c), 0, out, (s * ksub + c) * subDim, subDim)
        c += 1
      }
      s += 1
    }
    out
  }

  override def nullSafeEval(codes: Any, q: Any): Any =
    PqAdcScore.compute(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      flat, m, ksub, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"""${ev.value} = graft.expressions.PqAdcScore.compute(
         |  $c, $q, $flatRef, $m, $ksub, $subDim);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def compute(
      codes: ArrayData,
      q: ArrayData,
      flat: Array[Double],
      m: Int,
      ksub: Int,
      subDim: Int): Double = {
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq_adc_score: codes row has ${codes.numElements()} entries, codebooks have $m subspaces")
    if (q.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_adc_score: query has ${q.numElements()} elements, codebooks expect ${m * subDim}")
    var j = 0
    while (j < m * subDim) {
      if (q.isNullAt(j))
        throw new IllegalArgumentException(
          s"pq_adc_score: null element at position $j (query elements must be non-null)")
      j += 1
    }
    var acc = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getInt(s)
      if (code < 0 || code >= ksub)
        throw new IllegalArgumentException(
          s"pq_adc_score: code $code out of range [0, $ksub) in subspace $s")
      val cOff = (s * ksub + code) * subDim
      val qOff = s * subDim
      var i = 0
      while (i < subDim) {
        acc += q.getDouble(qOff + i) * flat(cOff + i)
        i += 1
      }
      s += 1
    }
    acc
  }
}

/** Flattened outer product `v ⊗ v` of an `array<double>` vector (row-major, d²
  * doubles) — the per-row second-moment contribution of a streaming covariance
  * build. One tight primitive loop in whole-stage codegen; the `transform(transform)`
  * HOF form allocates a nested struct array per element (the [[ArrayDot]] pathology,
  * squared). Emits only the upper triangle mirrored, i.e. the full symmetric matrix,
  * so downstream averaging needs no index bookkeeping.
  */
case class ArrayOuterFlat(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ArrayOuterFlat.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ArrayOuterFlat.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): ArrayOuterFlat =
    copy(child = newChild)
}

object ArrayOuterFlat {
  def compute(v: ArrayData): ArrayData = {
    val d = v.numElements()
    // fabricated zeros would silently skew the second moment (the ArrayAvgAgg /
    // HyperplaneSignatures convention: never read a null slot as 0.0)
    var j = 0
    while (j < d) {
      if (v.isNullAt(j))
        throw new IllegalArgumentException(
          s"array_outer_flat: null element at position $j (vector elements must be non-null)")
      j += 1
    }
    val out = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      val xi = v.getDouble(i)
      var j = i
      while (j < d) {
        val p = xi * v.getDouble(j)
        out(i * d + j) = p
        out(j * d + i) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
