package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA for embedding columns — the whitening / dimension-reduction step
  * of an embedding pipeline (pre-ANN compression, SemDeDup-style normalization,
  * 2-D corpus maps).
  *
  * Scale design: the ONLY distributed work is one aggregation computing the mean
  * vector and mean flattened outer product ([[graft.expressions.ArrayOuterFlat]],
  * codegen'd) over a bounded seeded sample — the covariance and its eigensystem are
  * `dim × dim` driver objects by construction (the same bounded-collect convention as
  * IVF/PQ training; practical for the expression form up to a few hundred dims —
  * past that, d² per-row state wants a block-matrix build instead, noted in
  * SCALING.md). Projection is `r` codegen'd dot products per row against literal
  * component vectors: `proj_i = v·c_i − μ·c_i`, the mean term folded into a
  * constant, so the corpus pass never materializes centered vectors.
  */
object Pca {

  /** `components(i)` = i-th principal axis (unit norm, sign-fixed); `variance(i)` =
    * its eigenvalue (descending).
    */
  case class Model(mean: Array[Double], components: Array[Array[Double]], variance: Array[Double])

  /** Fit the top-`r` principal components from ONE aggregation pass (mean and second
    * moment together) over a bounded seeded sample; eigensystem via cyclic Jacobi on
    * the driver (deterministic: fixed sweep order, eigenvalue-descending /
    * index-ascending tie-break, first-nonzero-positive sign convention).
    */
  def fit(
      corpus: DataFrame,
      vecCol: String,
      r: Int,
      seed: Long = 42L,
      trainSampleRows: Long = 100000L): Model = {
    require(r > 0, s"r must be positive, got $r")
    require(trainSampleRows > 0, s"trainSampleRows must be positive, got $trainSampleRows")
    val full = cleanVectors(corpus, vecCol)
    val n = full.count()
    require(n > 1, s"pca fit needs at least 2 rows, got $n")
    val v =
      if (n > 2 * trainSampleRows)
        full.sample(withReplacement = false,
          math.min(1.0, 1.2 * trainSampleRows / n), seed)
      else full
    val agg = momentsPlan(v).collect()(0)
    val mean = agg.getSeq[Double](0).toArray
    val m2 = agg.getSeq[Double](1).toArray
    val d = mean.length
    require(r <= d, s"r=$r exceeds vector dimension $d")
    // covariance = E[xxᵀ] − μμᵀ
    val cov = Array.tabulate(d, d)((i, j) => m2(i * d + j) - mean(i) * mean(j))
    val (values, vectors) = jacobiEigen(cov)
    val order = values.indices.sortBy(i => (-values(i), i)).take(r)
    val comps = order.map { i =>
      val c = vectors.map(_(i))
      // deterministic sign: first component of non-trivial magnitude positive
      val lead = c.find(x => math.abs(x) > 1e-12).getOrElse(0.0)
      if (lead < 0) c.map(-_) else c
    }.toArray
    Model(mean, comps, order.map(values).toArray)
  }

  /** One row population for BOTH aggregates: array_avg_agg drops null-element rows
    * and array_outer_flat raises on them, so mean and second moment would otherwise
    * disagree on which rows they saw — filter the malformed rows once, up front
    * (same drop-null-vectors convention as ArrayAvgAgg).
    */
  private def cleanVectors(corpus: DataFrame, vecCol: String): DataFrame =
    corpus.select(col(vecCol).cast("array<double>").as("v"))
      .filter(col("v").isNotNull && !exists(col("v"), _.isNull))

  /** The ONE distributed pass behind [[fit]] and [[covariance]]: mean vector and
    * mean flattened outer product E[xxᵀ] in a single aggregation.
    */
  private def momentsPlan(rows: DataFrame): DataFrame =
    rows.agg(
      graft.functions.array_avg_agg(col("v")).as("mean"),
      graft.functions.array_avg_agg(graft.functions.array_outer_flat(col("v"))).as("m2"))

  /** Population covariance matrix of a vector column as a DataFrame — the distributed
    * core of [[fit]] (identical single mean+outer-product aggregation, no sampling)
    * exposed as a relational result: one row per upper-triangle entry `(i, j, cov)`
    * with `cov = E[x_i·x_j] − μ_i·μ_j`. Everything after the aggregate explodes ONE
    * d²-element row, so the post-aggregation cost is dim-bounded, not corpus-bounded.
    */
  def covariance(corpus: DataFrame, vecCol: String): DataFrame =
    momentsPlan(cleanVectors(corpus, vecCol))
      .select(col("mean"), size(col("mean")).as("dim"),
        posexplode(col("m2")).as(Seq("idx", "m2v")))
      .select(expr("idx div dim").cast("int").as("i"),
        (col("idx") % col("dim")).cast("int").as("j"),
        col("mean"), col("m2v"))
      .filter(col("i") <= col("j"))
      .select(col("i"), col("j"),
        (col("m2v") -
          element_at(col("mean"), col("i") + 1) *
          element_at(col("mean"), col("j") + 1)).as("cov"))

  /** `iters` power-iteration steps toward the dominant eigenvector of the
    * population covariance, from the deterministic all-ones start vector, each
    * step unit-normalized: vₜ = C·vₜ₋₁ / ‖C·vₜ₋₁‖. This is the closed-form slice
    * of [[fit]]'s eigensolve a SQL oracle can replay (the Jacobi fixpoint itself
    * is iterative/rows-only) — the same chained-oracle pattern as the graph
    * `*_two_iter` queries.
    *
    * Relational by construction: the covariance is the [[covariance]] DataFrame
    * (d²-row, dim-bounded) symmetrized once; each step is one equi-join + one
    * hash aggregate on d²/d rows plus a 1-row broadcast for the norm — no driver
    * eigensolve, no corpus re-scan after the single moments pass.
    *
    * @return (i, v) — the component index and the iterated unit vector entry
    */
  def powerIteration(corpus: DataFrame, vecCol: String, iters: Int = 1): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    import graft.util.Caching.CacheSyntax
    val cov = covariance(corpus, vecCol)
    val full = cov.unionByName(cov.filter(col("i") < col("j"))
        .select(col("j").as("i"), col("i").as("j"), col("cov")))
      .scopedPersist()
    var v: DataFrame = full.select(col("i").as("j")).distinct()
      .withColumn("vj", lit(1.0))
    (1 to iters).foreach { _ =>
      val w = full.join(v, "j")
        .groupBy("i").agg(sum(col("cov") * col("vj")).as("w"))
      val nrm = w.agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i").as("j"), (col("w") / col("nrm")).as("vj"))
    }
    v.select(col("j").as("i"), col("vj").as("v"))
  }

  /** `iters` SUBSPACE iterations toward the top-`r` eigenbasis of the population
    * covariance: V_{t+1} = orthonormalize(C·V_t) with classical Gram-Schmidt over
    * the r columns (ascending — column k deflates against the already-orthonormalized
    * 0..k−1), from the deterministic indicator start V_0 = [e_0 … e_{r−1}]. The
    * r-column generalization of [[powerIteration]], and the closed-form,
    * oracle-checkable sibling of [[fit]]'s rows-only Jacobi fixpoint.
    *
    * Scale split: the corpus-sized work is the ONE distributed moments pass behind
    * [[covariance]]; the d²-entry covariance is then collected ONCE and the whole
    * iteration — C·V_t, Gram-Schmidt, the delta check — runs on the driver in fixed
    * element order. d² doubles is the SAME driver boundary [[fit]]'s Jacobi already
    * crosses for its moments, so this adds no new scale limit, and it removes every
    * per-round Spark job (the earlier per-round broadcast-join form spent its time
    * in job-scheduling overhead on a 4096-row table: ~40 rounds ≈ 3 s of pure
    * overhead at sf0.1, d=64; the all-relational form before it measured 182 s).
    *
    * @return (i, k, v) — dimension index, component index 0..r−1, entry
    */
  def subspaceIteration(
      corpus: DataFrame,
      vecCol: String,
      r: Int,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = corpus.sparkSession
    import spark.implicits._
    val (v, _) = subspaceLoop(corpus, vecCol, r, maxIter = iters, tol = 0.0)
    val d = v(0).length
    (for (k <- 0 until r; i <- 0 until d) yield (i, k, v(k)(i)))
      .toDF("i", "k", "v")
  }

  /** The shared subspace-iteration driver loop: V_{t+1} = GS(C·V_t) from the
    * indicator start, stopping when max |ΔV| ≤ `tol` or at `maxIter` (tol = 0
    * disables the early stop → exactly `maxIter` steps). Returns (V, iterations
    * run). The freeze-on-convergence stop is what makes the CONVERGED eigensolve
    * SQL-replayable: the oracle unrolls `maxIter` rounds with a done flag that
    * passes the basis through once the step delta falls under tol (the
    * `j5_em_train` chain pattern).
    */
  private def subspaceLoop(
      corpus: DataFrame,
      vecCol: String,
      r: Int,
      maxIter: Int,
      tol: Double): (Array[Array[Double]], Int) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // ONE distributed pass + ONE d²-bounded collect (upper triangle, mirrored here)
    val upper = covariance(corpus, vecCol).as[(Int, Int, Double)].collect()
    val d = upper.iterator.map(_._2).max + 1
    val covMat = Array.ofDim[Double](d, d)
    upper.foreach { case (i, j, c) => covMat(i)(j) = c; covMat(j)(i) = c }
    subspaceLoopLocal(covMat, r, maxIter, tol)
  }

  /** Driver-local subspace iteration on an already-collected covariance matrix.
    * Fixed ascending-j summation order; the 6-dp rounding every caller applies
    * dwarfs the ≤1e-13 order-vs-order drift against the SQL replay's own sums.
    */
  private[textops] def subspaceLoopLocal(
      covMat: Array[Array[Double]],
      r: Int,
      maxIter: Int,
      tol: Double): (Array[Array[Double]], Int) = {
    require(r >= 1, s"r must be >= 1, got $r")
    val d = covMat.length
    require(r <= d, s"r=$r exceeds vector dimension $d")
    // V: r columns × d entries — the bounded driver iterate
    var v = Array.tabulate(r, d)((k, j) => if (j == k) 1.0 else 0.0)
    var iter = 0
    var delta = Double.MaxValue
    while (delta > tol && iter < maxIter) {
      // w = C·V, ascending-j per entry
      val w = Array.ofDim[Double](r, d)
      var k = 0
      while (k < r) {
        var i = 0
        while (i < d) {
          var acc = 0.0
          var j = 0
          while (j < d) { acc += covMat(i)(j) * v(k)(j); j += 1 }
          w(k)(i) = acc
          i += 1
        }
        k += 1
      }
      // classical Gram-Schmidt, ascending, against this round's normalized columns
      val next = Array.ofDim[Double](r, d)
      (0 until r).foreach { k =>
        val u = w(k).clone()
        (0 until k).foreach { kp =>
          var dot = 0.0
          var j = 0
          while (j < d) { dot += next(kp)(j) * w(k)(j); j += 1 }
          j = 0
          while (j < d) { u(j) -= dot * next(kp)(j); j += 1 }
        }
        val nrm = math.sqrt(u.map(x => x * x).sum)
        next(k) = u.map(_ / nrm)
      }
      delta = (0 until r).map(k =>
        (0 until d).map(j => math.abs(next(k)(j) - v(k)(j))).max).max
      v = next
      iter += 1
    }
    (v, iter)
  }

  /** PCA fit via CONVERGED subspace iteration — the oracle-checkable sibling of
    * [[fit]]'s driver Jacobi: the moments stay the one distributed aggregation,
    * the eigenbasis comes from [[subspaceLoopLocal]] with a tol-based freeze, and the
    * eigenvalues are the Rayleigh quotients v_kᵀ·C·v_k. Components keep the raw
    * converged orientation (deterministic from the indicator start) — no sign
    * normalization, so the SQL chain replays them verbatim.
    */
  def fitSubspace(
      corpus: DataFrame,
      vecCol: String,
      r: Int,
      tol: Double = 1e-7,
      maxIter: Int = 40): Model = {
    val full = cleanVectors(corpus, vecCol)
    val agg = momentsPlan(full).collect()(0)
    val mean = agg.getSeq[Double](0).toArray
    val m2 = agg.getSeq[Double](1).toArray
    val d = mean.length
    val cov = Array.tabulate(d, d)((i, j) => m2(i * d + j) - mean(i) * mean(j))
    // reuse the moments already collected — no second corpus scan
    val (v, _) = subspaceLoopLocal(cov, r, maxIter, tol)
    val values = v.map { c =>
      var acc = 0.0
      var i = 0
      while (i < d) {
        var j = 0
        var row = 0.0
        while (j < d) { row += cov(i)(j) * c(j); j += 1 }
        acc += c(i) * row
        i += 1
      }
      acc
    }
    Model(mean, v, values)
  }

  /** Project onto the fitted components: adds `pc_0..pc_{r-1}` columns, each one
    * codegen'd dot product minus a precomputed constant — no per-row centering.
    */
  def project(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    model.components.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val meanDot = c.zip(model.mean).map { case (a, b) => a * b }.sum
      acc.withColumn(s"pc_$i",
        graft.functions.array_dot(v, typedLit(c.toSeq)) - lit(meanDot))
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns (eigenvalues,
    * eigenvector matrix with vectors in COLUMNS). Deterministic sweep order;
    * converges quadratically — 20 sweeps is far past double precision for the
    * dashboard-sized matrices this sees.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone)
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(a)
    while (sweep < 20 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // numerically stable tan of the annihilating rotation; θ=0 → 45°
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { acc += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(acc)
  }
}
