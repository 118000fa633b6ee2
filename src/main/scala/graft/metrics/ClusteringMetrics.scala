package graft.metrics

import org.apache.commons.math3.special.Gamma.logGamma
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Y18 — clustering quality vs a ground-truth label, computed from the
  * `groupBy(true_label, cluster_id).count()` contingency table — no pandas/sklearn
  * boundary (reference: autolinker.py:1234-1257 collects to pandas and calls sklearn;
  * every score below is the closed form over the same contingency, so results match).
  *
  * Reference-faithful singleton masking first: true labels occurring once → "-1",
  * clusters of size one → "-1" (two window-count passes).
  *
  * Scale design: the only shuffles are the window counts and the contingency groupBy;
  * the contingency (≤ #labels × #clusters non-empty cells) is collected ONCE and every
  * score — including AMI's hypergeometric expected-MI sum, which has no distributed
  * formulation — is computed driver-side from it, exactly as the reference does via
  * pandas. One Spark job instead of seven sequential scalar aggregates.
  */
object ClusteringMetrics {

  def metrics(clusters: DataFrame, trueLabel: String): DataFrame = {
    val spark = clusters.sparkSession
    import spark.implicits._

    val wT = Window.partitionBy(trueLabel)
    val wC = Window.partitionBy("cluster_id")
    val cont = clusters
      .withColumn("cnt_t", count(lit(1)).over(wT))
      .withColumn("t", when(col("cnt_t") === 1, lit("-1"))
        .otherwise(col(trueLabel).cast("string")))
      .withColumn("cnt_c", count(lit(1)).over(wC))
      .withColumn("c", when(col("cnt_c") === 1, lit("-1"))
        .otherwise(col("cluster_id").cast("string")))
      .groupBy("t", "c").agg(count(lit(1)).cast("double").as("nij"))
      .as[(String, String, Double)]
    // fail loudly (not with a driver OOM) if the contingency is not evaluation-sized:
    // non-empty cells ≤ min(#rows, #labels × #clusters); the cap is far above any
    // real ground-truth panel but far below an accidental per-row-unique join
    // one upstream execution: persist the contingency so the cap-guard count and
    // the collect don't each re-run the join+aggregate; unpersist in finally so
    // the fail-loudly path doesn't leak the cached blocks
    cont.persist()
    val contArr =
      try {
        val cellCap = 4L << 20
        val cells = cont.count()
        require(cells <= cellCap,
          s"contingency has $cells non-empty cells (> $cellCap): the true-label/cluster " +
            "pair cardinality is not evaluation-sized; AMI/ARI need the full table on " +
            "the driver — aggregate or sample labels first")
        cont.collect()
      } finally cont.unpersist()

    val n = contArr.map(_._3).sum
    val rowSums = contArr.groupBy(_._1).map { case (t, cs) => t -> cs.map(_._3).sum }
    val colSums = contArr.groupBy(_._2).map { case (c, cs) => c -> cs.map(_._3).sum }
    def choose2(x: Double) = x * (x - 1.0) / 2.0

    val s = contArr.map(r => choose2(r._3)).sum
    val sa = rowSums.values.map(choose2).sum
    val sb = colSums.values.map(choose2).sum
    val nPairs = n * (n - 1) / 2.0

    // MI and marginal entropies (natural log, like sklearn)
    val mi = contArr.map { case (t, c, nij) =>
      (nij / n) * math.log((nij * n) / (rowSums(t) * colSums(c)))
    }.sum
    val hT = -rowSums.values.map(ai => (ai / n) * math.log(ai / n)).sum
    val hC = -colSums.values.map(bj => (bj / n) * math.log(bj / n)).sum

    val expected = sa * sb / nPairs
    val ari =
      if ((sa + sb) / 2.0 - expected == 0.0) 1.0
      else (s - expected) / ((sa + sb) / 2.0 - expected)
    val rand = if (nPairs == 0) 1.0 else (nPairs + 2 * s - sa - sb) / nPairs
    val fm = if (sa * sb > 0) s / math.sqrt(sa * sb) else 0.0
    val homogeneity = if (hT == 0.0) 1.0 else mi / hT
    val completeness = if (hC == 0.0) 1.0 else mi / hC
    val v =
      if (homogeneity + completeness == 0.0) 0.0
      else 2 * homogeneity * completeness / (homogeneity + completeness)
    val nmi = {
      val mean = (hT + hC) / 2.0
      if (mean == 0.0) 1.0 else mi / mean
    }
    val ami = adjustedMutualInfo(rowSums.values.toArray, colSums.values.toArray,
      n, mi, hT, hC)

    Seq((mi, nmi, ami, ari, rand, fm, homogeneity, completeness, v))
      .toDF("mutual_info", "normalized_mutual_info", "adjusted_mutual_info",
        "adjusted_rand", "rand", "fowlkes_mallows", "homogeneity", "completeness",
        "v_measure")
  }

  /** B-cubed precision/recall/F1 (Bagga & Baldwin 1998; Amigó et al. 2009) — the
    * entity-resolution audit score that, unlike pair-counting Rand/F, weights every
    * RECORD equally, so one giant wrong merge can't hide behind many small correct
    * clusters. Per record i: precision_i = |cluster_i ∩ truth_i| / |cluster_i|,
    * recall_i = |cluster_i ∩ truth_i| / |truth_i|; scores are record averages and F1
    * is the harmonic mean of the two averages.
    *
    * Summing per-record terms cell-wise over the contingency table turns the whole
    * computation into ONE groupBy(truth, cluster) plus two window sums over the
    * (≤ #labels × #clusters) cell table — every record with the same (t, c) pair
    * contributes the identical nij/|c| and nij/|t|, so avg precision =
    * Σ nij²/|c| / n and avg recall = Σ nij²/|t| / n. No driver collect: unlike
    * [[metrics]]' AMI (whose expected-MI sum has no distributed form), B-cubed stays
    * a pure aggregation, so it scales to contingencies that would not fit a driver.
    */
  def bcubed(clusters: DataFrame, trueLabel: String): DataFrame = {
    val cells = clusters
      .groupBy(col(trueLabel).cast("string").as("t"),
        col("cluster_id").cast("string").as("c"))
      .agg(count(lit(1)).cast("double").as("nij"))
    val sized = cells
      .withColumn("size_c", sum("nij").over(Window.partitionBy("c")))
      .withColumn("size_t", sum("nij").over(Window.partitionBy("t")))
    sized
      .agg(
        (sum(col("nij") * col("nij") / col("size_c")) / sum("nij")).as("p"),
        (sum(col("nij") * col("nij") / col("size_t")) / sum("nij")).as("r"))
      .select(col("p").as("bcubed_precision"), col("r").as("bcubed_recall"),
        (lit(2.0) * col("p") * col("r") / (col("p") + col("r"))).as("bcubed_f1"))
  }

  /** AMI with the arithmetic normalizer (sklearn's default):
    * `(MI − E[MI]) / (mean(H_T, H_C) − E[MI])`, where E[MI] is the exact expectation
    * of MI under the hypergeometric model of random labelings with these marginals
    * (Vinh, Epps & Bailey 2010, JMLR 11 — the formula sklearn implements). The triple
    * sum runs over contingency marginals on the driver; log-factorials via lgamma.
    */
  private[metrics] def adjustedMutualInfo(
      a: Array[Double],
      b: Array[Double],
      n: Double,
      mi: Double,
      hT: Double,
      hC: Double): Double = {
    if (a.length == 1 && b.length == 1) return 1.0 // single cluster both sides
    def lf(x: Double) = logGamma(x + 1.0) // log(x!)
    val logN = lf(n)
    var emi = 0.0
    var i = 0
    while (i < a.length) {
      val ai = a(i)
      var j = 0
      while (j < b.length) {
        val bj = b(j)
        val lo = math.max(1.0, ai + bj - n)
        val hi = math.min(ai, bj)
        var nij = lo
        while (nij <= hi) {
          val logTerm = lf(ai) + lf(bj) + lf(n - ai) + lf(n - bj) -
            (logN + lf(nij) + lf(ai - nij) + lf(bj - nij) + lf(n - ai - bj + nij))
          emi += (nij / n) * math.log((n * nij) / (ai * bj)) * math.exp(logTerm)
          nij += 1.0
        }
        j += 1
      }
      i += 1
    }
    val mean = (hT + hC) / 2.0
    val denom0 = mean - emi
    // sklearn's guard: keep the denominator away from 0 preserving its sign,
    // using machine epsilon (np.finfo("float64").eps) exactly as sklearn does
    val eps = 2.220446049250313e-16
    val denom = if (denom0 < 0) math.min(denom0, -eps) else math.max(denom0, eps)
    (mi - emi) / denom
  }
}
