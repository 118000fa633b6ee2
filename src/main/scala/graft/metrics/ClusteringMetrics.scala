package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Y18 — clustering quality vs a ground-truth label, computed natively from the
  * `groupBy(true_label, cluster_id).count()` contingency table — no pandas/sklearn
  * boundary (reference: autolinker.py:1234-1257 collects to pandas and calls sklearn;
  * every score below is the closed form over the same contingency, so results match).
  *
  * Reference-faithful singleton masking first: true labels occurring once → "-1",
  * clusters of size one → "-1" (two window-count passes).
  *
  * Scale design: the only shuffles are the window counts and the contingency groupBys;
  * all combinatorial sums are distributed aggregates — the driver sees scalars.
  * (AMI needs the expected-MI hypergeometric sum over the collected contingency; it is
  * intentionally omitted — NMI/v-measure cover normalized agreement.)
  */
object ClusteringMetrics {

  def metrics(clusters: DataFrame, trueLabel: String): DataFrame = {
    val spark = clusters.sparkSession
    import spark.implicits._

    val wT = Window.partitionBy(trueLabel)
    val wC = Window.partitionBy("cluster_id")
    val masked = clusters
      .withColumn("cnt_t", count(lit(1)).over(wT))
      .withColumn("t", when(col("cnt_t") === 1, lit("-1"))
        .otherwise(col(trueLabel).cast("string")))
      .withColumn("cnt_c", count(lit(1)).over(wC))
      .withColumn("c", when(col("cnt_c") === 1, lit("-1"))
        .otherwise(col("cluster_id").cast("string")))
      .select("t", "c")
      .cache()

    try {
      val n = masked.count().toDouble
      def choose2(c: org.apache.spark.sql.Column) = c * (c - lit(1.0)) / lit(2.0)

      val cont = masked.groupBy("t", "c").agg(count(lit(1)).cast("double").as("nij"))
        .cache()
      val rowSums = cont.groupBy("t").agg(sum("nij").as("ai"))
      val colSums = cont.groupBy("c").agg(sum("nij").as("bj"))

      val s = cont.agg(sum(choose2(col("nij")))).collect()(0).getDouble(0)
      val sa = rowSums.agg(sum(choose2(col("ai")))).collect()(0).getDouble(0)
      val sb = colSums.agg(sum(choose2(col("bj")))).collect()(0).getDouble(0)
      val nPairs = n * (n - 1) / 2.0

      // MI and marginal entropies (natural log, like sklearn)
      val mi = cont.join(rowSums, "t").join(colSums, "c")
        .agg(sum((col("nij") / n) * log((col("nij") * n) / (col("ai") * col("bj")))))
        .collect()(0).getDouble(0)
      val hT = -rowSums.agg(sum((col("ai") / n) * log(col("ai") / n)))
        .collect()(0).getDouble(0)
      val hC = -colSums.agg(sum((col("bj") / n) * log(col("bj") / n)))
        .collect()(0).getDouble(0)

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

      cont.unpersist()
      Seq((mi, nmi, ari, rand, fm, homogeneity, completeness, v))
        .toDF("mutual_info", "normalized_mutual_info", "adjusted_rand", "rand",
          "fowlkes_mallows", "homogeneity", "completeness", "v_measure")
    } finally {
      masked.unpersist()
    }
  }
}
