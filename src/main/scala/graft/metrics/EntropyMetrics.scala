package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.clean.Cleaning
import graft.functions.entropy_agg

/** Y7/Y8/Y9 — the unsupervised clustering quality metric
  * (reference: autolinker.py:114-223; math documented in its README.md:46-76).
  */
object EntropyMetrics {

  /** Y7 — average entropy of each attribute column; `byCluster` averages the
    * per-cluster entropies instead (one distributed aggregation either way).
    */
  def datasetEntropy(
      df: DataFrame,
      attributes: Seq[String],
      byCluster: Boolean = false,
      base: Int = 0): Map[String, Double] = {
    val grouped = Cleaning.nullSentinel(
        df.select((attributes.map(c => col(c).cast("string").as(c)) ++
          (if (byCluster) Seq(col("cluster_id")) else Nil)): _*),
        attributes)
      .groupBy(if (byCluster) col("cluster_id") else lit(1).as("g"))
      .agg(entropy_agg(base, attributes.map(c => c -> col(c)): _*).as("ent_map"))
    val row = grouped
      .select(attributes.map(c => mean(col("ent_map").getItem(c)).as(c)): _*)
      .collect()(0)
    attributes.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(i)) 0.0 else row.getDouble(i))
    }.toMap
  }

  /** Y9 — adjusted entropy base: max #distinct values in any attribute column, in one
    * aggregation pass (the reference runs one groupBy-count job per column,
    * autolinker.py:597-602 — same number, fewer jobs).
    */
  def maxDistinct(df: DataFrame, attributes: Seq[String]): Long = {
    val row = df.agg(
      greatest(attributes.map(c => countDistinct(col(c)).cast("long")): _*).as("u"))
      .collect()(0)
    row.getLong(0)
  }

  /** All four (grouping × base) entropy vectors in ONE aggregation job: the whole-
    * dataset and per-cluster groupings ride a single GROUPING SETS pass with two
    * `entropy_agg` buffers each, and the per-cluster means + whole-row picks
    * collapse in one follow-up aggregate — one job and one scan where the
    * round-10 shape ran two jobs (each already two-buffer; the original 4-job
    * form paid the scan four times). Empty input yields the same zeros as the
    * two-job form: the global grouping-set row carries no attribute keys (every
    * `getItem` is null → 0.0) and the per-cluster mean averages zero rows
    * (null → 0.0) — the pow(0, 0) = 1.0 all-singleton contract is untouched.
    *
    * Returns ((wholeS, wholeA), (byClusterS, byClusterA)).
    */
  private def dualBaseEntropyBoth(
      df: DataFrame,
      attributes: Seq[String],
      baseS: Int,
      baseA: Int): ((Map[String, Double], Map[String, Double]),
      (Map[String, Double], Map[String, Double])) = {
    val grouped = Cleaning.nullSentinel(
        df.select((attributes.map(c => col(c).cast("string").as(c)) :+
          col("cluster_id")): _*),
        attributes)
      .groupingSets(Seq(Seq.empty, Seq(col("cluster_id"))), col("cluster_id"))
      .agg(
        entropy_agg(baseS, attributes.map(c => c -> col(c)): _*).as("ent_s"),
        entropy_agg(baseA, attributes.map(c => c -> col(c)): _*).as("ent_a"),
        grouping(col("cluster_id")).as("_g"))
    val row = grouped
      .select((attributes.map(c =>
          max(when(col("_g") === 1, col("ent_s").getItem(c))).as(s"ws_$c")) ++
        attributes.map(c =>
          max(when(col("_g") === 1, col("ent_a").getItem(c))).as(s"wa_$c")) ++
        attributes.map(c =>
          mean(when(col("_g") === 0, col("ent_s").getItem(c))).as(s"cs_$c")) ++
        attributes.map(c =>
          mean(when(col("_g") === 0, col("ent_a").getItem(c))).as(s"ca_$c"))): _*)
      .collect()(0)
    def part(off: Int) = attributes.zipWithIndex.map { case (c, i) =>
      c -> (if (row.isNullAt(off + i)) 0.0 else row.getDouble(off + i))
    }.toMap
    val n = attributes.length
    ((part(0), part(n)), (part(2 * n), part(3 * n)))
  }

  /** Y8 — information-gain power ratio `I_s ^ I_a` over a clustered dataset:
    * scaled base c = #non-singleton clusters, adjusted base u from the caller (Y9 on the
    * original data); each I = Σ_cols (whole-matched entropy − mean per-cluster entropy).
    * Both bases AND both groupings ride one GROUPING SETS aggregation
    * ([[dualBaseEntropyBoth]]), so the whole metric is 1 entropy job, not 2 (r10)
    * or 4 (the one-job-per-(grouping × base) original) — and the matched frame
    * has a single consumer, so its cache is gone too.
    */
  def informationGainPowerRatio(
      clusters: DataFrame,
      attributes: Seq[String],
      adjustedBase: Int): Double = {
    val counts = clusters.groupBy("cluster_id").count()
      .withColumnRenamed("count", "_cluster_count")
    val data = clusters.join(counts, Seq("cluster_id"), "left")
    val numClusters = counts.filter(col("_cluster_count") > 1).count().toInt
    val matched = data.filter(col("_cluster_count") > 1)
    val ((ms, ma), (cs, ca)) =
      dualBaseEntropyBoth(matched, attributes, numClusters, adjustedBase)
    val is = attributes.map(c => ms(c) - cs(c)).sum
    val ia = attributes.map(c => ma(c) - ca(c)).sum
    math.pow(is, ia)
  }
}
