package graft.blocking

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Candidate blocking-rule generation — the P1-P4 pipelines of SURVEY §2.2
  * (reference: scala/.../arc/ARC.scala:10-113), re-expressed as declarative DataFrame
  * programs so Catalyst handles pushdown/pruning and `orderBy+limit` becomes
  * TakeOrderedAndProject.
  *
  * Scale design: P1's random pre-bucketing bounds each partial count-map to one bucket's
  * keys before the single merge; the in-aggregate threshold prune and top-1000 cap bound
  * memory regardless of input size; P2-P4 operate on a driver-collected map of at most
  * ~1000 entries (an intentional, size-bounded driver boundary — reference ARC.scala:107-110).
  */
object RuleGen {

  /** P1 — per candidate AND-rule (column combination of size exactly `k`), robust block
    * statistics `(n = #blocks, avg_k = trimmed mean of blockCount²)`.
    *
    * @param seed seed for the random bucketing; the reference uses unseeded `rand()`
    *             (ARC.scala:19) — we thread a seed for reproducibility.
    * @param exactPercentiles use exact `percentile` instead of `percentile_approx`
    *             (the oracle path at small SF; approx is the default at scale).
    */
  def generateCountLookup(
      df: DataFrame,
      k: Int,
      attributes: Seq[String],
      seed: Long = 42L,
      exactPercentiles: Boolean = false,
      deterministicBuckets: Boolean = false,
      thresholdOverride: Option[Int] = None): DataFrame = {
    val dfSize = df.count()
    val partitions = math.max(df.rdd.getNumPartitions, 1)
    val threshold = thresholdOverride.getOrElse(((dfSize * 0.2) / partitions).toInt)

    val attrCols = attributes.map(a => a -> col(a).cast("string"))
    val bucket =
      if (deterministicBuckets)
        pmod(abs(hash(attributes.map(col): _*)), lit(partitions))
      else (rand(seed) * partitions).cast("int")

    val pct =
      if (exactPercentiles)
        expr("percentile(k, array(0.1d, 0.5d, 0.9d))")
      else percentile_approx(col("k"), array(lit(0.1), lit(0.5), lit(0.9)), lit(1000))

    val window = Window.partitionBy(col("rule"))
    df.groupBy(bucket.as("bucket"))
      .agg(combinatorial_count_agg(k, threshold.toLong, 1000, attrCols: _*).as("m"))
      .agg(merge_count_map_agg(col("m")).as("m"))
      .select(explode(col("m")).as(Seq("key", "count")))
      .withColumn("k", col("count") * col("count"))
      .withColumn("rule", split(col("key"), ";").getItem(0))
      // winsorize per rule: clamp block costs outside (p10, p90) to the median
      .withColumn("percentiles", pct.over(window))
      .withColumn("adjusted_k",
        when(col("k") > col("percentiles").getItem(0) &&
             col("k") < col("percentiles").getItem(2), col("k"))
          .otherwise(col("percentiles").getItem(1)))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n"),
        floor(avg(col("adjusted_k"))).cast("long").as("avg_k"))
      .select(col("rule"), struct(col("n"), col("avg_k")).as("rule_stats"))
  }

  /** P2 — expand the rule alphabet into OR-combinations of size `n`, beam-pruned by the
    * estimated pair cost (limit 1000 twice, matching the reference's beam).
    */
  def generateRules(df: DataFrame, n: Int, countMap: Map[String, (Long, Long)]): DataFrame = {
    val partials = df
      .select(generate_combinations(lit(n), col("rules")).as("combinations"), col("rules"))
      .withColumn("partial_count", estimate_squared_count_or(col("combinations"), countMap))
      .orderBy(desc("partial_count"))
      .limit(1000)

    val combinations =
      if (n > 1)
        partials.select(
          generate_partial_combinations(lit(n - 2), col("combinations"), col("rules"))
            .as("combinations"))
      else partials

    combinations
      .distinct()
      .select(
        to_splink_rule(col("combinations")).as("splink_rule"),
        estimate_squared_count_or(col("combinations"), countMap).as("rule_squared_count"))
      .orderBy(col("rule_squared_count").desc)
      .limit(1000)
  }

  /** P3 — fold [[generateRules]] over OR-sizes 1..k and union the candidates. */
  def generateORRules(
      spark: SparkSession,
      countMap: Map[String, (Long, Long)],
      k: Int): DataFrame = {
    import spark.implicits._
    val baseDf = Seq((1, countMap.keys.toSeq.sorted)).toDF("id", "rules")
    val dfN1 = generateRules(baseDf, 1, countMap)
    if (k > 1)
      (2 to k).foldLeft(dfN1)((df, i) => df.union(generateRules(baseDf, i, countMap)))
        .distinct()
    else dfN1.distinct()
  }

  /** P4 — end to end: count stats → driver-collected map (≤1000·C entries) → candidates. */
  def generateBlockingRules(
      df: DataFrame,
      n: Int,
      k: Int,
      attributes: Seq[String],
      seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val countMap = generateCountLookup(df, n, attributes, seed)
      .as[(String, (Long, Long))]
      .collect()
      .toMap
    generateORRules(spark, countMap, k)
  }
}
