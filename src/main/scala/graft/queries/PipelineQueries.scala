package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.auto.AutoLinker
import graft.cluster.ConnectedComponents
import graft.model.ComparisonSpec
import graft.score.FellegiSunter
import graft.train.Estimation

/** End-to-end pipeline entries (SURVEY §3 EP1/EP3): fixed-parameter dedupe and the
  * auto-search loop. Iterative/driver-looped — rows-only driver check; pinned by
  * ScalaTest instead of SQL oracles.
  */
object PipelineQueries {

  /** The minimum end-to-end slice from SURVEY §7: clean → block → gammas → train
    * (u-sampling + one EM rule) → predict → cluster → cluster sizes.
    */
  def e2eDedupe(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/customer.parquet")
      .withColumn("uid", col("c_custkey").cast("string"))
      .withColumn("c_nationkey", col("c_nationkey").cast("string"))
      .withColumn("k", (col("c_custkey") % 100).cast("string"))
    val specs = Seq(
      ComparisonSpec("c_name", "levenshtein", 3),
      ComparisonSpec("k", "levenshtein", 1))
    val model = Estimation.train(
      df, "uid", specs,
      blockingRules = Seq("l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment"),
      trainingRules = Seq("l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment"),
      uTargetPairs = 20000L)
    val preds = FellegiSunter.predict(df, "uid", model)
    val edges = preds.filter(col("match_probability") >= 0.5)
      .select(col("uid_l").as("src"), col("uid_r").as("dst"))
    ConnectedComponents.assignClusters(df, "uid", edges)
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .orderBy(desc("cluster_size"), asc("cluster_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ep1_e2e_dedupe" -> (e2eDedupe _),
    // the trained search loops with FULL generated oracles (see AutoLinkOracle)
    "ep1_auto_link_two_trials" -> (AutoLinkOracle.twoTrialsQuery _),
    "ep1_auto_link_two_table_trials" -> (AutoLinkOracle.twoTrialsLinkQuery _),
    "ep1_e2e_dedupe_pinned" -> (E2eOracle.pinnedQuery _),
    "ep1_auto_link" -> { (s, dir) =>
      import s.implicits._
      val df = s.read.parquet(s"$dir/customer.parquet")
        .orderBy("c_custkey").limit(1000) // bounded smoke across scale factors
        .select(col("c_custkey").cast("string").as("unique_id"),
          col("c_name"), col("c_mktsegment"),
          (col("c_custkey") % 20).cast("string").as("k"))
      val result = AutoLinker.autoLink(df,
        attributeColumns = Some(Seq("c_name", "c_mktsegment", "k")),
        maxEvals = 2, comparisonSizeLimit = 500000L)
      result.trials.map(t =>
        (t.blockingRule, t.metric, t.model.lambda, t.model.comparisons.map(_.metric).mkString(",")))
        .toDF("blocking_rule", "metric", "lambda", "comparison_metrics")
    },
    "ep1_auto_link_two_tables" -> { (s, dir) =>
      import s.implicits._
      // link mode: two halves of customer with renamed columns — Y10 recovers the
      // mapping, then blocking/training/prediction run across the tables only
      // (iterative search loop — rows-only check; pinned by MetricsSpec)
      val c = s.read.parquet(s"$dir/customer.parquet").orderBy("c_custkey").limit(1000)
      val left = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey").cast("string").as("id"),
          substring(col("c_name"), 1, 12).as("name_prefix"),
          col("c_mktsegment").as("segment"), col("c_nationkey").cast("string").as("nation"))
      val right = c.filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey").cast("string").as("id"),
          substring(col("c_name"), 1, 12).as("prefix"),
          col("c_mktsegment").as("mkt"), col("c_nationkey").cast("string").as("nat"))
      val result = AutoLinker.autoLinkTables(left, right, uidCol = "id",
        maxEvals = 2, comparisonSizeLimit = 500000L)
      result.trials.map(t =>
        (t.blockingRule, t.metric, t.model.lambda, t.model.comparisons.map(_.metric).mkString(",")))
        .toDF("blocking_rule", "metric", "lambda", "comparison_metrics")
    })

  val oracleSql: Map[String, String] = Map(
    "ep1_auto_link_two_trials" -> AutoLinkOracle.twoTrialsSql,
    "ep1_auto_link_two_table_trials" -> AutoLinkOracle.twoTrialsLinkSql,
    "ep1_e2e_dedupe_pinned" -> E2eOracle.pinnedSql)
}
