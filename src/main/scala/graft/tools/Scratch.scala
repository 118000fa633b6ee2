package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{ColumnParams, ComparisonSpec, TrainedModel}
import graft.score.FellegiSunter

/** Temporary profiling harness (not part of the product surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val demoSpecs = Seq(
      ComparisonSpec("c_name", "levenshtein", 3),
      ComparisonSpec("c_mktsegment", "jaro_winkler", 0.9))
    val demoParams = Map(
      "c_name" -> ColumnParams(Array(0.05, 0.2, 0.75), Array(0.85, 0.1, 0.05)),
      "c_mktsegment" -> ColumnParams(Array(0.1, 0.2, 0.7), Array(0.6, 0.2, 0.2)))
    val demoModel = TrainedModel(0.01, demoSpecs, demoParams,
      Seq("(l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment)"))

    val df = spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("uid", col("c_custkey").cast("string"))
      .withColumn("truth", (col("c_custkey") % 30).cast("string"))
      .withColumn("c_nationkey", col("c_nationkey").cast("string"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // warm-up
    df.groupBy("c_mktsegment").count().count()

    val preds = FellegiSunter.predict(df, "uid", demoModel)
    val pairs = graft.blocking.PairGenerator.dedupePairs(df, "uid",
      Seq("c_name", "c_mktsegment", "c_nationkey"),
      demoModel.blockingRules.map(graft.blocking.BlockingRule.parse))
    time("pairs count only")(preds.select("uid_l").count())
    time("sum(levenshtein)")(
      pairs.agg(sum(levenshtein(col("c_name_l"), col("c_name_r")))).collect())
    time("sum(jw)")(
      pairs.agg(sum(graft.functions.jaro_winkler(
        col("c_mktsegment_l"), col("c_mktsegment_r")))).collect())
    time("sum(gamma_c_name)")(
      pairs.agg(sum(graft.compare.Comparisons.gammaColumn(demoSpecs(0)))).collect())
    time("sum(gamma_mkt)")(
      pairs.agg(sum(graft.compare.Comparisons.gammaColumn(demoSpecs(1)))).collect())
    time("scored agg (sum weight)")(
      preds.agg(sum("match_weight")).collect())
    time("filtered count p>0.05")(
      preds.filter(col("match_probability") > 0.05).count())
    time("y17 full")(
      graft.metrics.PairwiseMetrics.confusionMetrics(df, preds, 0.05, "uid", "truth",
        assumeUniquePairs = true).count())
    spark.stop()
  }
}
