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

    val al = spark.read.parquet(s"$dir/customer.parquet")
      .orderBy("c_custkey").limit(1000)
      .select(col("c_custkey").cast("string").as("unique_id"),
        col("c_name"), col("c_mktsegment"),
        (col("c_custkey") % 20).cast("string").as("k"))
    time("autoLink 2 trials")(
      graft.auto.AutoLinker.autoLink(al,
        attributeColumns = Some(Seq("c_name", "c_mktsegment", "k")),
        maxEvals = 2, comparisonSizeLimit = 500000L).trials.size)
    time("autoLink 0 trials-ish (1 eval)")(
      graft.auto.AutoLinker.autoLink(al,
        attributeColumns = Some(Seq("c_name", "c_mktsegment", "k")),
        maxEvals = 1, comparisonSizeLimit = 500000L).trials.size)
    spark.stop()
  }
}
