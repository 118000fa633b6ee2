package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scoped stage profiler for j6_one_to_one at sf0.1. */
object ProfOneToOne {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("prof-j6").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.model.{ColumnParams, ComparisonSpec, TrainedModel}
    val demoModel = TrainedModel(0.01,
      Seq(ComparisonSpec("c_name", "levenshtein", 3),
        ComparisonSpec("c_mktsegment", "jaro_winkler", 0.9)),
      Map("c_name" -> ColumnParams(Array(0.05, 0.2, 0.75), Array(0.85, 0.1, 0.05)),
        "c_mktsegment" -> ColumnParams(Array(0.1, 0.2, 0.7), Array(0.6, 0.2, 0.2))),
      Seq("(l.c_nationkey = r.c_nationkey)"))
    val df = spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("uid", col("c_custkey").cast("string"))
      .withColumn("c_nationkey", col("c_nationkey").cast("string"))
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val scored = graft.score.FellegiSunter.predict(df, "uid", demoModel)
    t("predict.count") { scored.count() }
    val e0 = t("persist narrow") {
      val p = scored.select(col("uid_l"), col("uid_r"), col("match_weight"),
        col("match_probability")).persist()
      p.count(); p
    }
    val e = e0.filter(col("match_probability") >= 0.0)
      .select(col("uid_l"), col("uid_r"), round(col("match_weight"), 6).as("mw"))
    val sym = e.select(col("uid_l").as("src"), col("uid_r").as("dst"), col("mw"))
      .unionByName(e.select(col("uid_r").as("src"), col("uid_l").as("dst"), col("mw")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("mw").desc, col("dst"))
    val best = sym.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).select("src", "dst", "mw")
    t("window best.count") { best.count() }
    t("mutual join count") {
      best.as("a").join(best.as("b"),
          col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
        .filter(col("a.src") < col("a.dst")).count()
    }
    spark.stop()
  }
}
