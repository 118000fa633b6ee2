package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose the scoring cost: pair volume, pure gamma+weight compute, persist. */
object ProfScore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("prof-score").config("spark.sql.shuffle.partitions", "32")
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
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val scored = graft.score.FellegiSunter.predict(df, "uid", demoModel)
    val n = t("pair count (pruned)") { scored.count() }
    println(s"pairs = $n")
    t("sum(mw) full eval no store") {
      scored.agg(sum("match_weight")).collect()
    }
    t("sum(mw)+sum(prob)") {
      scored.agg(sum("match_weight"), sum("match_probability")).collect()
    }
    t("persist narrow + count") {
      val p = scored.select(col("uid_l"), col("uid_r"),
        col("match_weight"), col("match_probability")).persist()
      p.count()
    }
    spark.stop()
  }
}
