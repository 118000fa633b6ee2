package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Variant shapes for the mutual-best reduction at sf0.1. */
object ProfOneToOne2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("prof-j6b").config("spark.sql.shuffle.partitions", "32")
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
    val e = scored.filter(col("match_probability") >= 0.0)
      .select(col("uid_l"), col("uid_r"), round(col("match_weight"), 6).as("mw"))
    // explode-symmetrize: scoring evaluated ONCE per pair, no persist
    val sym = e.select(explode(array(
        struct(col("uid_l").as("src"), col("uid_r").as("dst"), col("mw")),
        struct(col("uid_r").as("src"), col("uid_l").as("dst"), col("mw")))).as("p"))
      .select(col("p.src"), col("p.dst"), col("p.mw"))
    val agg = sym.groupBy("src")
      .agg(min(struct((-col("mw")).as("nmw"), col("dst").as("d"))).as("b"))
      .select(col("src"), col("b.d").as("dst"), (-col("b.nmw")).as("mw"))
    val best = t("agg best materialize") { val p = agg.persist(); p.count(); p }
    t("mutual join (persisted)") {
      best.as("a").join(best.as("b"),
          col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
        .filter(col("a.src") < col("a.dst")).count()
    }
    println(agg.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Aggregate") || l.contains("Exchange")).mkString("\n"))
    spark.stop()
  }
}
