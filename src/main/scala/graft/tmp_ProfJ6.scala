package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfJ6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - s) / 1e9}%8.2f s"); r
    }
    val df = spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("uid", col("c_custkey").cast("string"))
    val model = LinkageQueries.demoModel
      .copy(blockingRules = Seq("(l.c_nationkey = r.c_nationkey)"))
    val scored = graft.score.FellegiSunter.predict(df, "uid", model)
    t("predict.count")(println(scored.count()))
    t("predict.count again")(println(scored.count()))
    val pairsOnly = scored.select(col("uid_l"), col("uid_r")).persist()
    t("keys.persist.count")(println(pairsOnly.count()))
    pairsOnly.unpersist()
    val mwOnly = scored.select(col("uid_l"), col("uid_r"), col("match_weight")).persist()
    t("mw.persist.count")(println(mwOnly.count()))
    mwOnly.unpersist()
    val e0 = scored.select(col("uid_l"), col("uid_r"),
      col("match_weight"), col("match_probability")).persist()
    t("e0.persist.count")(println(e0.count()))
    e0.unpersist()
    val gam = graft.compare.Comparisons.withGammas(
      graft.blocking.PairGenerator.dedupePairs(df, "uid",
        Seq("c_name", "c_mktsegment", "c_nationkey"),
        model.blockingRules.map(graft.blocking.BlockingRule.parse)),
      model.comparisons)
      .select(col("uid_l"), col("uid_r"), col("gamma_c_name"), col("gamma_c_mktsegment"))
      .persist()
    t("gammas.persist.count")(println(gam.count()))
    gam.unpersist()
    val mb = graft.score.FellegiSunter.mutualBestPairs(scored, 0.0)
    t("mutualBest.count")(println(mb.count()))
    spark.stop()
  }
}
