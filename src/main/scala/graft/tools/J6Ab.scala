package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ColumnParams, ComparisonSpec, TrainedModel}
import graft.score.FellegiSunter
import graft.util.Caching
import graft.util.Caching.CacheSyntax

/** One-off diagnostic main (r11 optimization): same-JVM A/B of two
  * `mutualBestPairs` reductions over the `j6_one_to_one` workload —
  *
  *   - PERSIST (r10 shipped): persist the narrow scored projection, symmetrize
  *     as a UNION of two reads of the persisted table, struct-MIN argmax, then a
  *     persisted self-join. Two MEMORY_AND_DISK materializations (~|pairs| rows
  *     and ~|records| rows); the driver-run 33.45 s (vs 5.35 s quiet) spike in
  *     BENCH_r10 hit exactly this shape under co-located memory/disk load.
  *   - EXPLODE (candidate): fold the symmetrization INTO the scoring pass — each
  *     scored pair explodes into its two (src, dst, mw) orientations feeding the
  *     struct-MIN argmax directly. No pair-table persist at all; the only
  *     materialization left is the |records|-bounded argmax list for the
  *     mutual self-join.
  *
  * Identical output by construction (same symmetric multiset → same argmax →
  * same mutual filter); the main checks it (count + order-independent hash).
  * Times each plan alternately on a quiet machine, then under an in-process
  * 8-thread CPU burner; writes timings to target/BENCH_J6_AB.json.
  */
object J6Ab {

  private def demoModel = TrainedModel(0.01,
    Seq(ComparisonSpec("c_name", "levenshtein", 3),
      ComparisonSpec("c_mktsegment", "jaro_winkler", 0.9)),
    Map(
      "c_name" -> ColumnParams(Array(0.05, 0.2, 0.75), Array(0.85, 0.1, 0.05)),
      "c_mktsegment" -> ColumnParams(Array(0.1, 0.2, 0.7), Array(0.6, 0.2, 0.2))),
    Seq("(l.c_nationkey = r.c_nationkey)"))

  private def scored(s: SparkSession, dir: String): DataFrame = {
    val df = s.read.parquet(s"$dir/customer.parquet")
      .withColumn("uid", col("c_custkey").cast("string"))
      .withColumn("c_nationkey", col("c_nationkey").cast("string"))
    FellegiSunter.predict(df, "uid", demoModel, saltFactor = 8)
  }

  /** r10-shipped shape (mirror of FellegiSunter.mutualBestPairs @ d24edac). */
  private def persistPlan(sc: DataFrame, threshold: Double): DataFrame = {
    val e0 = sc
      .select(col("uid_l"), col("uid_r"),
        col("match_weight"), col("match_probability"))
      .scopedPersist()
    val e = e0.filter(col("match_probability") >= threshold)
      .select(col("uid_l"), col("uid_r"), round(col("match_weight"), 6).as("mw"))
    val sym = e.select(col("uid_l").as("src"), col("uid_r").as("dst"), col("mw"))
      .unionByName(e.select(col("uid_r").as("src"), col("uid_l").as("dst"), col("mw")))
    val best = sym
      .groupBy("src")
      .agg(min(struct((lit(0.0) - col("mw")).as("nw"), col("dst"))).as("b"))
      .select(col("src"), (lit(0.0) - col("b.nw")).as("mw"), col("b.dst").as("dst"))
      .scopedPersist()
    best.as("a")
      .join(best.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .filter(col("a.src") < col("a.dst"))
      .select(col("a.src").as("uid_l"), col("a.dst").as("uid_r"),
        col("a.mw").as("match_weight"))
  }

  /** Candidate: symmetrize via explode inside the scoring pass, no pair persist. */
  private def explodePlan(sc: DataFrame, threshold: Double): DataFrame = {
    val e = sc.filter(col("match_probability") >= threshold)
      .select(col("uid_l"), col("uid_r"), round(col("match_weight"), 6).as("mw"))
    val sym = e.select(explode(array(
        struct(col("uid_l").as("src"), col("uid_r").as("dst"), col("mw")),
        struct(col("uid_r").as("src"), col("uid_l").as("dst"), col("mw")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"), col("p.mw").as("mw"))
    val best = sym
      .groupBy("src")
      .agg(min(struct((lit(0.0) - col("mw")).as("nw"), col("dst"))).as("b"))
      .select(col("src"), (lit(0.0) - col("b.nw")).as("mw"), col("b.dst").as("dst"))
      .scopedPersist()
    best.as("a")
      .join(best.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .filter(col("a.src") < col("a.dst"))
      .select(col("a.src").as("uid_l"), col("a.dst").as("uid_r"),
        col("a.mw").as("match_weight"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(useExplode: Boolean, threshold: Double = 0.0): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      var n = 0L
      var h = 0L
      Caching.withCached {
        val out = (if (useExplode) explodePlan(scored(spark, sfDir), threshold)
          else persistPlan(scored(spark, sfDir), threshold))
        val row = out.select(
            count(lit(1)).as("n"),
            coalesce(expr("bit_xor(xxhash64(uid_l, uid_r, CAST(match_weight AS STRING)))"),
              lit(0L)).as("h"))
          .collect()(0)
        n = row.getLong(0); h = row.getLong(1)
      }
      val sec = (System.nanoTime() - t0) / 1e9
      Caching.releaseAll()
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      (sec, n, h)
    }

    def phase(label: String, threshold: Double = 0.0): Seq[(String, Double, Long, Long)] =
      Seq(false, true, false, true).zipWithIndex.map { case (ex, i) =>
        val (sec, n, h) = run(ex, threshold)
        val name = s"$label:${if (ex) "explode" else "persist"}:run${i / 2 + 1}"
        System.err.println(f"[j6-ab] $name%-26s $sec%7.2f s ($n pairs, hash $h)")
        (name, sec, n, h)
      }

    // warm both plans (codegen + JIT over the comparison ladder dominates cold runs)
    run(useExplode = false); run(useExplode = true)
    val quiet = phase("quiet")

    @volatile var stop = false
    val burners = (0 until 8).map { k =>
      val t = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + k
        while (!stop) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        if (x == 0) System.err.println("")
      })
      t.setDaemon(true); t.start(); t
    }
    val loaded = phase("loaded")
    stop = true
    burners.foreach(_.join(1000))
    // selective-threshold arms (r11 advice): the shipped j6_one_to_one runs at
    // threshold 0.0 / salt 8 (LinkageQueries.scala), which the phases above
    // match; this phase additionally covers a selective serve threshold. Its
    // pair set differs from the 0.0 arms by construction, so it is recorded
    // separately and excluded from the equal-output check.
    val selective = phase("t0.9", threshold = 0.9)

    val all = quiet ++ loaded
    val outcomes = all.map(r => (r._3, r._4)).distinct
    require(selective.map(r => (r._3, r._4)).distinct.size == 1,
      s"t0.9 plans disagree: ${selective.map(r => (r._1, r._3, r._4)).mkString(", ")}")
    require(outcomes.size == 1,
      s"plans disagree: ${all.map(r => (r._1, r._3, r._4)).mkString(", ")}")
    val json = (all ++ selective).map { case (k, v, _, _) => s""""$k":$v""" }.mkString(
      s"""{"pairs":${outcomes.head._1},"hash":${outcomes.head._2},""", ",", "}")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/BENCH_J6_AB.json"), json + "\n")
    spark.stop()
  }
}
