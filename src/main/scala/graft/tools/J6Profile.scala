package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ColumnParams, ComparisonSpec, TrainedModel}
import graft.score.FellegiSunter

/** One-off diagnostic main (r9 verdict #2): task-seconds split of the
  * `j6_one_to_one` pipeline — which stage carries the query's cost:
  *
  *   A. the scoring scan (salted nation-blocked pair join + gamma ladder +
  *      FS score, materialized into the narrow persisted projection);
  *   B. symmetrize + struct-MIN argmax aggregation over the persisted scores;
  *   C. the mutual-best self-join.
  *
  * Each phase runs under its own job group with a listener summing task
  * executorRunTime, twice (second run = steady state), fresh JVM. Writes
  * target/BENCH_J6_PROFILE.json.
  */
object J6Profile {

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

    // per-job-group task-seconds: jobGroup -> sum of task executorRunTime
    val taskMs = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val groupOfStage = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val g = Option(js.properties).map(_.getProperty("spark.jobGroup.id")).orNull
        if (g != null) js.stageIds.foreach(sid => groupOfStage.put(sid, g))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val g = groupOfStage.get(te.stageId)
        if (g != null && te.taskMetrics != null)
          taskMs.merge(g, te.taskMetrics.executorRunTime, (a, b) => a + b)
      }
    })

    // the j6_one_to_one configuration (LinkageQueries demo model, nation blocking)
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
      .withColumn("uid", col("c_custkey").cast("string"))
      .withColumn("c_nationkey", col("c_nationkey").cast("string"))
    val model = TrainedModel(0.01,
      Seq(ComparisonSpec("c_name", "levenshtein", 3),
        ComparisonSpec("c_mktsegment", "jaro_winkler", 0.9)),
      Map("c_name" -> ColumnParams(Array(0.05, 0.2, 0.75), Array(0.85, 0.1, 0.05)),
        "c_mktsegment" -> ColumnParams(Array(0.1, 0.2, 0.7), Array(0.6, 0.2, 0.2))),
      Seq("(l.c_nationkey = r.c_nationkey)"))

    def phase[T](name: String, run: Int)(f: => T): (T, Double) = {
      spark.sparkContext.setJobGroup(s"$name:run$run", name)
      val t0 = System.nanoTime()
      val out = f
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      (out, wall)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    (1 to 2).foreach { run =>
      // A: scoring scan into the narrow projection (what mutualBestPairs persists)
      val scored = FellegiSunter.predict(df, "uid", model, saltFactor = 8)
        .select(col("uid_l"), col("uid_r"), col("match_weight"), col("match_probability"))
        .persist()
      val (nPairs, wa) = phase("A_score", run) { scored.count() }
      // B: symmetrize + struct-MIN argmax
      val e = scored.filter(col("match_probability") >= 0.0)
        .select(col("uid_l"), col("uid_r"), round(col("match_weight"), 6).as("mw"))
      val sym = e.select(col("uid_l").as("src"), col("uid_r").as("dst"), col("mw"))
        .unionByName(e.select(col("uid_r").as("src"), col("uid_l").as("dst"), col("mw")))
      val best = sym.groupBy("src")
        .agg(min(struct((lit(0.0) - col("mw")).as("nw"), col("dst"))).as("b"))
        .select(col("src"), (lit(0.0) - col("b.nw")).as("mw"), col("b.dst").as("dst"))
        .persist()
      val (nBest, wb) = phase("B_argmax", run) { best.count() }
      // C: mutual join
      val (nMutual, wc) = phase("C_mutual", run) {
        best.as("a").join(best.as("b"),
            col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
          .filter(col("a.src") < col("a.dst")).count()
      }
      scored.unpersist(); best.unpersist()
      spark.sqlContext.clearCache(); System.gc()
      System.err.println(f"[j6-profile] run$run: score $wa%6.2f s ($nPairs pairs), " +
        f"argmax $wb%6.2f s ($nBest records), mutual $wc%6.2f s ($nMutual pairs)")
      results ++= Seq(s"wall_A_score_run$run" -> wa,
        s"wall_B_argmax_run$run" -> wb, s"wall_C_mutual_run$run" -> wc)
    }
    import scala.jdk.CollectionConverters._
    val task = taskMs.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""task_s_$k":${v.toDouble / 1000.0}""" }
    val walls = results.map { case (k, v) => s""""$k":$v""" }
    val json = (walls ++ task).mkString("{", ",", "}")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/BENCH_J6_PROFILE.json"), json + "\n")
    spark.stop()
  }
}
