package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.textops.TextOps
import graft.util.Caching
import graft.util.Caching.CacheSyntax

/** One-off diagnostic main (r9 verdict #3): same-JVM A/B of the two PPJoin
  * rarest-first prefix-selection plans over the `dedup_ngram_jaccard_prefix`
  * workload —
  *
  *   - AGG (current, r9 dc11c32): collect_list → per-row array_sort → slice,
  *     a hash aggregation with row-local bounded sorts;
  *   - WINDOW (pre-r9): row_number() over (partition by id order by df, tok),
  *     a hash partition + full sort of the exploded token stream.
  *
  * Both produce identical pairs (oracle-pinned); the open question was QUIET-run
  * cost (the r9 swap was justified by contention-flatness alone). Runs each plan
  * alternately twice on a quiet machine, then twice under an in-process 8-thread
  * CPU burner, and writes second-run timings to target/BENCH_PPJOIN_AB.json.
  */
object PrefixAb {

  /** The bench query's corpus: documents + planted every-7th exact dups and
    * every-11th near-dups (mirrors TextQueries.plantedCorpus).
    */
  private def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("lang"), col("n_chars")))
      .unionByName(
        d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" xtradup token")).as("text"), col("lang"), col("n_chars")))
  }

  /** prefixJaccardPairs (Dedup.scala) with the prefix-selection stage swappable. */
  private def pairs(df: DataFrame, useWindow: Boolean, threshold: Double): DataFrame = {
    val prepped = df.select(col("doc_id").as("id"),
        TextOps.distinctShingles(col("text"), 3).as("toks"))
      .withColumn("sz", size(col("toks")))
      .scopedPersist()
    val items = prepped.select(col("id"), col("sz"), explode(col("toks")).as("tok"))
    val dfreq = items.groupBy("tok").agg(count(lit(1)).as("df"))
    val withDf = items.join(dfreq, "tok")
    val prefLen = (col("sz") - ceil(lit(threshold) * col("sz")) + lit(1)).cast("int")
    val prefixes = (if (useWindow) {
      val w = Window.partitionBy("id").orderBy(col("df"), col("tok"))
      withDf.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= prefLen)
        .select(col("id"), col("sz"), col("tok"))
    } else {
      withDf.groupBy(col("id"), col("sz"))
        .agg(slice(array_sort(collect_list(struct(col("df"), col("tok")))),
          lit(1), prefLen).as("pref"))
        .select(col("id"), col("sz"), explode(col("pref.tok")).as("tok"))
    }).scopedPersist()
    val l = prefixes.select(col("id").as("id_l"), col("sz").as("sz_l"), col("tok"))
    val r = prefixes.select(col("id").as("id_r"), col("sz").as("sz_r"), col("tok"))
    val cands = l.join(r, Seq("tok"))
      .filter(col("id_l") < col("id_r") &&
        col("sz_r") >= lit(threshold) * col("sz_l") - lit(1e-7) &&
        col("sz_l") >= lit(threshold) * col("sz_r") - lit(1e-7))
      .select("id_l", "id_r").distinct()
    cands
      .join(prepped.select(col("id").as("id_l"), col("toks").as("toks_l"),
        col("sz").as("sz_l")), "id_l")
      .join(prepped.select(col("id").as("id_r"), col("toks").as("toks_r"),
        col("sz").as("sz_r")), "id_r")
      .withColumn("inter", size(array_intersect(col("toks_l"), col("toks_r"))))
      .filter(col("inter").cast("double") >=
        lit(threshold) * (col("sz_l") + col("sz_r") - col("inter")) - lit(1e-7))
      .select(col("id_l"), col("id_r"))
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
    val corpus = plantedCorpus(spark, sfDir)

    def timeOne(useWindow: Boolean): (Double, Long) = {
      val t0 = System.nanoTime()
      var n = 0L
      Caching.withCached { n = pairs(corpus, useWindow, 0.5).count() }
      val sec = (System.nanoTime() - t0) / 1e9
      Caching.releaseAll()
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
      (sec, n)
    }

    def phase(label: String): Seq[(String, Double, Long)] =
      Seq(true, false, true, false).zipWithIndex.map { case (w, i) =>
        val (sec, n) = timeOne(w)
        val name = s"$label:${if (w) "window" else "agg"}:run${i / 2 + 1}"
        System.err.println(f"[ppjoin-ab] $name%-24s $sec%7.2f s ($n pairs)")
        (name, sec, n)
      }

    // warm both plans once (codegen, shuffle service, page cache)
    timeOne(useWindow = true); timeOne(useWindow = false)
    val quiet = phase("quiet")

    // in-process 25% burner: 8 of 32 threads spinning ALU work
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

    val all = quiet ++ loaded
    val counts = all.map(_._3).distinct
    val json = all.map { case (k, v, _) => s""""$k":$v""" }.mkString(
      s"""{"pair_counts":${counts.mkString("[", ",", "]")},""", ",", "}")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/BENCH_PPJOIN_AB.json"), json + "\n")
    spark.stop()
  }
}
