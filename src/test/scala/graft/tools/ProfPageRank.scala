package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scoped profiling harness (never ships): per-iteration-count PageRank wall
  * times at an arbitrary SF dir. Run: sbt 'Test/runMain graft.tools.ProfPageRank'.
  */
object ProfPageRank {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("prof-pagerank")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val n = d.count()
    val edges = d.filter(col("doc_id") % 11 =!= 0)
      .select(concat(lit("d"), col("doc_id")).as("src"),
        concat(lit("d"), (col("doc_id") * 7 + 1) % n).as("dst"))
    Seq(1, 2, 4, 6, 10).foreach { it =>
      val t0 = System.nanoTime()
      graft.util.Caching.withCached {
        graft.cluster.PageRank.pageRank(edges, 0.85, it).count()
      }
      println(f"iters=$it%2d  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
