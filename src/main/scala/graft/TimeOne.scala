package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("timeone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = a(0)
    val names = a.drop(1)
    for (n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, dir)
      val cnt = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $n%s $sec%.3f s rows=$cnt")
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
