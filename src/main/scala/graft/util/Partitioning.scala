package graft.util

import org.apache.spark.sql.SparkSession

/** Scale-adaptive shuffle sizing for ITERATIVE operators (guide §2.2 "fewer,
  * larger partitions"; the optimization-round rule "make partitioning
  * scale-adaptive — derive from input size — rather than a constant").
  *
  * An iterative loop (PageRank, HITS, LPA) re-plans the same tiny-to-huge
  * shuffle shape every round; AQE coalesces the post-shuffle READ side at
  * runtime, but each round's checkpoint still materializes, and each stage
  * still launches, at the session's `spark.sql.shuffle.partitions` — pure
  * scheduling overhead when the vector is thousands of rows, and exactly right
  * when it is billions. Deriving the loop's partition count from the actual
  * row count keeps both regimes on one code path: tiny graphs run their ~30
  * micro-stages on 1-2 partitions, cluster-scale graphs saturate the
  * parallelism cap.
  */
object Partitioning {

  /** Partition count for ~`rowsPerPartition` rows each, in
    * [1, defaultParallelism]. The cap keeps the derivation machine-honest: a
    * row count beyond cores × rowsPerPartition saturates at the session's
    * parallelism (the same value the constant would have had), so this can
    * only REMOVE empty-partition overhead, never starve a big job.
    */
  def adaptive(spark: SparkSession, rows: Long, rowsPerPartition: Long = 50000L): Int = {
    val cores = spark.sparkContext.defaultParallelism.toLong
    math.max(1L, math.min(cores, rows / rowsPerPartition + 1)).toInt
  }

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `n`, restoring the
    * session value after — plans compiled inside (an iterative loop's rounds)
    * pick `n` up; everything outside is untouched.
    */
  def withShufflePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
