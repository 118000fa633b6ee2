package graft.util

import org.apache.spark.sql.DataFrame

/** Tracks the persistent-RDD blocks created by `localCheckpoint` so iterative
  * operators can free each round's blocks as soon as the next round has materialized
  * (the checkpointed data of round i is only needed to compute round i+1; without
  * explicit freeing, blocks accumulate until a driver GC triggers the context cleaner,
  * which a large driver heap can defer for the whole session).
  */
final class CheckpointTracker(spark: org.apache.spark.sql.SparkSession) {
  private val sc = spark.sparkContext
  private var current: Set[Int] = Set.empty

  /** Eagerly checkpoints `df`; frees the PREVIOUS checkpoint's blocks. The
    * checkpointed plan's INHERITED size estimate is capped via
    * [[org.apache.spark.sql.graftbridge.Bridge.capCheckpointStats]] — without the
    * cap, join-product sizeInBytes estimates compound geometrically across rounds
    * and BigInt stats arithmetic takes over the driver (minutes per round by
    * round ~10 of a multi-join iteration).
    */
  def rotate(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint() // eager: safe to free the previous round after this
    // the created blocks are read off the returned plan's LogicalRDD, NOT by
    // diffing the session-global registry — the diff raced on concurrent driver
    // threads (two trackers rotating at once could free each other's blocks)
    val created = org.apache.spark.sql.graftbridge.Bridge.checkpointedRddIds(out)
    free(current)
    current = created
    org.apache.spark.sql.graftbridge.Bridge.capCheckpointStats(out)
  }

  /** Frees the final checkpoint too — call once the consumer has materialized. */
  def close(): Unit = { free(current); current = Set.empty }

  private def free(ids: Set[Int]): Unit =
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
}
