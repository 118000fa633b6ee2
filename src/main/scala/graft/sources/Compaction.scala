package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance planning for sharded/versioned sinks: small-file
  * compaction grouping (the OPTIMIZE/`bin-pack` half of a lakehouse compactor)
  * and version-retention vacuum plans (the `VACUUM ... RETAIN` half). Both are
  * pure plans over a file MANIFEST — (path, size, partition/version columns) —
  * so they compose with any sink that can list its files; executing a plan is
  * one `coalesce`-write per bin, which stays the caller's job.
  *
  * Scale shape: all windows partition by the TABLE PARTITION (or shard) column
  * — never a global sort — so a 100 TB table with thousands of partitions
  * plans each partition's packing independently; the plan output is one row
  * per bin/shard, many orders smaller than the manifest.
  */
object Compaction {

  /** Pack each table partition's small files (`size <= smallBytes`) into
    * compaction bins of roughly `targetBytes`: files are ordered size DESC
    * (path ASC ties — next-fit-decreasing order) and assigned
    * `bin = floor((running_total − size) / targetBytes)` in ONE window pass.
    * A bin can exceed the target by less than one file — the standard
    * single-pass streaming-bin-packing bound, which OPTIMIZE-style compactors
    * accept in exchange for never sorting twice. Files above `smallBytes` are
    * already "compact" and excluded.
    *
    * Output: one row per (partition, bin) — file count, total bytes, and the
    * lexicographic first/last member paths (enough to audit determinism).
    */
  def planCompaction(
      manifest: DataFrame,
      partitionCol: String,
      pathCol: String,
      sizeCol: String,
      smallBytes: Long,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    require(smallBytes > 0 && smallBytes <= targetBytes,
      s"smallBytes ($smallBytes) must be in (0, targetBytes=$targetBytes]")
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(col(sizeCol).desc, col(pathCol).asc)
    manifest.filter(col(sizeCol) <= smallBytes)
      .withColumn("_cum", sum(col(sizeCol)).over(w))
      .withColumn("bin",
        floor((col("_cum") - col(sizeCol)) / lit(targetBytes)).cast("int"))
      .groupBy(col(partitionCol).as("part"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("total_bytes"),
        min(col(pathCol)).as("first_path"),
        max(col(pathCol)).as("last_path"))
  }

  /** Version-retention vacuum plan: per shard, keep the `keepVersions` newest
    * versions (dense rank on version DESC, so several files of one version
    * count as one version) and emit what a vacuum would delete — file count,
    * reclaimed bytes, and the version range going away. Shards whose history
    * is within the retention produce no row.
    */
  def planVacuum(
      manifest: DataFrame,
      shardCol: String,
      versionCol: String,
      sizeCol: String,
      keepVersions: Int): DataFrame = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(versionCol).desc)
    manifest.withColumn("_vrk", dense_rank().over(w))
      .filter(col("_vrk") > keepVersions)
      .groupBy(col(shardCol).as("shard"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("reclaimed_bytes"),
        min(col(versionCol)).as("oldest_version"),
        max(col(versionCol)).as("newest_deleted_version"))
  }
}
