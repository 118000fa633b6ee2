package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet tables — the co-located-join sink/source pair.
  *
  * At cluster scale the dominant cost of a fact-to-fact equi-join is shuffling both
  * sides on the key. Writing each side bucketed (hash-partitioned into a fixed number
  * of files) on the join key moves that shuffle to write time, ONCE; every later join
  * or aggregation on the key reads co-located buckets and runs with no Exchange at
  * all. This is the standard Spark answer to "repeatedly joined 100 TB tables" —
  * the reference never needs it (its inputs are single tables), but any repeated
  * linkage of the same corpora should stage inputs this way.
  *
  * Plumbing notes (all OSS Spark): `bucketBy` requires `saveAsTable` (bucket metadata
  * lives in the catalog, not the files); both sides must use the same bucket count
  * for the exchange-free join; `sortBy` additionally pre-sorts each bucket file so a
  * sort-merge join can skip its Sort when each bucket holds one file per side.
  */
object BucketedTables {

  /** Writes `df` as a bucketed (and per-bucket sorted) parquet table at `path`,
    * replacing any previous table of the same name.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // overwrite of an external table keeps stale files; drop + clean start instead
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val writer = df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) writer.sortBy(sortCols.head, sortCols.tail: _*) else writer)
      .saveAsTable(tableName)
  }

  /** Inner equi-join of two tables on `keys` — exchange-free when both are bucketed
    * on the (first) key with equal bucket counts.
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String]): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys)
}
