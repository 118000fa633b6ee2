package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join without a range nested loop.
  *
  * A raw `p.ts BETWEEN i.start AND i.end` join has no equi-key, so Spark executes it
  * as a broadcast nested loop — O(points × intervals) comparisons, the same
  * scale-killer the as-of join avoids ([[AsofJoin]]). Here time is cut into
  * fixed-width bins: each interval replicates to the bins it spans (one row-local
  * `sequence` explode, bounded by `maxBinsPerInterval`), each point maps to exactly
  * one bin, and the join becomes a hash equi-join on the bin id with the exact
  * BETWEEN as a residual filter. Shuffle volume is `points + Σ span_bins(interval)`;
  * pick `binWidth` near the typical interval length so that sum stays ~|intervals|.
  * Same key-salting story as every equi-join here: a hot bin is a hot key, AQE's
  * skew-join splits it.
  */
object IntervalJoin {

  /** Inner join of `points` (with `tsCol`) against `intervals` (with `startCol`,
    * `endCol`, inclusive bounds): every output row is a (point, containing-interval)
    * pair. Columns from both sides are kept (interval columns win name clashes —
    * callers project/rename first when both sides share names).
    *
    * @param binWidthSeconds bin size; intervals longer than
    *   `binWidthSeconds · maxBinsPerInterval` fail loudly rather than silently
    *   exploding the replication factor.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      tsCol: String,
      startCol: String,
      endCol: String,
      binWidthSeconds: Long,
      maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidthSeconds > 0, s"binWidthSeconds must be positive, got $binWidthSeconds")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    Seq("_bin", "_span").foreach(reserved =>
      Seq(points, intervals).foreach(df => require(!df.columns.contains(reserved),
        s"pointInInterval uses a reserved '$reserved' column; inputs must not contain one")))

    def bin(c: Column): Column = floor(unix_timestamp(c) / binWidthSeconds).cast("long")

    val startBin = bin(col(startCol))
    val endBin = bin(col(endCol))
    // fail loudly on a replication blow-up: a silent cap would drop matches
    val guarded = intervals.withColumn("_span", endBin - startBin + 1)
    val binned = guarded
      .withColumn("_bin", explode(sequence(
        startBin,
        when(col("_span") > maxBinsPerInterval,
          raise_error(concat(lit(s"pointInInterval: interval spans more than " +
            s"$maxBinsPerInterval bins of ${binWidthSeconds}s at "), col(startCol))))
          .otherwise(endBin))))
      .drop("_span")
    points.withColumn("_bin", bin(col(tsCol)))
      .join(binned, "_bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bin")
  }
}
