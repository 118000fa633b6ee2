package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log sessionization: a new session starts whenever the gap to the user's
  * previous event exceeds `gapSeconds`. One window pass per user (lag → boundary
  * indicator → running sum), so the shuffle is a single hash partition on the user
  * key and the per-user sort is bounded by that user's event count — the standard
  * scale shape for clickstream/training-telemetry pipelines.
  */
object Sessionize {

  /** Adds `session_index` (0-based per user, in time order). `tsCol` must be a
    * timestamp; gaps are compared on whole microseconds so engines agree exactly.
    */
  def assign(events: DataFrame, userCol: Column, tsCol: Column, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val prev = lag(unix_micros(tsCol), 1).over(w)
    val isNew = when(prev.isNull, lit(0))
      .otherwise((unix_micros(tsCol) - prev > gapSeconds * 1000000L).cast("int"))
    events.withColumn("session_index",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
