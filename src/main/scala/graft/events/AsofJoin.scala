package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the feature-engineering workhorse for training data:
  * for every left row, attach the latest right row with the same key and
  * `right.ts <= left.ts` (leakage-safe: never a future value).
  *
  * Implemented as union + one window pass, NOT a range join: tag both sides, union,
  * and carry the right payload forward as a single struct with
  * `last(payload, ignoreNulls)` over `(key) ORDER BY (ts, side, tie)`. That is ONE
  * hash shuffle on the key plus a per-key sort — a range join would either expand to
  * an inequality join (quadratic per key) or need interval bucketing. Right rows sort
  * before left rows at equal `ts`, so the match is inclusive; the whole payload
  * travels as one struct, so all attached columns always come from the SAME right
  * row; `rightTie` makes that row deterministic when a key has several right rows at
  * one timestamp (largest tie value wins).
  *
  * At 100 TB the single hash shuffle on the join key is the floor for any as-of
  * semantics. Skewed keys (one user with millions of events) cost a big per-key
  * sort — the standard mitigation is a composite key + coarse time-bucket upstream.
  */
object AsofJoin {

  /** @param left      probe side; keeps ALL its columns (must not already contain
    *                  `_side`/`_tie`/`_rv`)
    * @param right     value side
    * @param keyCol    equi-join key column name (same name both sides)
    * @param tsCol     event-time column name (same name both sides)
    * @param valueCols right columns attached as `<col>_asof` (null when no right row
    *                  is at or before `ts`)
    * @param rightTie  right column ordering ties at equal (key, ts)
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTie: String): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, rightTie, forward = false)

  /** Forward as-of: for every left row, attach the EARLIEST right row with the same
    * key and `right.ts >= left.ts` — the label-attachment join ("next conversion at
    * or after this impression"). Same single union + window pass as [[leftAsof]],
    * with time descending so the carried payload is the nearest FUTURE right row;
    * inclusive at equal `ts`, largest `rightTie` wins ties (mirroring backward).
    */
  def leftAsofForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTie: String): DataFrame =
    asofImpl(left, right, keyCol, tsCol, valueCols, rightTie, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      rightTie: String,
      forward: Boolean): DataFrame = {
    require(valueCols.nonEmpty, "leftAsof needs at least one value column")
    val reserved = Seq("_side", "_tie", "_rv", "_carried")
    require(left.columns.intersect(reserved).isEmpty,
      s"left side must not contain ${reserved.mkString("/")}")
    // output columns <valueCol>_asof must not silently shadow existing left columns
    val asofClashes = valueCols.map(c => s"${c}_asof").intersect(left.columns.toSeq)
    require(asofClashes.isEmpty,
      s"left side already contains output column(s) ${asofClashes.mkString(", ")}")
    val leftCols = left.columns.toSeq

    // a null-ts right row can never satisfy `right.ts <= left.ts` — and unfiltered it
    // would sort first in the window and leak its payload to every left row
    val rPrep = right.filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(rightTie).as("_tie"),
        struct(valueCols.map(col): _*).as("_rv"))
      .withColumn("_side", lit(0))
    val lPrep = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(rPrep.schema("_tie").dataType))
      .withColumn("_rv", lit(null).cast(rPrep.schema("_rv").dataType))
    val rAligned = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(rPrep)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    // forward flips only the time direction: scanning ts-descending, the last right
    // row carried at a left row is the nearest FUTURE one; `_side` still sorts right
    // before left at equal ts (inclusive), `_tie` ascending keeps largest-tie-wins
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window.partitionBy(keyCol)
      .orderBy(tsOrder, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lPrep.unionByName(rAligned)
      .withColumn("_carried", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_carried.$c").as(s"${c}_asof")): _*)
  }
}
