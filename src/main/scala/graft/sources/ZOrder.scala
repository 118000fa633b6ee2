package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Z-order (Morton) multi-column data layout — the file-skipping story for 100 TB
  * scans.
  *
  * A table laid out in insertion order clusters only its leading key: a predicate on
  * any OTHER column overlaps nearly every file's min/max range, so "selective" scans
  * still read the whole table. Interleaving the bits of k quantized columns into one
  * Morton key and range-partitioning on it gives every interleaved column locality at
  * once — per-file min/max footers become tight on ALL of them, and a point/range
  * predicate on any of the k columns prunes most files at planning time. This is the
  * layout trick behind Delta/Iceberg `ZORDER BY`; here it is plain OSS Spark:
  * quantize → interleave → `repartitionByRange` → per-partition sort → parquet.
  *
  * Everything is exact integer arithmetic (quantize by `(x - min) * maxBin div span`,
  * bit j extracted as `x div 2^j % 2`), so any engine replays the key bit-for-bit —
  * the DuckDB oracle runs the SAME rendered formula, only the integer-division token
  * differs (`div` vs `//`).
  *
  * Scale notes: the min/max pass is ONE aggregation collecting 2k longs; the layout
  * itself is the one range exchange the rewrite exists to pay (it replaces the
  * full-table scans every later query would otherwise do). Quantization guards
  * against `(x - min) * maxBin` overflow loudly rather than wrapping.
  */
object ZOrder {

  /** Max representable bin per column at `bits`. */
  private def maxBin(bits: Int): Long = (1L << bits) - 1

  /** Renders the quantize-one-column formula: `((ref - min) * maxBin) div span`,
    * clamped to [0, maxBin], with a span-0 (constant column) guard. Pure integer
    * arithmetic; `div` is the engine's integer-division token.
    */
  def binFormula(ref: String, minRef: String, maxRef: String, bits: Int,
      div: String): String = {
    val mb = maxBin(bits)
    // LEAST guards x == max landing exactly on maxBin + any engine rounding of the
    // span edge; the CASE guards a constant column (span 0)
    s"CASE WHEN ($maxRef) = ($minRef) THEN 0 " +
      s"ELSE LEAST($mb, ((($ref) - ($minRef)) * $mb) $div (($maxRef) - ($minRef))) END"
  }

  /** Renders the Morton interleave of pre-quantized bin expressions: bit j of bin i
    * lands at output position `j * n + i`. Rendered as `div 2^j % 2` times a
    * power-of-two constant and summed — bits are disjoint, so `+` IS the bitwise OR,
    * and every op is portable integer arithmetic.
    */
  def interleaveFormula(binRefs: Seq[String], bits: Int, div: String): String = {
    val n = binRefs.size
    require(n >= 1, "z-order needs at least one column")
    require(n * bits <= 62, s"interleave of $n cols x $bits bits overflows a long")
    val terms = for {
      (b, i) <- binRefs.zipWithIndex
      j <- 0 until bits
    } yield {
      // no `L` literal suffix: the bin refs are already BIGINT in both engines, so
      // products promote — and DuckDB does not parse Spark's `123L` suffix
      val weight = 1L << (j * n + i)
      s"((($b) $div ${1L << j}) % 2) * $weight"
    }
    terms.mkString("(", " + ", ")")
  }

  /** Single-agg exact min/max of each column (cast to long). Bounded: 2k values. */
  def columnBounds(df: DataFrame, cols: Seq[String], bits: Int): Seq[(Long, Long)] = {
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(Seq(LongType, IntegerType, ShortType).contains(dt),
        s"z-order column `$c` must be integral, got $dt (quantize reals upstream)")
    }
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"_min_$c"), max(col(c)).cast("long").as(s"_max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    require(!row.isNullAt(0), "z-order over an empty (or all-null key) input")
    cols.indices.map { i =>
      val (lo, hi) = (row.getLong(2 * i), row.getLong(2 * i + 1))
      require(hi == lo || (hi - lo) <= Long.MaxValue / maxBin(bits),
        s"z-order span of `${cols(i)}` would overflow quantization — rescale upstream")
      (lo, hi)
    }
  }

  /** Adds the Morton key `zval` computed over `cols` at `bits` bits per column.
    * Bounds come from ONE aggregation; the key itself is a codegen'd integer
    * expression (no shuffle, no UDF).
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int,
      out: String = "zval"): DataFrame = {
    require(!df.columns.contains(out), s"z-order output column `$out` already exists")
    val bounds = columnBounds(df, cols, bits)
    val bins = cols.zip(bounds).map { case (c, (lo, hi)) =>
      binFormula(s"`$c`", s"${lo}L", s"${hi}L", bits, "div")
    }
    df.withColumn(out, expr(interleaveFormula(bins, bits, "div")))
  }

  /** The full layout rewrite: Morton key → range partition into `numFiles` →
    * per-partition sort on the key → key dropped. Write the result with any file
    * sink; each output file's min/max footer is then tight on every `cols` member.
    */
  def layoutBy(df: DataFrame, cols: Seq[String], bits: Int, numFiles: Int): DataFrame =
    withZValue(df, cols, bits, "_zval")
      .repartitionByRange(numFiles, col("_zval"))
      .sortWithinPartitions("_zval")
      .drop("_zval")

  /** Renders the whole zval as ONE self-contained SQL expression over `table`
    * columns with inline scalar-subquery bounds — the oracle-side replay. */
  def zvalSqlOracle(table: String, cols: Seq[String], bits: Int, div: String): String = {
    // CAST pins 32-bit source columns to BIGINT before the *maxBin multiply —
    // DuckDB would otherwise overflow-check the product in int32
    val bins = cols.map { c =>
      binFormula(s"CAST($c AS BIGINT)", s"(SELECT MIN(CAST($c AS BIGINT)) FROM $table)",
        s"(SELECT MAX(CAST($c AS BIGINT)) FROM $table)", bits, div)
    }
    interleaveFormula(bins, bits, div)
  }
}
