package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (the Deequ / Great Expectations check
  * suite every large-scale ingest runs before publishing a table): null checks,
  * value ranges, accepted sets, key uniqueness, referential integrity.
  *
  * Scale design: all ROW-LOCAL expectations (not-null / range / accepted-set)
  * compile into ONE aggregate over ONE scan — k checks cost one pass of
  * conditional sums, not k passes. Uniqueness is one hash aggregation on the key
  * (count − distinct via two-level agg, no window); referential integrity is one
  * left-anti join per foreign key, broadcastable when the dimension is small.
  * Output is a tiny verdict table (one row per expectation) safe to collect,
  * alert on, or gate a release with.
  */
object Expectations {

  sealed trait Expectation { def name: String; def target: String }
  /** `col IS NOT NULL` */
  final case class NotNull(column: String) extends Expectation {
    val name = "not_null"; val target = column
  }
  /** `lo <= col <= hi` (null counts as a violation — range implies presence) */
  final case class InRange(column: String, lo: Double, hi: Double) extends Expectation {
    val name = "in_range"; val target = column
  }
  /** `col IN (values)` (null violates) */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Expectation {
    val name = "accepted_values"; val target = column
  }
  /** composite key has no duplicate rows */
  final case class Unique(columns: Seq[String]) extends Expectation {
    val name = "unique"; val target = columns.mkString(",")
  }
  /** Every non-null value of `column` exists in `dim`'s `dimColumn`.
    * `broadcastDim = false` for dimensions too large to broadcast (falls back to
    * a shuffled anti-join on the key).
    */
  final case class RefIntegrity(column: String, dim: DataFrame, dimColumn: String,
      broadcastDim: Boolean = true) extends Expectation {
    val name = "ref_integrity"; val target = column
  }

  private def violationExpr(e: Expectation): Column = e match {
    case NotNull(c) => when(col(c).isNull, 1L).otherwise(0L)
    case InRange(c, lo, hi) =>
      when(col(c).isNull || col(c) < lo || col(c) > hi, 1L).otherwise(0L)
    case AcceptedValues(c, vs) =>
      when(col(c).isNull || !col(c).isin(vs: _*), 1L).otherwise(0L)
    case _ => throw new IllegalArgumentException(s"not row-local: $e")
  }

  /** Run a suite against `df`. Output (one row per expectation, input order
    * preserved by `check_id`): (check_id, expectation, target, n_rows,
    * n_violations, violation_rate round 6, passed).
    */
  def validate(df: DataFrame, suite: Seq[Expectation]): DataFrame = {
    require(suite.nonEmpty, "empty expectation suite")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.util.Caching.CacheSyntax
    val src = df.scopedPersist() // one materialization feeds every check family
    val rowLocal = suite.zipWithIndex.collect {
      case (e @ (_: NotNull | _: InRange | _: AcceptedValues), i) => (e, i)
    }
    // single pass: [total, viol_0, viol_1, ...] in one aggregate
    val rowLocalDf: Option[DataFrame] = if (rowLocal.isEmpty) None else Some {
      val aggs = count(lit(1)).as("n_rows") +:
        rowLocal.map { case (e, i) => sum(violationExpr(e)).as(s"v_$i") }
      val row = src.agg(aggs.head, aggs.tail: _*)
      rowLocal.map { case (e, i) =>
        row.select(lit(i).as("check_id"), lit(e.name).as("expectation"),
          lit(e.target).as("target"), col("n_rows"), col(s"v_$i").as("n_violations"))
      }.reduce(_ unionByName _)
    }
    val keyed = suite.zipWithIndex.collect {
      case (e: Unique, i) =>
        val cols = e.columns.map(col)
        // duplicate rows beyond the first occurrence of each key count as violations
        src.groupBy(cols: _*).agg(count(lit(1)).as("_n"))
          .agg(coalesce(sum("_n"), lit(0L)).as("n_rows"),
            coalesce(sum(col("_n") - 1), lit(0L)).as("n_violations"))
          .select(lit(i).as("check_id"), lit(e.name).as("expectation"),
            lit(e.target).as("target"), col("n_rows"), col("n_violations"))
      case (e: RefIntegrity, i) =>
        val dimKeys = e.dim.select(col(e.dimColumn).as(e.column)).distinct()
        val orphans = src.select(col(e.column)).filter(col(e.column).isNotNull)
          .join(if (e.broadcastDim) broadcast(dimKeys) else dimKeys,
            Seq(e.column), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        src.agg(count(lit(1)).as("n_rows")).crossJoin(orphans)
          .select(lit(i).as("check_id"), lit(e.name).as("expectation"),
            lit(e.target).as("target"), col("n_rows"), col("n_violations"))
    }
    (rowLocalDf.toSeq ++ keyed).reduce(_ unionByName _)
      .select(col("check_id"), col("expectation"), col("target"), col("n_rows"),
        col("n_violations"),
        round(when(col("n_rows") > 0, col("n_violations").cast("double") / col("n_rows"))
          .otherwise(lit(0.0)), 6).as("violation_rate"),
        (col("n_violations") === 0L).as("passed"))
  }
}
