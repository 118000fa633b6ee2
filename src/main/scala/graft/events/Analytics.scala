package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-analytics operators: ordered funnels and cohort retention — the two
  * aggregate shapes product/event pipelines run constantly.
  *
  * Both are compositions of keyed aggregates and equi-joins on the user key (one
  * shuffle partitioning reused across stages), never window-over-everything or
  * self-joins on time ranges — the shapes that survive a 1000-executor event table.
  */
object Analytics {

  /** Ordered-step funnel: a user reaches step i when they completed steps 1..i in
    * strictly increasing timestamp order (first qualifying occurrence each — the
    * standard "first touch" funnel). Returns one row per stage:
    * (stage_index, stage, n_users), where `stage` names the step path so far.
    * EAGER: stage counts are computed when called (the result is a local frame).
    *
    * Work per step: one filtered aggregate + an equi-join against the (shrinking)
    * reached-users table — users drop out monotonically, so later stages cost less.
    * Each stage frame is persisted through the scoped cache while counting: stage
    * i's lineage contains stages 1..i−1, which would otherwise recompute per count.
    */
  def funnelCounts(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      typeCol: Column,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelCounts needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    import graft.util.Caching.CacheSyntax
    val first = events.filter(typeCol === steps.head)
      .groupBy(userCol.as("u")).agg(min(tsCol).as("t"))
      .scopedPersist()
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(typeCol === step)
        .select(userCol.as("u"), tsCol.as("ts"))
        .join(prev, "u")
        .filter(col("ts") > col("t"))
        .groupBy("u").agg(min(col("ts")).as("t"))
        .scopedPersist()
    }
    val counts = reached.map(_.count())
    steps.indices.map { i =>
      (i + 1, steps.take(i + 1).mkString(">"), counts(i))
    }.toDF("stage_index", "stage", "n_users")
  }

  /** Cohort retention: users are cohorted by the calendar date of their FIRST event;
    * for each (cohort_date, day_offset ≤ maxOffsetDays) counts the distinct cohort
    * users active that day. Returns (cohort_date, day_offset, n_users);
    * day_offset 0 is the cohort size by construction.
    *
    * Two aggregates and one user-keyed join — the cohort table is one row per user.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      maxOffsetDays: Int): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be >= 0, got $maxOffsetDays")
    val cohort = events.groupBy(userCol.as("u"))
      .agg(min(to_date(tsCol)).as("cohort_date"))
    events.select(userCol.as("u"), to_date(tsCol).as("d")).distinct()
      .join(cohort, "u")
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy("cohort_date", "day_offset")
      .agg(count_distinct(col("u")).as("n_users"))
  }

  /** Per-key daily volume anomalies: z-score of each (key, day) event count against
    * that key's own daily distribution. Returns (key, day, n, z, is_anomaly) with
    * |z| ≥ `threshold` flagged.
    *
    * The variance comes from the CLOSED FORM over integer-valued sums —
    * `(Σn² − (Σn)²/c) / (c−1)` — instead of `stddev_samp`, deliberately: streaming
    * moment aggregates are summation-order-dependent in the last ULP (and differ
    * between engines). The squared terms accumulate as DOUBLES holding integer
    * values: exact (hence order-independent and engine-identical) while every
    * partial sum stays below 2^53, and gracefully imprecise past that — a pure
    * Long Σn² would instead WRAP silently around 3e9 events/day in non-ANSI Spark
    * and error in DuckDB. Two keyed aggregates, joined on the (tiny: one row per
    * key) stats side.
    */
  def dailyAnomalies(
      events: DataFrame,
      keyCol: Column,
      tsCol: Column,
      threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val daily = events.groupBy(keyCol.as("key"), to_date(tsCol).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("key").agg(
      sum("n").as("s1"),
      sum(col("n").cast("double") * col("n")).as("s2"),
      count(lit(1)).as("c"))
    daily.join(stats, "key")
      .withColumn("mu", col("s1") / col("c"))
      .withColumn("var",
        (col("s2") - col("s1").cast("double") * col("s1") / col("c")) / (col("c") - 1))
      .withColumn("z",
        when(col("c") <= 1 || col("var") <= 0, lit(0.0))
          .otherwise(round((col("n") - col("mu")) / sqrt(col("var")), 4)))
      .select(col("key"), col("day"), col("n"), col("z"),
        (abs(col("z")) >= threshold).as("is_anomaly"))
  }
}
