package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the native replacement for the reference's `profile_columns`
  * dashboard passthrough (reference: autolinker.py:1097-1148 delegates to Splink's
  * HTML profiler; we expose the underlying statistics as a DataFrame instead).
  *
  * One pass over the data: unpivot to `(col_name, value)` rows (scan stays single;
  * the C× row blow-up is collapsed by map-side combine before the only data-sized
  * shuffle), then a per-column rollup over the bounded distinct-value table. Top
  * value ties break (count desc, value desc) via one `max(struct(n, value))` — no
  * window over the raw data.
  */
object Profile {

  /** Per-column stats: row/non-null/distinct counts, the modal value with its count,
    * and Shannon entropy (natural log) of the non-null value distribution.
    *
    * Values are compared as strings (the engine's canonical attribute type —
    * reference semantics, SURVEY §1).
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    // escape quotes in the label literal AND backticks in the identifier — a
    // backtick in a column name would otherwise break out of the quoted identifier
    val stackArgs = cols
      .map(c => s"'${c.replace("'", "''")}', cast(`${c.replace("`", "``")}` as string)")
      .mkString(", ")
    val stacked = df.selectExpr(s"stack(${cols.length}, $stackArgs) as (col_name, value)")
    val counts = stacked.groupBy("col_name", "value").agg(count(lit(1)).as("n"))
    val nonNull = col("value").isNotNull
    counts.groupBy("col_name").agg(
        sum("n").as("n_rows"),
        coalesce(sum(when(nonNull, col("n"))), lit(0L)).as("n_nonnull"),
        count(when(nonNull, lit(1))).as("n_distinct"),
        max(when(nonNull, struct(col("n"), col("value")))).as("top"),
        sum(when(nonNull, col("n") * log(col("n")))).as("sum_n_ln_n"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"), col("n_distinct"),
        col("top.value").as("top_value"), col("top.n").as("top_count"),
        when(col("n_nonnull") > 0,
          log(col("n_nonnull")) - col("sum_n_ln_n") / col("n_nonnull"))
          .as("entropy"))
  }

  /** Sketch-based profile for UNBOUNDED-cardinality columns, where
    * [[profileColumns]]'s exact distinct-value table would itself be data-sized:
    * `approx_count_distinct` (HyperLogLog++, ~`rsd` relative error) per column in
    * ONE aggregation pass over the unpivoted scan — no per-value table, no second
    * shuffle, fixed sketch memory per column regardless of cardinality. Entropy and
    * modal value need the value table and are deliberately absent here — at sketch
    * scale they want CMS/heavy-hitter machinery; this covers the
    * row/non-null/distinct triple that capacity planning actually reads.
    */
  def profileColumnsApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profileColumnsApprox needs at least one column")
    val stackArgs = cols
      .map(c => s"'${c.replace("'", "''")}', cast(`${c.replace("`", "``")}` as string)")
      .mkString(", ")
    val stacked = df.selectExpr(s"stack(${cols.length}, $stackArgs) as (col_name, value)")
    stacked.groupBy("col_name").agg(
      count(lit(1)).as("n_rows"),
      count(col("value")).as("n_nonnull"),
      approx_count_distinct(col("value"), rsd).as("n_distinct_approx"))
  }

  /** Top-`k` heavy hitters of a join/partition key with their share of the table and
    * skew factor vs the uniform expectation (`n · n_keys / total`) — the diagnostic
    * that says whether a shuffle join on this key needs salting or AQE skew handling
    * before it runs.
    *
    * Scale shape: one hash aggregate on the key, a bounded top-k (`TakeOrdered` —
    * never a full sort of the count table), and a 1-row collect for the totals. The
    * rank window runs over the k collected survivors only.
    */
  /** Zipf fit of the corpus token-frequency curve: OLS of ln(freq) on ln(rank) over
    * the top `topK` tokens — the data-card statistic that flags a degenerate corpus
    * (natural text sits near slope −1; boilerplate-heavy or templated corpora
    * flatten or steepen it). The corpus-sized work is ONE token-count aggregation;
    * the ranked fit runs over the `topK` survivors of a TakeOrdered (bounded — the
    * rank window never sees the full vocabulary). Returns one row:
    * (slope, intercept, r2, n_tokens_fit). Round-6 like every cross-engine float.
    */
  def zipfFit(tokens: DataFrame, tokenCol: String, topK: Int): DataFrame = {
    require(topK >= 3, s"zipfFit needs topK >= 3, got $topK")
    import org.apache.spark.sql.expressions.Window
    val top = tokens.groupBy(col(tokenCol).as("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(topK)
    val xy = top
      .withColumn("rank", row_number().over(Window.orderBy(desc("n"), asc("token"))))
      .select(log(col("rank").cast("double")).as("x"), log(col("n").cast("double")).as("y"))
    xy.agg(count(lit(1)).cast("double").as("cnt"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(
        round((col("cnt") * col("sxy") - col("sx") * col("sy")) /
          (col("cnt") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - (col("cnt") * col("sxy") - col("sx") * col("sy")) /
          (col("cnt") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("cnt"), 6)
          .as("intercept"),
        round(((col("cnt") * col("sxy") - col("sx") * col("sy")) *
          (col("cnt") * col("sxy") - col("sx") * col("sy"))) /
          ((col("cnt") * col("sxx") - col("sx") * col("sx")) *
            (col("cnt") * col("syy") - col("sy") * col("sy"))), 6).as("r2"),
        col("cnt").cast("long").as("n_tokens_fit"))
  }

  /** Robust per-group profile of a numeric column: median, MAD (median absolute
    * deviation — the robust σ), p5/p95, and the 5–95% winsorized mean. Outlier-
    * insensitive statistics are what a data card should quote for heavy-tailed
    * quantities like document length, where a handful of giant documents drags the
    * plain mean.
    *
    * Exact `percentile` (type-7 linear interpolation, DuckDB `quantile_cont`'s
    * definition) — swap `percentile_approx` in past ~10⁹ rows per group. Two
    * aggregation passes (the second needs each row's distance from its group
    * median) joined through the bounded per-group stats table. The winsorized
    * mean is assembled from an EXACT integer interior sum plus `n_low·p5 +
    * n_high·p95` — a few-term closed form, deterministic across engines and
    * partitionings, rather than a float sum over clamped values.
    */
  def robustStats(
      df: DataFrame,
      groupCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column): DataFrame = {
    val base = df.select(groupCol.as("grp"), valueCol.as("v"))
    base.schema("v").dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      // exact interior sum holds for integral values
      case other => throw new IllegalArgumentException(
        s"robustStats needs an integral value column (exact winsorized sum), got $other")
    }
    val stats = base.groupBy("grp").agg(
      count(lit(1)).as("n"),
      expr("percentile(v, 0.5D)").as("median"),
      expr("percentile(v, 0.05D)").as("p05"),
      expr("percentile(v, 0.95D)").as("p95"))
    val joined = base.join(broadcast(stats), "grp")
    joined.groupBy("grp")
      .agg(
        first("n").as("n"),
        first("median").as("median"),
        first("p05").as("p05"),
        first("p95").as("p95"),
        expr("percentile(abs(v - median), 0.5D)").as("mad"),
        sum(when(col("v") >= col("p05") && col("v") <= col("p95"), col("v"))
          .otherwise(lit(0L))).as("s_mid"),
        sum((col("v") < col("p05")).cast("long")).as("n_low"),
        sum((col("v") > col("p95")).cast("long")).as("n_high"))
      .select(col("grp"), col("n"), col("median"), col("mad"), col("p05"), col("p95"),
        ((col("s_mid") + col("n_low") * col("p05") + col("n_high") * col("p95")) /
          col("n")).as("winsorized_mean"))
  }

  def keySkew(df: DataFrame, key: org.apache.spark.sql.Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    import graft.util.Caching.CacheSyntax
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("n")).scopedPersist()
    val statsRow = counts.agg(sum("n").as("total"), count(lit(1)).as("n_keys")).first()
    // empty table: sum is NULL — report zero rows rather than NPE (the top-k below
    // is empty either way; the placeholders never reach a row)
    val total = if (statsRow.isNullAt(0)) 1L else statsRow.getLong(0)
    val nKeys = statsRow.getLong(1)
    val top = counts.orderBy(desc("n"), asc("key")).limit(k)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("n"), asc("key"))))
      .select(col("rank"), col("key"), col("n"),
        round(col("n") / lit(total.toDouble), 6).as("share"),
        round(col("n") * lit(nKeys.toDouble) / lit(total.toDouble), 6).as("skew"))
  }

  /** Benford first-significant-digit profile — the classic naturalness check for
    * amount-like numeric columns (Newcomb 1881 / Benford 1938; the fraud-and-
    * synthetic-data alarm an ingest audit runs next to [[robustStats]]): real
    * multiplicative data has P(first digit = d) = log10(1 + 1/d); uniform or
    * fabricated values don't.
    *
    * The leading digit comes from the STRING form of the cent-scaled integer —
    * `round(x·100)` cast long then string — never from `floor(log10 x)`, whose
    * power-of-ten boundary cells are libm-dependent and would not replay
    * bit-identically on another engine. One row-local projection + ONE 9-bucket
    * hash agg; zero/null amounts are excluded (they carry no leading digit).
    *
    * ASSUMES CENT RESOLUTION: `amount` is read as a price-like value meaningful
    * to 2 decimal places. Sub-cent magnitudes are dropped (|x| < 0.005 rounds to
    * 0 cents), and a sub-unit value just below a decade boundary is binned by its
    * cent-rounded form, not its true mantissa (0.0999 → 10 cents → digit 1,
    * though its first significant digit is 9). For generic scientific columns
    * spanning many orders of magnitude, normalize mantissas to [1, 10) before
    * calling (e.g. `x / pow(10, floor(log10(abs(x))))`) — at the cost of the
    * libm portability noted above.
    *
    * @return 9 rows (digit, n, share, benford_share, abs_dev), digit ascending
    */
  def benford(df: DataFrame, amount: org.apache.spark.sql.Column): DataFrame = {
    val digit = substring(round(abs(amount) * 100, 0).cast("long").cast("string"), 1, 1)
    val counts = df
      .filter(amount.isNotNull && abs(amount) * 100 >= lit(0.5))
      .select(digit.cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = sum("n").over(org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))) // 9-row window: global by construction, never by data
    val expected = log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
    counts
      .select(col("digit"), col("n"),
        round(col("n") / total, 6).as("share"),
        round(expected, 6).as("benford_share"),
        round(abs(col("n") / total - expected), 6).as("abs_dev"))
  }
}
