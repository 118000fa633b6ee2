package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation for the quality-model loop: ROC-AUC (tie-aware
  * Mann–Whitney midranks), Brier score, and reliability/calibration bins. These are
  * the acceptance gates a data-curation team runs before trusting a quality
  * classifier to filter a 100 TB corpus, computed relationally so the evaluation
  * runs where the scores live instead of collecting them to a driver.
  *
  * Scale design: AUC needs a global rank over scores — a naive `row_number()` over
  * an un-partitioned window would stream every score through ONE partition. Instead
  * the scores collapse to per-distinct-value groups (a hash aggregate), each group
  * lands in one of 1024 value-range buckets whose numeric order agrees with score
  * order, a bounded 1024-row aggregate yields each bucket's cumulative offset, and
  * the midrank is `offset(bucket) + within-bucket cumulative` over a window
  * PARTITIONED by bucket — the [[graft.textops.Curation.globalShuffle]] numbering
  * pattern applied to ranks. Sums stay exact: midranks are half-integers and the
  * positive/total counts integers, so every accumulated term is an exact binary
  * fraction and the result is partitioning-invariant bit-for-bit.
  */
object Evaluation {

  /** One-row ROC-AUC + Brier evaluation of probability `score` against 0/1 `label`.
    *
    * Output columns: `auc` (ties get midranks, the trapezoidal ROC area),
    * `brier_e6` (Σ round((p−y)²·1e6) / n — per-row scaled-integer rounding makes
    * the sum an exact integer, so the mean is engine- and order-invariant),
    * `n_pos`, `n_neg`.
    *
    * `score` must lie in [0,1] (probabilities) — the bucket map is `floor(s·1024)`.
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val y = label.cast("double")
    val scored = df.select(score.cast("double").as("s"), y.as("y"))
    // per-distinct-score groups: cnt, positives, and the exact scaled Brier sum
    val groups = scored
      .groupBy("s")
      .agg(
        count(lit(1)).cast("double").as("cnt"),
        sum(col("y")).as("pos"),
        sum(round((col("s") - col("y")) * (col("s") - col("y")) * 1e6)
          .cast("long")).as("bsum"))
    rocAucFromCounts(groups)
  }

  /** The same evaluation computed from pre-aggregated per-distinct-score groups
    * `(s, cnt, pos, bsum)` — the shape a STREAMING aggregation maintains (see
    * `StreamOps.streamingAucBins`), so a live monitor derives AUC/Brier from its
    * bounded state table without revisiting the feed. `bsum` is the per-group sum
    * of `round((s−y)²·1e6)` as a long (from counts of a rounded score:
    * `pos·round((s−1)²·1e6) + (cnt−pos)·round(s²·1e6)`).
    */
  def rocAucFromCounts(groups0: DataFrame): DataFrame = {
    // normalize numeric types here so callers can pass the natural long-typed
    // counts a count aggregate produces (streamingAucBins state, ad-hoc groupBys),
    // then re-collapse by s: the midrank math below requires ONE row per distinct
    // score, and duplicate-s rows would get per-row instead of per-tie-group
    // midranks. The collapse SUMS, so duplicate rows must be DISJOINT count
    // contributions (per-partition partials, per-day deltas) — a union of
    // CUMULATIVE snapshots of the same state must be collapsed by the caller
    // (max per s, as streamingAucBins does) before calling. A no-op on
    // conforming one-row-per-s input.
    val groups = groups0
      .select(col("s").cast("double").as("s"), col("cnt").cast("double").as("cnt"),
        col("pos").cast("double").as("pos"), col("bsum").cast("long").as("bsum"))
      .groupBy("s")
      .agg(sum("cnt").as("cnt"), sum("pos").as("pos"), sum("bsum").as("bsum"))
      .withColumn("_bucket",
        least(floor(col("s") * 1024), lit(1023.0)).cast("int"))
    // bounded: ≤1024 rows; cumulative count strictly below each bucket
    val counts = groups.groupBy("_bucket").agg(sum("cnt").as("n"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0.0) { case (acc, (_, n)) => acc + n })
      .toMap
    val w = Window.partitionBy("_bucket").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offset = coalesce(element_at(typedLit(offsets), col("_bucket")), lit(0.0))
    val ranked = groups
      .withColumn("cum_before", offset + coalesce(sum("cnt").over(w), lit(0.0)))
      // midrank of every row in this tie group (1-based): exact half-integer
      .withColumn("avg_rank", col("cum_before") + (col("cnt") + 1.0) / 2.0)
    ranked
      .agg(
        sum("pos").as("np"),
        sum(col("cnt") - col("pos")).as("nn"),
        sum(col("pos") * col("avg_rank")).as("rank_pos"),
        sum("bsum").as("bsum"),
        sum("cnt").as("n"))
      .select(
        // fail loudly on single-class input (the module's convention — psiFromBins
        // requires both sides non-empty): a silent null auc reads as a missing
        // metric downstream
        when(col("np") === 0 || col("nn") === 0, raise_error(lit(
          "rocAuc: input must contain both classes (n_pos > 0 and n_neg > 0)")))
          .otherwise((col("rank_pos") - col("np") * (col("np") + 1.0) / 2.0) /
            (col("np") * col("nn"))).as("auc"),
        (col("bsum") / 1e6 / col("n")).as("brier_e6"),
        col("np").cast("long").as("n_pos"),
        col("nn").cast("long").as("n_neg"))
  }

  /** Population Stability Index between a baseline and a current score
    * distribution — the standard production drift monitor (PSI < 0.1 stable,
    * 0.1–0.25 moderate shift, > 0.25 investigate): per decile bin b,
    * `psi_b = (p_cur − p_base) · ln(p_cur / p_base)` with shares clamped at
    * `minShare` so bins empty on one side contribute a large-but-finite term.
    *
    * Returns one row per occupied bin (bin, share_base, share_cur, psi) plus a
    * `bin = -1` summary row carrying the total PSI. Scores must lie in [0,1]
    * (same decile map as [[calibrationBins]]); feed a score ROUNDED to a fixed
    * scale so binning cannot straddle a sub-ulp engine difference.
    *
    * Scale shape: each side collapses to a ≤`nBins`-row hash aggregate before
    * anything joins — the full-outer bin join and the share/total windows all run
    * over that bounded table, so the corpus is touched exactly twice (once per
    * side), embarrassingly parallel.
    */
  /** Two-sample Kolmogorov–Smirnov distance between EVERY pair of groups over a
    * fixed equal-width bin grid — the max-deviation complement to [[psiDrift]]'s
    * weighted-sum statistic (KS localizes WHERE two score distributions diverge
    * and is insensitive to the clamp constant PSI needs for empty bins). For each
    * group pair (a, b): `D = max over bin right-edges of |ECDF_a − ECDF_b|`, with
    * `ks_at` the smallest right-edge attaining it. Exact KS needs a global sort;
    * the grid form (resolution `(hi−lo)/bins`, a lower bound on exact D) is the
    * scale path — ONE row-scale histogram aggregation, then every window/join
    * runs on the bounded `groups × bins` table. Values clamp into the edge bins;
    * nulls are dropped. ECDF arithmetic is integer-count ratios, so the statistic
    * is bit-deterministic across engines and partitionings.
    *
    * @return (group_a, group_b, n_a, n_b, ks_d, ks_at), group_a < group_b
    */
  def ksDrift(
      df: DataFrame,
      value: Column,
      group: Column,
      bins: Int = 100,
      lo: Double = 0.0,
      hi: Double = 1.0): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(hi > lo, s"hi ($hi) must exceed lo ($lo)")
    val width = (hi - lo) / bins
    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.select(group.cast("string").as("g"), value.cast("double").as("s"))
      .filter(col("g").isNotNull && col("s").isNotNull)
      .groupBy(col("g"),
        least(greatest(floor((col("s") - lit(lo)) / lit(width)), lit(0)), lit(bins - 1))
          .cast("int").as("bin"))
      .agg(count(lit(1)).as("n"))
    // densify: a bin empty in one group still carries that group's running ECDF
    val grid = hist.select("g").distinct()
      .crossJoin(broadcast((0 until bins).toDF("bin")))
    val wc = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val ecdf = grid.join(hist, Seq("g", "bin"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("cum", sum("n").over(wc))
      .withColumn("tot", sum("n").over(Window.partitionBy("g")))
      .withColumn("ecdf", col("cum") / col("tot"))
    val a = ecdf.select(col("g").as("group_a"), col("bin"),
      col("ecdf").as("fa"), col("tot").as("n_a"))
    val b = ecdf.select(col("g").as("group_b"), col("bin"),
      col("ecdf").as("fb"), col("tot").as("n_b"))
    a.join(b, Seq("bin")).filter(col("group_a") < col("group_b"))
      .withColumn("diff", abs(col("fa") - col("fb")))
      .groupBy("group_a", "group_b", "n_a", "n_b")
      // argmax bin via struct ordering: max diff, tie -> smallest bin (-bin max)
      .agg(round(max(col("diff")), 6).as("ks_d"),
        max(struct(col("diff"), (-col("bin")).as("nb"))).as("_am"))
      .withColumn("ks_at",
        round(lit(lo) + (-col("_am.nb") + 1) * lit(width), 6))
      .select("group_a", "group_b", "n_a", "n_b", "ks_d", "ks_at")
  }

  def psiDrift(
      base: DataFrame,
      current: DataFrame,
      score: Column,
      nBins: Int = 10,
      minShare: Double = 1e-6): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    def binned(df: DataFrame, name: String) =
      df.select(score.cast("double").as("s"))
        .groupBy(least(floor(col("s") * nBins), lit(nBins - 1.0)).cast("int").as("bin"))
        .agg(count(lit(1)).cast("double").as(name))
    psiFromBins(binned(base, "n_base"), binned(current, "n_cur"), minShare)
  }

  /** [[psiDrift]] from pre-aggregated per-bin counts `(bin, n_base)` /
    * `(bin, n_cur)` — the shape a STREAMING aggregation maintains (see
    * `StreamOps.streamingScoreDecileBins`), so a live drift alarm compares its
    * bounded state table against a static baseline without revisiting the feed.
    */
  def psiFromBins(
      baseBins: DataFrame,
      curBins: DataFrame,
      minShare: Double = 1e-6): DataFrame = {
    val j = baseBins.join(curBins, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0.0)).as("n_base"),
        coalesce(col("n_cur"), lit(0.0)).as("n_cur"))
    // side totals via one bounded 1-row collect (the bin table is ≤nBins rows;
    // a constant-partition window here would be equivalent but plans noisier)
    val tot = j.agg(sum("n_base"), sum("n_cur")).first()
    require(!tot.isNullAt(0) && tot.getDouble(0) > 0 && tot.getDouble(1) > 0,
      "psiFromBins: both sides need at least one scored row")
    def clamp(c: Column) = greatest(c, lit(minShare))
    val perBin = j
      .withColumn("share_base", col("n_base") / lit(tot.getDouble(0)))
      .withColumn("share_cur", col("n_cur") / lit(tot.getDouble(1)))
      .withColumn("psi",
        (clamp(col("share_cur")) - clamp(col("share_base"))) *
          log(clamp(col("share_cur")) / clamp(col("share_base"))))
      .select("bin", "share_base", "share_cur", "psi")
    perBin.unionByName(
      perBin.agg(sum("psi").as("psi"))
        .select(lit(-1).as("bin"), lit(1.0).as("share_base"),
          lit(1.0).as("share_cur"), col("psi")))
  }

  /** Reliability-diagram bins: per decile of predicted probability, the support,
    * the mean prediction (exact scaled-integer sum, same determinism argument as
    * the Brier term) and the observed positive rate. A calibrated model has
    * `mean_p ≈ frac_pos` in every bin; systematic gaps are what temperature
    * scaling / recalibration would fix before the model gates a corpus.
    */
  def calibrationBins(df: DataFrame, score: Column, label: Column): DataFrame =
    df.select(score.cast("double").as("s"), label.cast("double").as("y"))
      .groupBy(least(floor(col("s") * 10), lit(9.0)).cast("int").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("y")).cast("long").as("n_pos"),
        sum(round(col("s") * 1e6).cast("long")).as("psum"))
      .select(
        col("bin"), col("n"), col("n_pos"),
        (col("psum") / 1e6 / col("n")).as("mean_p"),
        (col("n_pos").cast("double") / col("n")).as("frac_pos"))

  /** Precision-recall curve of a probability score at `bins` evenly spaced
    * thresholds t_k = k/bins, k = 1..bins — the operating-point picker next to
    * [[rocAuc]]'s single summary number.
    *
    * Scale design: rows collapse to ≤ bins+1 score buckets in ONE map-side-
    * combined aggregation (`b = min(floor(p·bins), bins)`; `p ≥ k/bins ⟺ b ≥ k`,
    * exact because both engines compute the same double product); each bounded
    * bucket row then explodes to the thresholds it satisfies and a second
    * bounded aggregation yields TP/PP per threshold — no per-row threshold
    * fan-out, no windows, no theta join. The positive total rides a 1-row
    * broadcast. `precision` is NULL where nothing is predicted positive.
    *
    * Output: `(threshold, predicted_pos, tp, precision, recall, f1)`, one row
    * per k (thresholds above every score report zeros/NULL).
    */
  def prCurve(df: DataFrame, score: Column, label: Column, bins: Int = 20): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val spark = df.sparkSession
    val bucketed = df
      .select(least(floor(score.cast("double") * bins), lit(bins)).cast("int").as("b"),
        label.cast("double").as("y"))
      .groupBy("b")
      .agg(count(lit(1)).as("n"), sum("y").cast("long").as("n_pos"))
    val totals = bucketed.agg(sum("n_pos").as("total_pos"))
    val perK = bucketed
      .filter(col("b") >= 1)
      .select(explode(sequence(lit(1), least(col("b"), lit(bins)))).as("k"),
        col("n"), col("n_pos"))
      .groupBy("k")
      .agg(sum("n").as("pp"), sum("n_pos").as("tp"))
    val grid = spark.range(1, bins + 1).select(col("id").cast("int").as("k"))
    val joined = grid
      .join(perK, Seq("k"), "left")
      .crossJoin(broadcast(totals))
      .select(col("k"), coalesce(col("pp"), lit(0L)).as("pp"),
        coalesce(col("tp"), lit(0L)).as("tp"), col("total_pos"))
    joined
      .withColumn("precision",
        when(col("pp") === 0, lit(null).cast("double"))
          .otherwise(col("tp").cast("double") / col("pp")))
      .withColumn("recall",
        when(col("total_pos") === 0, lit(0.0))
          .otherwise(col("tp").cast("double") / col("total_pos")))
      .withColumn("f1",
        when(coalesce(col("precision"), lit(0.0)) + col("recall") === 0, lit(0.0))
          .otherwise(lit(2.0) * coalesce(col("precision"), lit(0.0)) * col("recall") /
            (coalesce(col("precision"), lit(0.0)) + col("recall"))))
      .select((col("k").cast("double") / bins).as("threshold"),
        col("pp").as("predicted_pos"), col("tp"),
        col("precision"), col("recall"), col("f1"))
  }

  /** Unbiased pass@k over sampled generations (Chen et al. 2021, "Evaluating LLMs
    * Trained on Code", eq. 1): per task with n samples and c passes,
    * pass@k = 1 − C(n−c, k)/C(n, k), computed in the numerically stable product
    * form 1 − Π_{j=0..k−1} (n−c−j)/(n−j). One hash aggregation per task, then a
    * fixed k-factor closed-form column per requested k (NULL where n < k — the
    * estimator needs at least k samples).
    */
  def passAtK(
      df: DataFrame,
      taskCol: Column,
      passedCol: Column,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be positive, got $ks")
    val counts = df
      .groupBy(taskCol.as("task"))
      .agg(count(lit(1)).as("n"),
        sum(passedCol.cast("int")).cast("long").as("c"))
    ks.foldLeft(counts) { (acc, k) =>
      // Π in fixed ascending-j order — the oracle multiplies in the same order
      val prod = (0 until k).map { j =>
        (col("n") - col("c") - lit(j)).cast("double") / (col("n") - lit(j))
      }.reduce(_ * _)
      acc.withColumn(s"pass_at_$k",
        when(col("n") < k, lit(null).cast("double"))
          .when(col("n") - col("c") < k, lit(1.0))
          .otherwise(lit(1.0) - prod))
    }
  }

  /** Majority-vote (self-consistency) answer selection (Wang et al. 2023): per
    * task, the modal answer over sampled generations with deterministic
    * lexicographic tie-break, plus the agreement share — ONE lexicographic
    * struct-MIN argmax over the (task, answer) count table, the
    * `mutualBestPairs`/LPA pattern (no sort window, no join-back).
    */
  def majorityVote(df: DataFrame, taskCol: Column, answerCol: Column): DataFrame =
    df.select(taskCol.as("task"), answerCol.cast("string").as("answer"))
      .groupBy("task", "answer").agg(count(lit(1)).as("votes"))
      .groupBy("task")
      .agg(
        min(struct((-col("votes")).as("negV"), col("answer"))).as("best"),
        sum("votes").as("n"))
      .select(col("task"), col("best.answer").as("answer"),
        (-col("best.negV")).cast("long").as("votes"), col("n"))
      .withColumn("agreement", col("votes").cast("double") / col("n"))
}
