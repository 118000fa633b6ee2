package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inter-annotator agreement over a long-format label table
  * (item, rater, category) — the label-quality gate of a supervised or
  * RLHF-style data pipeline: before training on human labels, measure whether
  * the raters agree beyond chance.
  *
  * Cohen's κ (Cohen 1960) for one rater pair; Fleiss' κ (Fleiss 1971) for the
  * full panel. Both are closed-form ratios of hash aggregations — no windows, no
  * iteration; the per-category marginals are tiny (≤ #categories rows) and ride
  * broadcast joins, so the only wide shuffles are the initial per-item/
  * per-category counts. Scales to billions of labels.
  */
object Agreement {

  /** Cohen's κ between raters `raterA` and `raterB` over items both rated.
    * Output (1 row): (n_items, percent_agreement, cohens_kappa), rounded to 6.
    */
  def cohensKappa(df: DataFrame, item: Column, rater: Column, category: Column,
      raterA: String, raterB: String): DataFrame = {
    val a = df.filter(rater === raterA).select(item.as("item"), category.as("ca"))
    val b = df.filter(rater === raterB).select(item.as("item"), category.as("cb"))
    val both = a.join(b, Seq("item"))
    // one pass for n + observed agreement; marginal product for chance agreement
    val obs = both.agg(count(lit(1)).as("n"),
      sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("n_agree"))
    val chance = both.groupBy("ca").agg(count(lit(1)).as("na"))
      .join(both.groupBy("cb").agg(count(lit(1)).as("nb")),
        col("ca") === col("cb"), "full")
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("prod_sum"))
    // κ's denominator 1 − p_e is 0 exactly when prod_sum = n² (both raters
    // constant with one shared category): κ is undefined there — fail loudly
    // instead of emitting null/NaN (repo convention, cf. rocAuc)
    obs.crossJoin(chance).select(
      col("n").as("n_items"),
      round(col("n_agree").cast("double") / col("n"), 6).as("percent_agreement"),
      when(col("prod_sum") === col("n") * col("n"), raise_error(lit(
        "cohensKappa: chance agreement p_e = 1 (both raters constant with one " +
          "shared category) — kappa is undefined")))
        .otherwise(round((col("n_agree").cast("double") / col("n") -
            col("prod_sum").cast("double") / (col("n") * col("n"))) /
          (lit(1.0) - col("prod_sum").cast("double") / (col("n") * col("n"))), 6))
        .as("cohens_kappa"))
  }

  /** Fleiss' κ over the complete panel: only items rated by EVERY rater enter
    * (the classic formulation assumes a complete design; partial items are
    * dropped, loudly countable from n_items vs the input).
    * Output (1 row): (n_items, n_raters, p_bar, p_e, fleiss_kappa), rounded to 6.
    */
  def fleissKappa(df: DataFrame, item: Column, rater: Column, category: Column): DataFrame = {
    import graft.util.Caching.CacheSyntax
    val labels = df.select(item.as("item"), rater.as("rater"), category.as("cat"))
      .scopedPersist()
    val m = labels.select(countDistinct(col("rater")).as("m"))
    // complete items only: exactly one label per rater
    val complete = labels.groupBy("item")
      .agg(countDistinct(col("rater")).as("nr"), count(lit(1)).as("nl"))
      .join(broadcast(m), col("nr") === col("m") && col("nl") === col("m"))
      .select("item")
    val cell = labels.join(complete, Seq("item"))
      .groupBy("item", "cat").agg(count(lit(1)).as("nij"))
      .scopedPersist()
    // P_i = (Σ_j n_ij² − m) / (m(m−1)); P̄ = mean over items
    val pbar = cell.groupBy("item").agg(sum(col("nij") * col("nij")).as("sq"))
      .crossJoin(broadcast(m))
      .agg(count(lit(1)).as("n_items"), first(col("m")).as("m"),
        avg((col("sq") - col("m")).cast("double") /
          (col("m") * (col("m") - 1))).as("p_bar"))
    // p_j = Σ_i n_ij / (N·m); P̄_e = Σ_j p_j²
    val pe = cell.groupBy("cat").agg(sum("nij").as("nj"))
      .agg(sum(col("nj")).as("total"),
        sum(col("nj").cast("double") * col("nj")).as("sq_sum"))
      .select((col("sq_sum") / (col("total") * col("total"))).as("p_e"))
    // same degenerate-denominator guard as cohensKappa: p_e = 1 iff every rater
    // used a single shared category, where κ is undefined — fail loudly
    pbar.crossJoin(pe).select(
      col("n_items"), col("m").as("n_raters"),
      round(col("p_bar"), 6).as("p_bar"), round(col("p_e"), 6).as("p_e"),
      when(col("p_e") >= 1.0, raise_error(lit(
        "fleissKappa: chance agreement p_e = 1 (every rater constant with one " +
          "shared category) — kappa is undefined")))
        .otherwise(round((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")), 6))
        .as("fleiss_kappa"))
  }
}
