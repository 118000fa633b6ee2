package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Y17 — supervised confusion metrics for pairwise predictions against a ground-truth
  * entity label (reference: autolinker.py:1151-1232).
  *
  * Definitions (matching the reference exactly):
  *   RR = #undirected pairs of records sharing a true label
  *   PR = #undirected predicted pairs with probability > threshold
  *   TP = predicted pairs whose two records share the true label
  *   FP = predicted pairs whose records differ on the true label
  *   precision = TP/PR, recall = TP/RR, f1 = harmonic mean, jaccard = TP/(PR+FP)
  */
object PairwiseMetrics {

  /** Joins predictions back to the truth labels (reference get_scores_df). */
  def scores(
      data: DataFrame,
      predictions: DataFrame,
      uid: String,
      trueLabel: String): DataFrame = {
    val left = data.select(col(uid).cast("string").as("uid_l"),
      col(trueLabel).as("true_label"))
    val right = data.select(col(uid).cast("string").as("uid_r"),
      col(trueLabel).as("score_label"))
    predictions
      .select(col("match_probability").as("probability"), col("uid_l"), col("uid_r"))
      .join(left, Seq("uid_l"))
      .join(right, Seq("uid_r"))
  }

  def relevantRecordsCount(data: DataFrame, uid: String, trueLabel: String): Long = {
    // equivalent to the reference's self-join + distinct-sorted-pair count
    // (autolinker.py:1164-1177) in closed form: Σ_labels C(n,2) — no quadratic join
    val row = data.groupBy(col(trueLabel)).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") * (col("n") - 1) / 2), lit(0L)).cast("long"))
      .collect()(0)
    row.getLong(0)
  }

  /** Full confusion metric set at one threshold, as a 1-row DataFrame.
    *
    * @param assumeUniquePairs skip the distinct-sorted-pair shuffle when the caller
    *        guarantees one row per undirected pair (true for this engine's predict
    *        output, which enforces uid_l < uid_r and dedups across rules) — PR is then
    *        a plain count. Semantics identical; the reference always pays the distinct.
    */
  def confusionMetrics(
      data: DataFrame,
      predictions: DataFrame,
      threshold: Double,
      uid: String,
      trueLabel: String,
      assumeUniquePairs: Boolean = false): DataFrame = {
    val spark = data.sparkSession
    import spark.implicits._
    // threshold first, labels after: only above-threshold pairs pay the label joins
    // (the reference joins labels to every prediction before calibrating)
    val left = data.select(col(uid).cast("string").as("uid_l"),
      col(trueLabel).as("true_label"))
    val right = data.select(col(uid).cast("string").as("uid_r"),
      col(trueLabel).as("score_label"))
    val cal = predictions
      .select(col("match_probability").as("probability"), col("uid_l"), col("uid_r"))
      .filter(col("probability") > threshold)
      .join(left, Seq("uid_l"))
      .join(right, Seq("uid_r"))
    val rr = relevantRecordsCount(data, uid, trueLabel)
    val (tp, fp, pr) =
      if (assumeUniquePairs) {
        // one row per undirected pair ⇒ PR is the row count — tp/fp/pr in ONE job
        val agg = cal.agg(
          sum(when(col("true_label") === col("score_label"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("true_label") =!= col("score_label"), 1L).otherwise(0L)).as("fp"),
          count(lit(1)).as("pr"))
          .collect()(0)
        (if (agg.isNullAt(0)) 0L else agg.getLong(0),
          if (agg.isNullAt(1)) 0L else agg.getLong(1),
          agg.getLong(2))
      } else {
        val cached = cal.cache()
        try {
          val agg = cached.agg(
            sum(when(col("true_label") === col("score_label"), 1L).otherwise(0L)).as("tp"),
            sum(when(col("true_label") =!= col("score_label"), 1L).otherwise(0L)).as("fp"))
            .collect()(0)
          (if (agg.isNullAt(0)) 0L else agg.getLong(0),
            if (agg.isNullAt(1)) 0L else agg.getLong(1),
            cached.select(array_sort(array(col("uid_l"), col("uid_r"))).as("pairs"))
              .distinct().count())
        } finally cached.unpersist()
      }
    val precision = if (pr > 0) tp.toDouble / pr else 0.0
    val recall = if (rr > 0) tp.toDouble / rr else 0.0
    val f1 = if (precision + recall > 0) 2 * precision * recall / (precision + recall) else 0.0
    val jaccard = if (pr + fp > 0) tp.toDouble / (pr + fp) else 0.0
    Seq((threshold, tp, fp, pr, rr, precision, recall, f1, jaccard))
      .toDF("threshold", "tp", "fp", "pr", "rr", "precision", "recall", "f1_score", "jaccard")
  }
}
