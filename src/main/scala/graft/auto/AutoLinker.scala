package graft.auto

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.blocking.{BlockingRule, RuleGen}
import graft.clean.Cleaning
import graft.cluster.ConnectedComponents
import graft.metrics.EntropyMetrics
import graft.model.{ComparisonSpec, TrainedModel}
import graft.score.FellegiSunter
import graft.train.Estimation

/** Y16 + EP1 — the unsupervised auto-linking search loop (reference:
  * AutoLinker.auto_link, autolinker.py:688-847).
  *
  * Differences from the reference, by design:
  *   - seeded random search instead of Hyperopt TPE (the reference only seeds Hyperopt;
  *     we thread one seed through sampling, bucketing and the search so runs reproduce);
  *   - no metastore temp tables to GC (Y15) — intermediates are DataFrames;
  *   - run log returned as a DataFrame instead of MLflow calls (Y19).
  *
  * Search space matches autolinker.py:345-365: per column one of
  * levenshtein threshold ∈ {1..5}, jaccard ∈ [0.7,0.99], jaro_winkler ∈ [0.7,0.99];
  * blocking rule drawn from the generated candidates (Y3) filtered by
  * `comparison_size_limit`.
  */
object AutoLinker {

  case class Trial(
      model: TrainedModel,
      metric: Double,
      blockingRule: String)

  case class Result(
      best: Trial,
      clusters: DataFrame,
      predictions: DataFrame,
      trials: Seq[Trial])

  def autoLink(
      data: DataFrame,
      uidCol: String = "unique_id",
      attributeColumns: Option[Seq[String]] = None,
      maxEvals: Int = 5,
      seed: Long = 42L,
      comparisonSizeLimit: Long = 100000L,
      clusterThreshold: Double = 0.8,
      cleaningMode: String = "all",
      ruleCombinationSize: Int = 1,
      maxOrSize: Int = 2): Result = {

    val rnd = new Random(seed)
    val withId = Cleaning.withUniqueId(data, uidCol)
    val attrs = attributeColumns.getOrElse(
      withId.columns.filterNot(_ == uidCol).toSeq)
    val stringified = withId.select(
      (col(uidCol).cast("string").as(uidCol) +:
        attrs.map(c => col(c).cast("string").as(c))): _*)
    val cleaned = Cleaning.cleanColumns(stringified, attrs, cleaningMode).cache()
    val n = cleaned.count()

    // Y3 — candidate blocking rules from a ≤10k sample, filtered by estimated cost
    val sample =
      if (n > 10000) cleaned.sample(withReplacement = false, 10000.0 / n, seed)
      else cleaned
    val candidates = RuleGen
      .generateBlockingRules(sample, ruleCombinationSize, maxOrSize, attrs, seed)
      .cache()
    val accepted = candidates
      .filter(col("rule_squared_count") < comparisonSizeLimit)
      .select("splink_rule")
      .collect().map(_.getString(0)).toSeq
    val ruleChoices =
      if (accepted.nonEmpty) accepted
      // robustness fallback (the reference would raise): single-column rules
      else attrs.map(c => s"l.$c = r.$c")

    val adjustedBase = EntropyMetrics.maxDistinct(cleaned, attrs).toInt

    var best: Option[(Trial, DataFrame, DataFrame)] = None
    val trials = (1 to maxEvals).map { _ =>
      val specs = attrs.map { c =>
        rnd.nextInt(3) match {
          case 0 => ComparisonSpec(c, "levenshtein", 1 + rnd.nextInt(5).toDouble)
          case 1 => ComparisonSpec(c, "jaccard", 0.7 + rnd.nextDouble() * 0.29)
          case _ => ComparisonSpec(c, "jaro_winkler", 0.7 + rnd.nextDouble() * 0.29)
        }
      }
      val rule = ruleChoices(rnd.nextInt(ruleChoices.size))
      // Y6 — training rules from 3 random columns, paired
      val tcols = rnd.shuffle(attrs.toList).take(3)
      val trainingRules =
        if (tcols.size < 2) Seq(attrs.map(c => s"l.$c = r.$c").mkString(" AND "))
        else tcols.combinations(2).map(p => s"${p(0)}&${p(1)}").toSeq

      val model = Estimation.train(cleaned, uidCol, specs, Seq(rule), trainingRules,
        uTargetPairs = math.min(n * 4, 100000L))
      val predictions = FellegiSunter.predict(cleaned, uidCol, model)
      val edges = predictions
        .filter(col("match_probability") >= clusterThreshold)
        .select(col("uid_l").as("src"), col("uid_r").as("dst"))
      val clusters = ConnectedComponents.assignClusters(cleaned, uidCol, edges)
      val metric = EntropyMetrics.informationGainPowerRatio(clusters, attrs, adjustedBase)
      val trial = Trial(model, metric, rule)
      if (best.isEmpty || metric > best.get._1.metric)
        best = Some((trial, clusters, predictions))
      trial
    }

    candidates.unpersist()
    val (b, clusters, predictions) = best.get
    Result(b, clusters, predictions, trials)
  }
}
