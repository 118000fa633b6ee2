package graft.auto

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.blocking.RuleGen
import graft.clean.Cleaning
import graft.cluster.ConnectedComponents
import graft.metrics.{ClusteringMetrics, EntropyMetrics, PairwiseMetrics}
import graft.model.{ComparisonSpec, TrainedModel}
import graft.schemamatch.SchemaMatch
import graft.score.FellegiSunter
import graft.train.Estimation

/** Y16 + EP1 — the unsupervised auto-linking search loop (reference:
  * AutoLinker.auto_link, autolinker.py:688-847), in dedupe mode ([[autoLink]]) and
  * two-table link mode ([[autoLinkTables]], reference autolinker.py:688-707,961-1020:
  * schema-match the columns, align, then block/train/predict across the tables only).
  *
  * Differences from the reference, by design:
  *   - the default search is a NATIVE tree-structured Parzen estimator ([[Tpe]]),
  *     the same algorithm the reference delegates to Hyperopt — after a uniform
  *     warmup, good/bad Parzen densities over every dimension score a candidate
  *     batch by the l/g expected-improvement ratio — with one seeded RNG threaded
  *     through sampling, bucketing and the search so runs reproduce
  *     (`searchStrategy = "adaptive"` keeps the earlier perturb-the-top-quartile
  *     TPE-lite; `"random"` recovers pure random search);
  *   - no metastore temp tables to GC (Y15) — intermediates are DataFrames;
  *   - run log returned as a DataFrame instead of MLflow calls (Y19).
  *
  * When `trueLabelCol` is given, every trial also computes the supervised confusion
  * and clustering metrics against it (reference autolinker.py:591-621), recorded on
  * [[Trial.supervised]].
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
      blockingRule: String,
      supervised: Map[String, Double] = Map.empty)

  case class Result(
      best: Trial,
      clusters: DataFrame,
      predictions: DataFrame,
      trials: Seq[Trial]) {

    /** EP3 — re-cluster the retained predictions at an arbitrary threshold without
      * re-training or re-predicting (reference: `best_clusters_at_threshold`,
      * autolinker.py:1069-1094): filter the scored pairs, run connected components,
      * re-attach to the records carried in `clusters` (minus their old assignment).
      */
    def clustersAtThreshold(uidCol: String, threshold: Double): DataFrame = {
      // predictions carry the pipeline's canonical pair columns uid_l/uid_r
      // (the same ones the search loop clusters on), whatever the caller's uid name
      val edges = predictions
        .filter(org.apache.spark.sql.functions.col("match_probability") >= threshold)
        .select(org.apache.spark.sql.functions.col("uid_l").as("src"),
          org.apache.spark.sql.functions.col("uid_r").as("dst"))
      graft.cluster.ConnectedComponents.assignClusters(
        clusters.drop("cluster_id"), uidCol, edges)
    }
  }

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
      maxOrSize: Int = 2,
      trueLabelCol: Option[String] = None,
      searchStrategy: String = "tpe",
      candidateRuleOverride: Option[Seq[String]] = None,
      uDeterministicOrder: Boolean = false): Result = {

    val rnd = new Random(seed)
    val withId = Cleaning.withUniqueId(data, uidCol)
    val attrs = attributeColumns.getOrElse(
      withId.columns.filterNot(c => c == uidCol || trueLabelCol.contains(c)).toSeq)
    val stringified = withId.select(
      (col(uidCol).cast("string").as(uidCol) +:
        attrs.map(c => col(c).cast("string").as(c))) ++
        trueLabelCol.map(c => col(c).cast("string").as(c)).toSeq: _*)
    // spread the cached records over the cluster BEFORE anything joins them: the
    // loop's pair joins are EXPANSION joins (tiny inputs, large pair output, the
    // gamma ladder pipelined into the join stage) and the planner broadcasts one
    // side — so join parallelism IS the stream side's partitioning, which for a
    // single-file source is ONE task grinding every trial's expansion (measured
    // 6.6 s single-task jobs inside ep1_auto_link at sf0.1). Round-robin is
    // deterministic (sort-before-repartition) and the loop's aggregates are
    // count-based (patterns, entropies), so results are partition-layout-proof.
    // Conditional (r12): a naturally wide scan skips the shuffle entirely.
    val cleaned = graft.util.Partitioning
      .spreadNarrowScan(Cleaning.cleanColumns(stringified, attrs, cleaningMode))
      .cache()
    val n = cleaned.count()

    val ruleChoices = candidateRuleOverride.getOrElse(
      candidateRules(cleaned, n, attrs, ruleCombinationSize, maxOrSize,
        comparisonSizeLimit, seed))
    val adjustedBase = EntropyMetrics.maxDistinct(cleaned, attrs).toInt

    runSearch(cleaned, None, cleaned, uidCol, attrs, ruleChoices, adjustedBase,
      maxEvals, rnd, searchStrategy, clusterThreshold,
      uTargetPairs = math.min(n * 4, 100000L), trueLabelCol, uDeterministicOrder,
      nRows = n)
  }

  /** Link-mode end-to-end: recover the left↔right column correspondence (Y10), align
    * the right table to the left's names, then search/train/predict over CROSS-table
    * pairs only and cluster the union. Uids are prefixed `l-`/`r-` so the two tables
    * cannot collide in the cluster space.
    */
  def autoLinkTables(
      left: DataFrame,
      right: DataFrame,
      uidCol: String = "unique_id",
      leftAttributes: Option[Seq[String]] = None,
      rightAttributes: Option[Seq[String]] = None,
      maxEvals: Int = 5,
      seed: Long = 42L,
      comparisonSizeLimit: Long = 100000L,
      clusterThreshold: Double = 0.8,
      cleaningMode: String = "all",
      ruleCombinationSize: Int = 1,
      maxOrSize: Int = 2,
      trueLabelCol: Option[String] = None,
      searchStrategy: String = "tpe",
      candidateRuleOverride: Option[Seq[String]] = None,
      uDeterministicOrder: Boolean = false,
      mappingOverride: Option[Seq[(String, String, Long)]] = None): Result = {

    val rnd = new Random(seed)
    val lAttrs = leftAttributes.getOrElse(
      left.columns.filterNot(c => c == uidCol || trueLabelCol.contains(c)).toSeq)
    val rAttrs = rightAttributes.getOrElse(
      right.columns.filterNot(c => c == uidCol || trueLabelCol.contains(c)).toSeq)

    // Y10 — recover the column correspondence, keep left's names for the mapped
    // pairs. A caller that already computed the same greedy mapping (the oracle
    // query renders it into every row) passes it through instead of re-running
    // the unpivot/value-join/collect pass.
    val mapping = mappingOverride.getOrElse(
      SchemaMatch.greedyMapping(left, right, lAttrs, rAttrs))
    require(mapping.nonEmpty, "autoLinkTables: no column correspondence found")
    val attrs = mapping.map(_._1)

    def prep(df: DataFrame, tag: String, sel: Seq[(String, String)]) =
      df.select((concat(lit(tag), col(uidCol).cast("string")).as(uidCol) +:
        sel.map { case (out, in) => col(in).cast("string").as(out) }) ++
        trueLabelCol.map(c => col(c).cast("string").as(c)).toSeq: _*)
    val lSel = prep(Cleaning.withUniqueId(left, uidCol), "l-", attrs.map(a => a -> a))
    val rSel = prep(Cleaning.withUniqueId(right, uidCol), "r-",
      mapping.map { case (lc, rc, _) => lc -> rc })
    // same expansion-join parallelism reasoning as autoLink's spread above
    val cleanedL = graft.util.Partitioning
      .spreadNarrowScan(Cleaning.cleanColumns(lSel, attrs, cleaningMode)).cache()
    val cleanedR = graft.util.Partitioning
      .spreadNarrowScan(Cleaning.cleanColumns(rSel, attrs, cleaningMode)).cache()
    val union = cleanedL.unionByName(cleanedR).cache()
    val n = union.count()

    val ruleChoices = candidateRuleOverride.getOrElse(
      candidateRules(union, n, attrs, ruleCombinationSize, maxOrSize,
        comparisonSizeLimit, seed))
    val adjustedBase = EntropyMetrics.maxDistinct(union, attrs).toInt

    runSearch(cleanedL, Some(cleanedR), union, uidCol, attrs, ruleChoices, adjustedBase,
      maxEvals, rnd, searchStrategy, clusterThreshold,
      uTargetPairs = math.min(n * 4, 100000L), trueLabelCol, uDeterministicOrder,
      nRows = n)
  }

  /** Y3 — candidate blocking rules from a ≤10k sample, filtered by estimated cost. */
  private def candidateRules(
      df: DataFrame,
      n: Long,
      attrs: Seq[String],
      ruleCombinationSize: Int,
      maxOrSize: Int,
      comparisonSizeLimit: Long,
      seed: Long): Seq[String] = {
    val sample =
      if (n > 10000) df.sample(withReplacement = false, 10000.0 / n, seed)
      else df
    val candidates = RuleGen
      .generateBlockingRules(sample, ruleCombinationSize, maxOrSize, attrs, seed)
      .cache()
    try {
      val accepted = candidates
        .filter(col("rule_squared_count") < comparisonSizeLimit)
        .select("splink_rule")
        .collect().map(_.getString(0)).toSeq
      if (accepted.nonEmpty) accepted
      // robustness fallback (the reference would raise): single-column rules
      else attrs.map(c => s"l.$c = r.$c")
    } finally candidates.unpersist()
  }

  /** One parameter draw. Uniform during warmup or with `searchStrategy = "random"`;
    * `"tpe"` (the default — full Hyperopt-parity [[Tpe]] draw: Parzen good/bad
    * densities + l/g-ratio acquisition over a candidate batch); `"adaptive"` keeps
    * the round-5 TPE-lite (perturb a top-quartile parent with an exploration
    * floor) for comparison runs.
    */
  private def drawParams(
      rnd: Random,
      attrs: Seq[String],
      ruleChoices: Seq[String],
      past: Seq[Trial],
      strategy: String): (Seq[ComparisonSpec], String) = {
    def uniformSpec(c: String): ComparisonSpec = rnd.nextInt(3) match {
      case 0 => ComparisonSpec(c, "levenshtein", 1 + rnd.nextInt(5).toDouble)
      case 1 => ComparisonSpec(c, "jaccard", 0.7 + rnd.nextDouble() * 0.29)
      case _ => ComparisonSpec(c, "jaro_winkler", 0.7 + rnd.nextDouble() * 0.29)
    }
    def uniform(): (Seq[ComparisonSpec], String) =
      (attrs.map(uniformSpec), ruleChoices(rnd.nextInt(ruleChoices.size)))

    val warmup = 3
    if (strategy == "random" || past.size < warmup) uniform()
    else if (strategy == "tpe") {
      // 10% uniform exploration floor: the l/g acquisition is pure exploitation
      // and can permanently avoid a region whose only observations landed in the
      // bad set — the floor bounds that regret (hyperopt gets the same effect
      // from its annealed prior weight)
      if (rnd.nextDouble() < 0.1) uniform() else Tpe.draw(rnd, attrs, ruleChoices, past)
    } else if (strategy != "adaptive") uniform()
    else if (rnd.nextDouble() < 0.3) uniform()
    else {
      val top = past.sortBy(-_.metric).take(math.max(1, past.size / 4 + 1))
      val parent = top(rnd.nextInt(top.size))
      val specs = parent.model.comparisons.map { s =>
        if (rnd.nextDouble() < 0.2) uniformSpec(s.column)
        else s.metric match {
          case "levenshtein" =>
            s.copy(threshold =
              math.max(1.0, math.min(5.0, s.threshold + (rnd.nextInt(3) - 1))))
          case _ =>
            s.copy(threshold =
              math.max(0.7, math.min(0.99, s.threshold + rnd.nextGaussian() * 0.03)))
        }
      }
      val rule =
        if (rnd.nextDouble() < 0.7) parent.blockingRule
        else ruleChoices(rnd.nextInt(ruleChoices.size))
      (specs, rule)
    }
  }

  /** One full trial draw: comparison specs + blocking rule ([[drawParams]]) plus the
    * Y6 training-rule draw (3 random columns, paired). Factored out so the search
    * loop and [[warmupDraws]] consume the SEEDED RNG in exactly the same order.
    */
  private def drawTrial(
      rnd: Random,
      attrs: Seq[String],
      ruleChoices: Seq[String],
      past: Seq[Trial],
      strategy: String): (Seq[ComparisonSpec], String, Seq[String]) = {
    val (specs, rule) = drawParams(rnd, attrs, ruleChoices, past, strategy)
    val tcols = rnd.shuffle(attrs.toList).take(3)
    val trainingRules =
      if (tcols.size < 2) Seq(attrs.map(c => s"l.$c = r.$c").mkString(" AND "))
      else tcols.combinations(2).map(p => s"${p(0)}&${p(1)}").toSeq
    (specs, rule, trainingRules)
  }

  /** Replay the first `nTrials` trial draws of a search with this `seed` WITHOUT any
    * data: during the warmup (the first 3 trials) every strategy draws uniformly, so
    * the (specs, blocking rule, training rules) sequence depends only on the seed,
    * the attribute order, and the candidate-rule list — which makes a ≤3-trial
    * search loop fully renderable as a SQL oracle (the generator embeds the drawn
    * constants; every DATA-dependent quantity — u estimates, EM chains, weights,
    * clusters, metrics — is recomputed by the SQL itself).
    */
  def warmupDraws(
      seed: Long,
      attrs: Seq[String],
      ruleChoices: Seq[String],
      nTrials: Int): Seq[(Seq[ComparisonSpec], String, Seq[String])] = {
    require(nTrials <= 3, s"warmup covers the first 3 trials only, got $nTrials")
    val rnd = new Random(seed)
    (1 to nTrials).map(_ => drawTrial(rnd, attrs, ruleChoices, Seq.empty, "tpe"))
  }

  /** The trial loop shared by dedupe and link mode: draw params → train → predict →
    * cluster → unsupervised metric (+ supervised metrics when a label is given).
    */
  private def runSearch(
      trainDf: DataFrame,
      linkRight: Option[DataFrame],
      clusterBase: DataFrame,
      uidCol: String,
      attrs: Seq[String],
      ruleChoices: Seq[String],
      adjustedBase: Int,
      maxEvals: Int,
      rnd: Random,
      strategy: String,
      clusterThreshold: Double,
      uTargetPairs: Long,
      trueLabelCol: Option[String],
      uDeterministicOrder: Boolean = false,
      nRows: Long): Result = {

    var best: Option[(Trial, DataFrame, DataFrame)] = None
    val past = scala.collection.mutable.ArrayBuffer[Trial]()
    // the u-estimation pair table is spec-independent — build AND MATERIALIZE it
    // ONCE for the whole search (sample + rank + index + offset-join): the second
    // rotate below checkpoints the joined pair rows themselves (freeing the
    // intermediate indexed table), so each trial's u pass is one gamma aggregation
    // over ~uTargetPairs checkpointed rows instead of re-running the 4 offset joins
    val uSource = linkRight match {
      case Some(right) =>
        val shared = (trainDf.columns.toSet intersect right.columns.toSet).toSeq.sorted
        trainDf.select(shared.map(col): _*)
          .unionByName(right.select(shared.map(col): _*))
      case None => trainDf
    }
    val tracker = new graft.util.CheckpointTracker(trainDf.sparkSession)
    val uPairs = tracker.rotate(
      Estimation.uSamplePairs(uSource, uidCol, attrs, uTargetPairs,
        hashShuffle = !uDeterministicOrder, seed = 42L, tracker))

    // one full trial: train → predict → cluster → metrics. Pure function of its
    // draw (plus the shared loop invariants) — no session-global state, no
    // scoped persists, CheckpointTracker instances are per-call — so trials whose
    // draws are known upfront may run on concurrent driver threads.
    def runTrial(specs: Seq[ComparisonSpec], rule: String, trainingRules: Seq[String])
        : (Trial, DataFrame, DataFrame) = {
      val model = Estimation.train(trainDf, uidCol, specs, Seq(rule), trainingRules,
        uTargetPairs = uTargetPairs, linkRight = linkRight, uPairs = Some(uPairs),
        nRows = Some(nRows))
      val predictions = linkRight match {
        case Some(right) => FellegiSunter.predictLink(trainDf, right, uidCol, model)
        case None => FellegiSunter.predict(trainDf, uidCol, model)
      }
      val edges = predictions
        .filter(col("match_probability") >= clusterThreshold)
        .select(col("uid_l").as("src"), col("uid_r").as("dst"))
      val clusters = ConnectedComponents.assignClusters(clusterBase, uidCol, edges)
      val metric = EntropyMetrics.informationGainPowerRatio(clusters, attrs, adjustedBase)
      val supervised = trueLabelCol.map { label =>
        val labelDf = clusterBase.select(col(uidCol), col(label))
        rowToMap(PairwiseMetrics.confusionMetrics(
          labelDf, predictions, clusterThreshold, uidCol, label)) ++
          rowToMap(ClusteringMetrics.metrics(clusters, label))
      }.getOrElse(Map.empty[String, Double])
      (Trial(model, metric, rule, supervised), clusters, predictions)
    }
    def record(trial: Trial, clusters: DataFrame, predictions: DataFrame): Unit = {
      // strict > keeps the sequential tie-breaking: first trial wins ties
      if (best.isEmpty || trial.metric > best.get._1.metric)
        best = Some((trial, clusters, predictions))
      past += trial
    }

    try {
    // Warmup trials (the first ≤3) draw UNIFORMLY — drawParams ignores `past`
    // while past.size < warmup — so their draws can be taken upfront (consuming
    // the seeded RNG in exactly the sequential order; trial execution consumes no
    // RNG) and the trials themselves OVERLAPPED on driver threads (guide §2.6:
    // a composed trial is dozens of small jobs with straggler tails, and the
    // scheduler back-fills idle cores with the sibling trial's tasks). Each
    // trial's values are deterministic and `record` folds in draw order, so the
    // result is bit-identical to the sequential loop.
    val nWarm = math.min(maxEvals, 3)
    val warmDraws =
      (1 to nWarm).map(_ => drawTrial(rnd, attrs, ruleChoices, Seq.empty, strategy))
    val warmResults =
      if (nWarm <= 1) warmDraws.map { case (s, r, t) => runTrial(s, r, t) }
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(nWarm)
        try {
          val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
          val futures = warmDraws.map { case (s, r, t) =>
            scala.concurrent.Future(runTrial(s, r, t))(ec)
          }
          futures.map(f =>
            scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
        } finally pool.shutdown()
      }
    warmResults.foreach { case (t, c, p) => record(t, c, p) }
    // post-warmup trials draw from `past` — inherently sequential
    ((nWarm + 1) to maxEvals).foreach { _ =>
      val (specs, rule, trainingRules) =
        drawTrial(rnd, attrs, ruleChoices, past.toSeq, strategy)
      val (t, c, p) = runTrial(specs, rule, trainingRules)
      record(t, c, p)
    }
    } finally tracker.close()

    val (b, clusters, predictions) = best.get
    Result(b, clusters, predictions, past.toSeq)
  }

  /** First row of a 1-row metric frame as name → double (longs widened). */
  private def rowToMap(df: DataFrame): Map[String, Double] = {
    val row = df.collect()(0)
    row.schema.fields.zipWithIndex.flatMap { case (f, i) =>
      if (row.isNullAt(i)) None
      else f.dataType match {
        case DoubleType => Some(f.name -> row.getDouble(i))
        case LongType => Some(f.name -> row.getLong(i).toDouble)
        case _ => None
      }
    }.toMap
  }
}
