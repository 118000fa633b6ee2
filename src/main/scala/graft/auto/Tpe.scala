package graft.auto

import scala.util.Random

import graft.model.ComparisonSpec

/** Tree-structured Parzen Estimator search (Bergstra, Bardenet, Bengio, Kégl —
  * "Algorithms for Hyper-Parameter Optimization", NeurIPS 2011): the algorithm
  * behind the reference's Hyperopt search loop (reference
  * `python/arc/autolinker/autolinker.py:818-825` runs `hyperopt.fmin` with
  * `tpe.suggest`), implemented natively so the search has no Python dependency and
  * reproduces bit-for-bit from one seeded [[Random]].
  *
  * Search space (matches `autolinker.py:345-365` and [[AutoLinker]]): per attribute
  * column a categorical comparison metric with a conditional threshold —
  * `levenshtein` with an integer threshold in {1..5}, `jaccard`/`jaro_winkler` with
  * a continuous threshold in [0.7, 0.99] — plus a categorical blocking rule.
  *
  * TPE proper, per draw:
  *   1. split past trials at the γ-quantile of the objective (maximized) into
  *      GOOD (the l-density observations) and BAD (the g-density observations);
  *   2. model each dimension with a 1-D Parzen mixture: a uniform prior component
  *      over the range plus one Gaussian per observation (bandwidth
  *      range/(#obs+2)) for numeric thresholds, and an add-one-smoothed
  *      categorical for metric and rule choices — hyperopt's own estimator family,
  *      with the conditional threshold densities keyed by the sampled metric
  *      (the "tree" in TPE);
  *   3. draw `nCandidates` configurations FROM the good densities and score each
  *      by Σ_dims [log l(x) − log g(x)] — maximizing this ratio maximizes expected
  *      improvement (Bergstra et al. §4) — keeping the best.
  *
  * Everything is driver-side arithmetic over the bounded trial history; no Spark
  * jobs. Determinism: a single [[Random]] threaded through every sample, fixed
  * iteration order over attributes, ties in the candidate argmax keep the
  * earliest draw.
  */
object Tpe {

  private val Metrics = Seq("levenshtein", "jaccard", "jaro_winkler")

  /** Range of the conditional threshold dimension for a metric. */
  private def range(metric: String): (Double, Double) =
    if (metric == "levenshtein") (1.0, 5.0) else (0.7, 0.99)

  /** Add-one-smoothed categorical log-density of `v` under `obs`. */
  def catLogDensity(obs: Seq[String], nChoices: Int, v: String): Double =
    math.log((obs.count(_ == v) + 1.0) / (obs.size + nChoices))

  /** Sample a category proportional to smoothed observation counts. */
  private def catSample(rnd: Random, obs: Seq[String], choices: Seq[String]): String = {
    val weights = choices.map(c => obs.count(_ == c) + 1.0)
    var u = rnd.nextDouble() * weights.sum
    var i = 0
    while (i < choices.size - 1) {
      u -= weights(i)
      if (u <= 0) return choices(i)
      i += 1
    }
    choices.last
  }

  /** Parzen mixture log-density at `x`: uniform prior + per-observation Gaussians,
    * all components equally weighted (hyperopt's adaptive-Parzen shape with a
    * deterministic bandwidth rule).
    */
  def parzenLogDensity(
      obs: Seq[Double],
      lo: Double,
      hi: Double,
      x: Double): Double = {
    val prior = 1.0 / (hi - lo)
    if (obs.isEmpty) math.log(prior)
    else {
      val bw = (hi - lo) / (obs.size + 2.0)
      val norm = 1.0 / (bw * math.sqrt(2.0 * math.Pi))
      var gauss = 0.0
      obs.foreach { m =>
        val z = (x - m) / bw
        gauss += norm * math.exp(-0.5 * z * z)
      }
      math.log((prior + gauss) / (obs.size + 1.0))
    }
  }

  /** Sample from the Parzen mixture: pick a component uniformly (index 0 = the
    * uniform prior), then draw from it, clamped to the range.
    */
  private def parzenSample(rnd: Random, obs: Seq[Double], lo: Double, hi: Double): Double = {
    val k = rnd.nextInt(obs.size + 1)
    if (k == 0) lo + rnd.nextDouble() * (hi - lo)
    else {
      val bw = (hi - lo) / (obs.size + 2.0)
      math.max(lo, math.min(hi, obs(k - 1) + rnd.nextGaussian() * bw))
    }
  }

  /** One TPE draw over the full (specs, rule) space. `past` must be non-empty (the
    * caller runs a uniform warmup first, exactly as hyperopt's `n_startup_jobs`).
    */
  def draw(
      rnd: Random,
      attrs: Seq[String],
      ruleChoices: Seq[String],
      past: Seq[AutoLinker.Trial],
      nCandidates: Int = 24,
      gamma: Double = 0.25): (Seq[ComparisonSpec], String) = {
    require(past.nonEmpty, "TPE needs at least one past trial (run warmup first)")
    val sorted = past.sortBy(t => (-t.metric, t.blockingRule))
    val nGood = math.max(1, math.ceil(gamma * past.size).toInt)
    val good = sorted.take(nGood)
    val bad = sorted.drop(nGood)

    def specsOf(ts: Seq[AutoLinker.Trial], c: String): Seq[ComparisonSpec] =
      ts.flatMap(_.model.comparisons.filter(_.column == c))

    // one candidate: sample every dimension from the GOOD densities, score by the
    // summed log-ratio l/g
    def candidate(): (Seq[ComparisonSpec], String, Double) = {
      var score = 0.0
      val specs = attrs.map { c =>
        val gObs = specsOf(good, c)
        val bObs = specsOf(bad, c)
        val metric = catSample(rnd, gObs.map(_.metric), Metrics)
        val (lo, hi) = range(metric)
        val gThr = gObs.filter(_.metric == metric).map(_.threshold)
        val bThr = bObs.filter(_.metric == metric).map(_.threshold)
        val raw = parzenSample(rnd, gThr, lo, hi)
        val thr = if (metric == "levenshtein") math.round(raw).toDouble else raw
        score += catLogDensity(gObs.map(_.metric), Metrics.size, metric) -
          catLogDensity(bObs.map(_.metric), Metrics.size, metric)
        score += parzenLogDensity(gThr, lo, hi, thr) -
          parzenLogDensity(bThr, lo, hi, thr)
        ComparisonSpec(c, metric, thr)
      }
      val rule = catSample(rnd, good.map(_.blockingRule), ruleChoices)
      score += catLogDensity(good.map(_.blockingRule), ruleChoices.size, rule) -
        catLogDensity(bad.map(_.blockingRule), ruleChoices.size, rule)
      (specs, rule, score)
    }

    var best = candidate()
    (2 to nCandidates).foreach { _ =>
      val c = candidate()
      if (c._3 > best._3) best = c // strict >: earliest best draw wins ties
    }
    (best._1, best._2)
  }
}
