package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.auto.{AutoLinker, Tpe}
import graft.model.{ComparisonSpec, TrainedModel}

/** Pins for the native TPE search (no Spark involved — the estimator is pure driver
  * arithmetic over the bounded trial history).
  */
class TpeSpec extends AnyFunSuite {

  private def trial(metric: Double, specs: Seq[ComparisonSpec], rule: String) =
    AutoLinker.Trial(TrainedModel(0.01, specs, Map.empty, Seq(rule)), metric, rule)

  test("categorical log-density: add-one smoothing over the choice set") {
    val obs = Seq("a", "a", "b")
    assert(Tpe.catLogDensity(obs, 3, "a") === math.log(3.0 / 6.0))
    assert(Tpe.catLogDensity(obs, 3, "b") === math.log(2.0 / 6.0))
    assert(Tpe.catLogDensity(obs, 3, "c") === math.log(1.0 / 6.0))
    // empty observations: uniform prior over the choices
    assert(Tpe.catLogDensity(Seq.empty, 4, "x") === math.log(1.0 / 4.0))
  }

  test("parzen log-density: uniform prior when empty, peaked at observations") {
    val lo = 0.7; val hi = 0.99
    assert(Tpe.parzenLogDensity(Seq.empty, lo, hi, 0.8) === math.log(1.0 / (hi - lo)))
    val atObs = Tpe.parzenLogDensity(Seq(0.9), lo, hi, 0.9)
    val far = Tpe.parzenLogDensity(Seq(0.9), lo, hi, 0.7)
    assert(atObs > far, s"density at the observation ($atObs) must exceed far away ($far)")
    // mixture with more spread observations is flatter at any single one
    val spread = Tpe.parzenLogDensity(Seq(0.72, 0.8, 0.9, 0.97), lo, hi, 0.9)
    assert(spread < atObs)
  }

  test("draw is deterministic for a fixed seed and history") {
    val past = Seq(
      trial(0.9, Seq(ComparisonSpec("c", "jaro_winkler", 0.9)), "R1"),
      trial(0.2, Seq(ComparisonSpec("c", "levenshtein", 4)), "R2"),
      trial(0.1, Seq(ComparisonSpec("c", "jaccard", 0.75)), "R2"))
    val a = Tpe.draw(new Random(7), Seq("c"), Seq("R1", "R2"), past)
    val b = Tpe.draw(new Random(7), Seq("c"), Seq("R1", "R2"), past)
    assert(a === b)
  }

  private def uniformDraw(rnd: Random, rules: Seq[String]): (Seq[ComparisonSpec], String) = {
    val spec = rnd.nextInt(3) match {
      case 0 => ComparisonSpec("c", "levenshtein", 1 + rnd.nextInt(5).toDouble)
      case 1 => ComparisonSpec("c", "jaccard", 0.7 + rnd.nextDouble() * 0.29)
      case _ => ComparisonSpec("c", "jaro_winkler", 0.7 + rnd.nextDouble() * 0.29)
    }
    (Seq(spec), rules(rnd.nextInt(rules.size)))
  }

  /** One search run mirroring AutoLinker.drawParams' tpe branch: 3-draw uniform
    * warmup + 10% exploration floor, then TPE. Returns the trial history.
    */
  private def search(
      objective: (Seq[ComparisonSpec], String) => Double,
      rules: Seq[String],
      seed: Long,
      evals: Int,
      useTpe: Boolean): Seq[AutoLinker.Trial] = {
    val rnd = new Random(seed)
    val past = scala.collection.mutable.ArrayBuffer[AutoLinker.Trial]()
    (1 to evals).foreach { _ =>
      val (specs, rule) =
        if (!useTpe || past.size < 3 || rnd.nextDouble() < 0.1) uniformDraw(rnd, rules)
        else Tpe.draw(rnd, Seq("c"), rules, past.toSeq)
      past += trial(objective(specs, rule), specs, rule)
    }
    past.toSeq
  }

  test("TPE refines a smooth threshold objective more precisely than random") {
    // single-peak landscape: jaro_winkler scored by closeness of the threshold to
    // 0.9 (other metrics flat 0.3). Parzen refinement around the good observations
    // is TPE's core claim — its best-found |t − 0.9| must beat random's coarse
    // coverage of the axis on average at equal budget.
    def objective(specs: Seq[ComparisonSpec], rule: String): Double = {
      val s = specs.head
      if (s.metric == "jaro_winkler") 1.0 - math.abs(s.threshold - 0.9) else 0.3
    }
    def bestDist(trials: Seq[AutoLinker.Trial]): Double =
      1.0 - trials.map(_.metric).max // = min |t − 0.9| when any jw trial exists
    val seeds = (1L to 10L)
    val tpe = seeds.map(s => bestDist(search(objective, Seq("R1"), s, 30, useTpe = true)))
    val rand = seeds.map(s => bestDist(search(objective, Seq("R1"), s, 30, useTpe = false)))
    assert(tpe.sum < rand.sum,
      s"tpe mean dist ${tpe.sum / 10} not tighter than random ${rand.sum / 10}")
  }

  test("TPE's late draws concentrate on the empirically better region") {
    // rule R2 doubles the objective: after the warmup the good set fills with R2
    // trials, so late TPE draws must pick R2 well above the uniform 1/3 share
    def objective(specs: Seq[ComparisonSpec], rule: String): Double = {
      val s = specs.head
      val base = if (s.metric == "jaro_winkler") 1.0 - math.abs(s.threshold - 0.9) else 0.3
      if (rule == "R2") base else base * 0.5
    }
    val rules = Seq("R1", "R2", "R3")
    val lateR2 = (1L to 10L).map { s =>
      search(objective, rules, s, 30, useTpe = true)
        .drop(15).count(_.blockingRule == "R2")
    }.sum
    assert(lateR2 > 10 * 15 / 3,
      s"late draws picked R2 only $lateR2/150 times — no concentration")
  }

  test("levenshtein thresholds come out integral and in range") {
    val past = Seq(
      trial(0.9, Seq(ComparisonSpec("c", "levenshtein", 3)), "R1"),
      trial(0.5, Seq(ComparisonSpec("c", "levenshtein", 1)), "R1"),
      trial(0.1, Seq(ComparisonSpec("c", "jaccard", 0.8)), "R1"))
    (1 to 30).foreach { s =>
      val (specs, _) = Tpe.draw(new Random(s.toLong), Seq("c"), Seq("R1"), past)
      specs.foreach { sp =>
        if (sp.metric == "levenshtein") {
          assert(sp.threshold == math.rint(sp.threshold))
          assert(sp.threshold >= 1.0 && sp.threshold <= 5.0)
        } else assert(sp.threshold >= 0.7 && sp.threshold <= 0.99)
      }
    }
  }
}
