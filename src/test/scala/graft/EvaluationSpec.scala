package graft

import org.apache.spark.sql.functions._

import graft.metrics.{ClusteringMetrics, Evaluation}
import graft.score.FellegiSunter
import graft.textops.Similarity

/** Evaluation-layer operators: ROC-AUC/Brier/calibration, B-cubed, NDCG retrieval
  * eval, and mutual-best 1:1 assignment.
  */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  // ---- rocAuc ---------------------------------------------------------------

  /** Independent midrank reference: AUC = (Σ ranks(pos) − np(np+1)/2) / (np·nn). */
  private def aucRef(data: Seq[(Double, Int)]): Double = {
    val sorted = data.sortBy(_._1)
    // midranks per tie group
    val ranks = scala.collection.mutable.Map[Double, Double]()
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      ranks(sorted(i)._1) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      i = j
    }
    val np = data.count(_._2 == 1).toDouble
    val nn = data.length - np
    val rankSum = data.filter(_._2 == 1).map(d => ranks(d._1)).sum
    (rankSum - np * (np + 1) / 2.0) / (np * nn)
  }

  test("rocAuc: perfect separation is 1.0, anti-separation is 0.0") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("p", "y")
    val r = Evaluation.rocAuc(perfect, col("p"), col("y")).first()
    assert(r.getAs[Double]("auc") === 1.0)
    assert(r.getAs[Long]("n_pos") === 2 && r.getAs[Long]("n_neg") === 2)
    val anti = Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)).toDF("p", "y")
    assert(Evaluation.rocAuc(anti, col("p"), col("y")).first().getAs[Double]("auc") === 0.0)
  }

  test("rocAuc: ties get midranks — all-equal scores give AUC 0.5 exactly") {
    val tied = Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0), (0.5, 0)).toDF("p", "y")
    assert(Evaluation.rocAuc(tied, col("p"), col("y")).first().getAs[Double]("auc") === 0.5)
  }

  test("rocAuc matches the independent midrank reference on random data with ties") {
    val rnd = new scala.util.Random(42)
    // quantized scores force tie groups; labels correlated with score
    val data = Seq.fill(500) {
      val s = rnd.nextInt(20) / 20.0
      (s, if (rnd.nextDouble() < 0.2 + 0.6 * s) 1 else 0)
    }
    val got = Evaluation.rocAuc(data.toDF("p", "y"), col("p"), col("y"))
      .first().getAs[Double]("auc")
    assert(math.abs(got - aucRef(data)) < 1e-12, s"got $got vs ref ${aucRef(data)}")
  }

  test("rocAuc is partitioning-invariant bit-for-bit (exact rank arithmetic)") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(300)((rnd.nextInt(50) / 50.0, rnd.nextInt(2)))
    val a = Evaluation.rocAuc(data.toDF("p", "y"), col("p"), col("y")).first()
    val b = Evaluation.rocAuc(data.toDF("p", "y").repartition(7), col("p"), col("y")).first()
    assert(a.getAs[Double]("auc") === b.getAs[Double]("auc"))
    assert(a.getAs[Double]("brier_e6") === b.getAs[Double]("brier_e6"))
  }

  test("brier: hand-computed on a 2-row fixture") {
    // (0.8,1): 0.04; (0.5,0): 0.25 → mean 0.145 (exact at 1e-6 scaling)
    val df = Seq((0.8, 1), (0.5, 0)).toDF("p", "y")
    val b = Evaluation.rocAuc(df, col("p"), col("y")).first().getAs[Double]("brier_e6")
    assert(math.abs(b - 0.145) < 1e-9, s"brier $b")
  }

  test("calibrationBins: perfectly calibrated bins have mean_p == frac_pos") {
    // bin 2 (p=0.25, half positive), bin 7 (p=0.75, three quarters positive)
    val df = Seq((0.25, 1), (0.25, 0), (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0))
      .toDF("p", "y")
    val rows = Evaluation.calibrationBins(df, col("p"), col("y"))
      .orderBy("bin").collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq === Seq(2, 7))
    assert(rows(0).getAs[Long]("n") === 2 && rows(0).getAs[Long]("n_pos") === 1)
    assert(rows(0).getAs[Double]("mean_p") === 0.25)
    assert(rows(0).getAs[Double]("frac_pos") === 0.5)
    assert(rows(1).getAs[Double]("mean_p") === 0.75)
    assert(rows(1).getAs[Double]("frac_pos") === 0.75)
  }

  test("calibrationBins: p = 1.0 lands in the top bin (9), not a phantom bin 10") {
    val df = Seq((1.0, 1), (0.95, 0)).toDF("p", "y")
    val rows = Evaluation.calibrationBins(df, col("p"), col("y")).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSet === Set(9))
    assert(rows.head.getAs[Long]("n") === 2)
  }

  // ---- bcubed ---------------------------------------------------------------

  test("bcubed: classic 3-record fixture (truth {a,a,b} in one cluster)") {
    val df = Seq(("r1", "a", "c1"), ("r2", "a", "c1"), ("r3", "b", "c1"))
      .toDF("uid", "truth", "cluster_id")
    val r = ClusteringMetrics.bcubed(df, "truth").first()
    // P = (2/3 + 2/3 + 1/3)/3 = 5/9; R = 1; F1 = 2·(5/9)/(5/9 + 1) = 5/7
    assert(math.abs(r.getAs[Double]("bcubed_precision") - 5.0 / 9.0) < 1e-12)
    assert(r.getAs[Double]("bcubed_recall") === 1.0)
    assert(math.abs(r.getAs[Double]("bcubed_f1") - 5.0 / 7.0) < 1e-12)
  }

  test("bcubed: perfect clustering scores 1.0 everywhere; over-splitting hurts recall only") {
    val perfect = Seq(("r1", "a", "x"), ("r2", "a", "x"), ("r3", "b", "y"))
      .toDF("uid", "truth", "cluster_id")
    val p = ClusteringMetrics.bcubed(perfect, "truth").first()
    assert(p.getAs[Double]("bcubed_precision") === 1.0 &&
      p.getAs[Double]("bcubed_recall") === 1.0 && p.getAs[Double]("bcubed_f1") === 1.0)
    val split = Seq(("r1", "a", "x"), ("r2", "a", "z"), ("r3", "b", "y"))
      .toDF("uid", "truth", "cluster_id")
    val s = ClusteringMetrics.bcubed(split, "truth").first()
    assert(s.getAs[Double]("bcubed_precision") === 1.0)
    // a-records each recall 1/2; b recalls 1 → R = (1/2 + 1/2 + 1)/3 = 2/3
    assert(math.abs(s.getAs[Double]("bcubed_recall") - 2.0 / 3.0) < 1e-12)
  }

  test("streaming AUC bins reproduce the batch evaluation cell-exactly (sf0.001)") {
    import graft.textops.{QualityClassifier, TextOps}
    val weights = Array(-3.0, 1.0, -2.0, 4.0, 3.0, -2.0, -2.0, -2.0, -2.0)
    val path = "/root/testdata/sf0.001/documents.parquet"
    def scoreCol(t: org.apache.spark.sql.Column) =
      QualityClassifier.score(QualityClassifier.textFeatures(t), weights)
    def labelCol(t: org.apache.spark.sql.Column) =
      (TextOps.qualityScore(t) >= 0.54).cast("double")
    val streamed = graft.streaming.StreamOps
      .streamingAucBins(spark, path, scoreCol, labelCol)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = spark.read.parquet(path)
      .select(round(scoreCol(col("text")), 3).as("s"), labelCol(col("text")).as("y"))
      .groupBy("s").agg(count(lit(1)).as("n"), sum("y").cast("long").as("n_pos"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(streamed === batch)
    assert(streamed.map(_._2).sum === spark.read.parquet(path).count())
  }

  // ---- psiDrift -------------------------------------------------------------

  test("psiDrift: identical distributions give zero PSI in every bin") {
    val df = Seq(0.05, 0.15, 0.15, 0.85, 0.95).toDF("s")
    val rows = graft.metrics.Evaluation.psiDrift(df, df, col("s")).collect()
    assert(rows.forall(_.getAs[Double]("psi") === 0.0))
  }

  test("psiDrift: a shifted distribution yields positive total PSI; total = Σ bins") {
    val base = (Seq.fill(80)(0.25) ++ Seq.fill(20)(0.75)).toDF("s")
    val cur = (Seq.fill(20)(0.25) ++ Seq.fill(80)(0.75)).toDF("s")
    val rows = graft.metrics.Evaluation.psiDrift(base, cur, col("s")).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Double]("psi")).toMap
    // classic PSI for (0.8,0.2) → (0.2,0.8): 2 · 0.6·ln(4) ≈ 1.664
    assert(math.abs(rows(-1) - 2 * 0.6 * math.log(4.0)) < 1e-9)
    assert(math.abs(rows(-1) - (rows(2) + rows(7))) < 1e-12)
  }

  test("psiDrift: a bin empty on one side contributes a finite clamped term") {
    val base = Seq.fill(10)(0.15).toDF("s")
    val cur = (Seq.fill(9)(0.15) :+ 0.95).toDF("s")
    val rows = graft.metrics.Evaluation.psiDrift(base, cur, col("s")).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Double]("psi")).toMap
    // bin 9: base share clamps to 1e-6, cur share 0.1 → (0.1−1e-6)·ln(1e5)
    assert(math.abs(rows(9) - (0.1 - 1e-6) * math.log(0.1 / 1e-6)) < 1e-9)
    assert(rows(-1) > 0 && !rows(-1).isInfinite)
  }

  // ---- robustStats ----------------------------------------------------------

  test("robustStats: hand-computed median/MAD/winsorized mean; outlier-insensitive") {
    // group g: values 1..9 plus outlier 1000 → median 5.5, p05 = 1.45, p95 = 549.55
    val df = ((1 to 9).map(v => ("g", v.toLong)) :+ (("g", 1000L))).toDF("k", "v")
    val r = graft.metrics.Profile.robustStats(df, col("k"), col("v")).first()
    assert(r.getAs[Double]("median") === 5.5)
    // |v−5.5| sorted: 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 → median 2.5
    assert(r.getAs[Double]("mad") === 2.5)
    // winsorized mean stays near the data body, far below the raw mean (104.5)
    val wm = r.getAs[Double]("winsorized_mean")
    assert(wm < 60.0, s"winsorized mean $wm should be outlier-damped")
    // exact closed form: interior sum (2..9 = 44) + 1·p05 + 1·p95 over 10
    val p05 = r.getAs[Double]("p05"); val p95 = r.getAs[Double]("p95")
    assert(wm === (44.0 + p05 + p95) / 10.0)
  }

  test("robustStats rejects non-integral value columns (exact-sum contract)") {
    val df = Seq(("g", 1.5)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      graft.metrics.Profile.robustStats(df, col("k"), col("v"))
    }
  }

  // ---- retrievalEval --------------------------------------------------------

  test("retrievalEval: hand-computed NDCG/RR/P@k on a 1-query fixture") {
    // ranking: d1(rel 3), d2(rel 0), d3(rel 1); unranked d4 has rel 2
    val ranking = Seq((0, 1, 10L), (0, 2, 20L), (0, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val qrels = Seq((0, 10L, 3), (0, 30L, 1), (0, 40L, 2)).toDF("query_id", "doc_id", "rel")
    val r = Similarity.retrievalEval(ranking, qrels, k = 3, relThreshold = 2).first()
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val dcg = 7.0 / lg2(2.0) + 0.0 + 1.0 / lg2(4.0)
    val idcg = 7.0 / lg2(2.0) + 3.0 / lg2(3.0) + 1.0 / lg2(4.0) // ideal: rel 3,2,1
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-12)
    assert(r.getAs[Double]("rr") === 1.0) // first rel>=2 at rank 1
    assert(math.abs(r.getAs[Double]("p_at_k") - 1.0 / 3.0) < 1e-12) // only d1 counts
  }

  test("retrievalEval: no relevant doc in the ranking gives rr = 0 and p_at_k = 0") {
    val ranking = Seq((0, 1, 10L)).toDF("query_id", "rank", "doc_id")
    val qrels = Seq((0, 99L, 3)).toDF("query_id", "doc_id", "rel")
    val r = Similarity.retrievalEval(ranking, qrels, k = 5, relThreshold = 2).first()
    assert(r.getAs[Double]("rr") === 0.0 && r.getAs[Double]("p_at_k") === 0.0)
    assert(r.getAs[Double]("ndcg") === 0.0) // dcg 0, idcg > 0
  }

  test("retrievalEval: the perfect ranking has ndcg exactly 1.0") {
    val qrels = Seq((0, 1L, 3), (0, 2L, 2), (0, 3L, 1)).toDF("query_id", "doc_id", "rel")
    val ranking = Seq((0, 1, 1L), (0, 2, 2L), (0, 3, 3L)).toDF("query_id", "rank", "doc_id")
    val r = Similarity.retrievalEval(ranking, qrels, k = 3, relThreshold = 1).first()
    assert(math.abs(r.getAs[Double]("ndcg") - 1.0) < 1e-12)
    assert(r.getAs[Double]("p_at_k") === 1.0)
  }

  // ---- mutualBestPairs ------------------------------------------------------

  private def scoredDf(rows: Seq[(String, String, Double)]) =
    rows.toDF("uid_l", "uid_r", "match_weight")
      .withColumn("match_probability",
        lit(1.0) / (lit(1.0) + pow(lit(2.0), -col("match_weight"))))

  test("mutualBestPairs: keeps only mutual preferences") {
    // A-B 5, A-C 3, B-C 4: best(A)=B, best(B)=A, best(C)=B → only A-B mutual
    val scored = scoredDf(Seq(("A", "B", 5.0), ("A", "C", 3.0), ("B", "C", 4.0)))
    val got = FellegiSunter.mutualBestPairs(scored, 0.0).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("A", "B")))
  }

  test("mutualBestPairs: chains resolve 1:1 — each record appears at most once") {
    // path A-B 1, B-C 2, C-D 3: best(B)=C? no — best(B) = C (2>1), best(C) = D (3>2),
    // best(D)=C → C-D mutual; A and B stay unmatched (A's best B prefers C)
    val scored = scoredDf(Seq(("A", "B", 1.0), ("B", "C", 2.0), ("C", "D", 3.0)))
    val got = FellegiSunter.mutualBestPairs(scored, 0.0).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("C", "D")))
    val uids = got.flatMap(r => Seq(r.getString(0), r.getString(1)))
    assert(uids.distinct.length === uids.length)
  }

  test("mutualBestPairs: equal weights break ties toward the smaller partner uid") {
    val scored = scoredDf(Seq(("A", "B", 2.0), ("A", "C", 2.0), ("B", "C", 2.0)))
    // best(A)=B (tie B<C), best(B)=A (A<C), best(C)=A but best(A)≠C → only A-B
    val got = FellegiSunter.mutualBestPairs(scored, 0.0).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq === Seq(("A", "B")))
  }

  test("mutualBestPairs: the probability threshold excludes low-scoring pairs") {
    // weight -1 → p ≈ 0.33: below a 0.5 threshold nothing survives
    val scored = scoredDf(Seq(("A", "B", -1.0)))
    assert(FellegiSunter.mutualBestPairs(scored, 0.5).count() === 0)
    assert(FellegiSunter.mutualBestPairs(scored, 0.2).count() === 1)
  }

  // ---- ksDrift ---------------------------------------------------------------

  test("ksDrift: hand-computed binned KS, argmax edge, identical-dist zero") {
    import spark.implicits._
    // A = {0.15, 0.35}, B = {0.15, 0.95} on a 10-bin [0,1) grid:
    // ECDF_A hits 1.0 from bin 3; ECDF_B stays 0.5 until bin 9 → D = 0.5,
    // first attained at bin 3 (right edge 0.4)
    val df = Seq(("a", 0.15), ("a", 0.35), ("b", 0.15), ("b", 0.95))
      .toDF("g", "v")
    val r = graft.metrics.Evaluation.ksDrift(df, col("v"), col("g"), bins = 10)
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(r.toSeq === Seq(("a", "b", 2L, 2L, 0.5, 0.4)))
    // identical distributions → D = 0 (argmax edge = first bin)
    val same = graft.metrics.Evaluation.ksDrift(
        df.filter(col("g") === "a").unionByName(
          df.filter(col("g") === "a").withColumn("g", lit("c"))),
        col("v"), col("g"), bins = 10)
      .as[(String, String, Long, Long, Double, Double)].head()
    assert(same === (("a", "c", 2L, 2L, 0.0, 0.1)))
    // disjoint supports → D = 1
    val far = Seq(("x", 0.05), ("y", 0.95)).toDF("g", "v")
    val fr = graft.metrics.Evaluation.ksDrift(far, col("v"), col("g"), bins = 10)
      .as[(String, String, Long, Long, Double, Double)].head()
    assert(fr._5 === 1.0 && fr._6 === 0.1)
    // out-of-range values clamp into the edge bins instead of disappearing
    val clamped = Seq(("p", -5.0), ("q", 99.0)).toDF("g", "v")
    val cr = graft.metrics.Evaluation.ksDrift(clamped, col("v"), col("g"), bins = 10)
      .as[(String, String, Long, Long, Double, Double)].head()
    assert(cr._3 === 1L && cr._4 === 1L && cr._5 === 1.0)
  }

  test("prCurve: hand-computed thresholds, empty-threshold NULL precision") {
    // scores/labels: (0.9,1) (0.7,1) (0.6,0) (0.2,0) with bins=4 -> t in {.25,.5,.75,1}
    val df = Seq((0.9, 1.0), (0.7, 1.0), (0.6, 0.0), (0.2, 0.0)).toDF("p", "y")
    val out = Evaluation.prCurve(df, col("p"), col("y"), bins = 4)
      .orderBy("threshold")
      .as[(Double, Long, Long, Option[Double], Double, Double)].collect()
    // t=0.25: all but 0.2 predicted pos -> pp=3, tp=2
    assert((out(0)._2, out(0)._3) === ((3L, 2L)))
    assert(math.abs(out(0)._4.get - 2.0 / 3) < 1e-12 && out(0)._5 === 1.0)
    // t=0.5: pp=3 (0.6 rounds into bucket 2), tp=2; t=0.75: pp=1 (0.9), tp=1
    assert((out(1)._2, out(1)._3) === ((3L, 2L)))
    assert((out(2)._2, out(2)._3) === ((1L, 1L)))
    assert(out(2)._4.get === 1.0 && math.abs(out(2)._5 - 0.5) < 1e-12)
    // t=1.0: nothing predicted positive -> NULL precision, recall 0, f1 0
    assert(out(3)._2 === 0L && out(3)._4.isEmpty && out(3)._5 === 0.0 && out(3)._6 === 0.0)
  }

  test("passAtK: closed-form C(n-c,k)/C(n,k) cases, boundary rules") {
    // task A: n=5, c=2 -> pass@2 = 1 - C(3,2)/C(5,2) = 1 - 3/10 = 0.7
    // task B: n=4, c=0 -> pass@k = 0 for k <= 4; task C: n=2 -> pass@5 NULL
    val df = (Seq.fill(2)(("A", true)) ++ Seq.fill(3)(("A", false)) ++
      Seq.fill(4)(("B", false)) ++ Seq(("C", true), ("C", false)))
      .toDF("task", "passed")
    val out = Evaluation.passAtK(df, col("task"), col("passed"), Seq(1, 2, 5))
      .orderBy("task").collect()
    val a = out(0)
    assert((a.getLong(1), a.getLong(2)) === ((5L, 2L)))
    assert(math.abs(a.getDouble(3) - 0.4) < 1e-12) // 1 - 3/5
    assert(math.abs(a.getDouble(4) - 0.7) < 1e-12)
    assert(a.getDouble(5) === 1.0) // k=5 of n=5 with c=2: every draw has a pass
    val b = out(1)
    assert(b.getDouble(3) === 0.0 && b.getDouble(4) === 0.0)
    val c = out(2)
    assert(math.abs(c.getDouble(3) - 0.5) < 1e-12)
    assert(c.isNullAt(5))
  }

  test("majorityVote: modal answer, lexicographic tie-break, agreement share") {
    val df = Seq(("t1", "x"), ("t1", "x"), ("t1", "y"),
      ("t2", "b"), ("t2", "a"), ("t2", "b"), ("t2", "a")).toDF("task", "ans")
    val out = Evaluation.majorityVote(df, col("task"), col("ans"))
      .orderBy("task").collect()
    assert((out(0).getString(1), out(0).getLong(2), out(0).getLong(3)) === (("x", 2L, 3L)))
    assert(math.abs(out(0).getDouble(4) - 2.0 / 3.0) < 1e-12)
    // t2: a and b tie at 2 votes -> "a" wins lexicographically
    assert((out(1).getString(1), out(1).getLong(2)) === (("a", 2L)))
  }
}
