package graft

import org.apache.spark.sql.functions._

import graft.blocking.{BlockingRule, PairGenerator, RuleGen}
import graft.cluster.ConnectedComponents
import graft.compare.Comparisons
import graft.model.{ColumnParams, ComparisonSpec, TrainedModel}
import graft.score.FellegiSunter
import graft.train.Estimation

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("blocking rule render/parse round-trip") {
    val r = BlockingRule(Seq(Seq("a", "b"), Seq("c")))
    assert(r.render === "(l.a = r.a AND l.b = r.b) OR (l.c = r.c)")
    assert(BlockingRule.parse(r.render) === r)
    assert(BlockingRule.parse("l.x = r.x") === BlockingRule(Seq(Seq("x"))))
    assert(BlockingRule.parse("A&B") === BlockingRule(Seq(Seq("A", "B"))))
  }

  test("dedupe pairs: blocks on equality keys, uid_l < uid_r, dedup across OR branches") {
    val df = Seq(
      ("1", "x", "p"), ("2", "x", "p"), ("3", "x", "q"), ("4", "y", "q"))
      .toDF("id", "k1", "k2")
    val rule = BlockingRule.parse("(l.k1 = r.k1) OR (l.k2 = r.k2)")
    val pairs = PairGenerator.dedupePairs(df, "id", Seq("k1", "k2"), Seq(rule))
      .select("uid_l", "uid_r").as[(String, String)].collect().toSet
    // k1 blocks: {1,2,3} → (1,2),(1,3),(2,3); k2 blocks: {1,2} dup, {3,4} → (3,4)
    assert(pairs === Set(("1", "2"), ("1", "3"), ("2", "3"), ("3", "4")))
  }

  test("salted dedupe pairs produce exactly the unsalted pair set") {
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey").cast("string").as("id"),
        col("c_mktsegment").as("seg"), col("c_nationkey").cast("string").as("nat"))
    val rule = BlockingRule.parse("l.seg = r.seg")
    val plain = PairGenerator.dedupePairs(df, "id", Seq("seg", "nat"), Seq(rule))
      .select("uid_l", "uid_r").as[(String, String)].collect().toSet
    val salted = PairGenerator.dedupePairsSalted(df, "id", Seq("seg", "nat"), Seq(rule), 8)
      .select("uid_l", "uid_r").as[(String, String)].collect().toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("null block keys never match") {
    val df = Seq(("1", null), ("2", null), ("3", "x")).toDF("id", "k")
    val pairs = PairGenerator.dedupePairs(df, "id", Seq("k"),
      Seq(BlockingRule.parse("l.k = r.k")))
    assert(pairs.count() === 0)
  }

  test("connected components match transitive-closure oracle on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val n = 40
      val edges = (1 to 50).map(_ => (rnd.nextInt(n).toString, rnd.nextInt(n).toString))
        .filter(e => e._1 != e._2)
      // oracle: union-find on the driver
      val parent = scala.collection.mutable.Map((0 until n).map(i => i.toString -> i.toString): _*)
      def find(x: String): String = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val expected = (0 until n).map(_.toString)
        .groupBy(find).values.map(_.toSet).filter(_.size > 1).toSet

      // both execution paths must agree with the oracle: the driver union-find
      // fallback (default threshold) and the distributed star loop (threshold 0)
      for (threshold <- Seq(500000L, 0L)) {
        val got = ConnectedComponents.run(edges.toDF("src", "dst"),
            localThreshold = threshold)
          .as[(String, String)].collect()
          .groupBy(_._2).values.map(g => (g.map(_._1) :+ g.head._2).toSet).toSet
        assert(got === expected, s"localThreshold=$threshold")
      }
    }
  }

  test("incremental CC equals full-run CC on random edge splits") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val n = 40
      val edges = (1 to 60).map(_ => (rnd.nextInt(n).toString, rnd.nextInt(n).toString))
        .filter(e => e._1 != e._2).distinct
      val (baseE, newE) = edges.partition(_ => rnd.nextBoolean())
      val base = ConnectedComponents.run(baseE.toDF("src", "dst"))
      val got = ConnectedComponents.incremental(base, newE.toDF("src", "dst"))
        .as[(String, String)].collect().toMap
      val full = ConnectedComponents.run(edges.toDF("src", "dst"))
        .as[(String, String)].collect().toMap
      assert(got === full)
    }
  }

  test("incremental CC: internal edges are no-ops, new nodes merge clusters") {
    // base: {1,2} and {3,4}; batch: an internal edge (no-op), a fresh pair, and a
    // new node 0 bridging both base clusters — merged component min becomes "0"
    val base = Seq(("1", "1"), ("2", "1"), ("3", "3"), ("4", "3"))
      .toDF("node", "cluster_id")
    val batch = Seq(("1", "2"), ("8", "9"), ("0", "2"), ("0", "4"))
      .toDF("src", "dst")
    val out = ConnectedComponents.incremental(base, batch)
      .as[(String, String)].collect().toMap
    assert(out === Map("0" -> "0", "1" -> "0", "2" -> "0", "3" -> "0", "4" -> "0",
      "8" -> "8", "9" -> "8"))
  }

  test("cluster assignment keeps singletons as their own id") {
    val records = Seq("1", "2", "3", "9").toDF("id")
    val edges = Seq(("1", "2")).toDF("src", "dst")
    val out = ConnectedComponents.assignClusters(records, "id", edges)
      .select("id", "cluster_id").as[(String, String)].collect().toMap
    assert(out("1") === "1" && out("2") === "1")
    assert(out("3") === "3" && out("9") === "9")
  }

  test("gamma ladder: null → -1, exact → 2, within threshold → 1, else → 0") {
    val specs = Seq(ComparisonSpec("name", "levenshtein", 2))
    val pairs = Seq(
      ("aaa", "aaa"), ("aaa", "aab"), ("aaa", "zzz"), (null, "aaa"))
      .toDF("name_l", "name_r")
    val g = Comparisons.withGammas(pairs, specs)
      .select("gamma_name").as[Int].collect().toSeq
    assert(g === Seq(2, 1, 0, -1))
  }

  test("fellegi-sunter weight and probability: closed form") {
    val model = TrainedModel(
      lambda = 0.25,
      comparisons = Seq(ComparisonSpec("a", "levenshtein", 1)),
      params = Map("a" -> ColumnParams(Array(0.05, 0.15, 0.8), Array(0.7, 0.2, 0.1))),
      blockingRules = Seq("l.a = r.a"))
    val df = Seq((2, "x"), (0, "y"), (-1, "z")).toDF("gamma_a", "junk")
    val out = FellegiSunter.score(df, model)
      .select("match_weight", "match_probability").as[(Double, Double)].collect()
    def lg2(x: Double) = math.log(x) / math.log(2)
    val priorW = lg2(0.25 / 0.75)
    assert(math.abs(out(0)._1 - (priorW + lg2(0.8 / 0.1))) < 1e-12)
    assert(math.abs(out(1)._1 - (priorW + lg2(0.05 / 0.7))) < 1e-12)
    assert(math.abs(out(2)._1 - priorW) < 1e-12) // null gamma contributes nothing
    val w0 = out(0)._1
    assert(math.abs(out(0)._2 - math.pow(2, w0) / (1 + math.pow(2, w0))) < 1e-12)
  }

  test("clusterStats: chain density, duplicate-edge canonicalization, singleton") {
    import graft.cluster.ConnectedComponents
    val recs = Seq("a", "b", "c", "d", "e", "f").toDF("uid")
    // chain a-b-c (density 2/3), pair d-e with the edge duplicated in both
    // orientations (must count once → density 1), singleton f (density 0)
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e"), ("e", "d"))
      .toDF("src", "dst")
    val assigned = ConnectedComponents.assignClusters(recs, "uid", edges)
    val got = ConnectedComponents.clusterStats(assigned, "uid", edges)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a") === (("a", 3L, 2L, 0.666667)))
    assert(got("d") === (("d", 2L, 1L, 1.0)))
    assert(got("f") === (("f", 1L, 0L, 0.0)))
  }

  test("term-frequency adjustment: rare terms gain weight, common terms lose it") {
    def lg2(x: Double) = math.log(x) / math.log(2)
    // shares: A 3/6, B 2/6, C 1/6; column-global u_exact = 0.2
    val recs = Seq(("1", "A"), ("2", "A"), ("3", "A"), ("4", "B"), ("5", "B"),
      ("6", "C")).toDF("uid", "seg")
    val tf = FellegiSunter.termFrequencies(recs, "seg")
    val shares = tf.as[(String, Double)].collect().toMap
    assert(math.abs(shares("A") - 0.5) < 1e-12 && math.abs(shares("C") - 1.0 / 6) < 1e-12)

    // scored pairs carrying seg_l/seg_r and a flat base weight
    val pairs = Seq(("1", "2", "A", "A"), ("6", "6b", "C", "C"),
      ("1", "4", "A", "B")).toDF("uid_l", "uid_r", "seg_l", "seg_r")
      .withColumn("match_weight", lit(1.0))
    val out = FellegiSunter.tfAdjust(pairs, "seg", uExact = 0.2, tf)
      .select("uid_l", "uid_r", "tf_adjustment")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val adjA = lg2(0.2) - lg2(0.5)       // common: negative (evidence weakens)
    val adjC = lg2(0.2) - lg2(1.0 / 6)   // rare: positive (evidence strengthens)
    assert(math.abs(out(("1", "2")) - adjA) < 1e-9 && adjA < 0)
    assert(math.abs(out(("6", "6b")) - adjC) < 1e-9 && adjC > 0)
    assert(out(("1", "2")) < out(("6", "6b")))
    // disagreeing pair: untouched
    val disagree = FellegiSunter.tfAdjust(pairs, "seg", 0.2, tf)
      .filter(col("uid_l") === "1" && col("uid_r") === "4")
      .select("tf_adjustment", "match_weight_tf").as[(Double, Double)].head()
    assert(disagree === ((0.0, 1.0)))
  }

  test("EM increases m for matching levels on a planted-duplicate dataset") {
    // 30 entities, each duplicated with a 1-char typo in `b`; `blk` is a shared block key.
    val rows = (0 until 30).flatMap { i =>
      val base = f"name$i%03d"
      Seq((s"u${i}_a", base, s"city$i", i % 3), (s"u${i}_b", base, s"city${i}x", i % 3))
    }
    val df = rows.toDF("id", "a", "b", "blk")
    val specs = Seq(ComparisonSpec("b", "levenshtein", 2))
    val u = Map("b" -> Array(0.9, 0.05, 0.05))
    val (lambda, m, _) = Estimation.emTrain(
      df, "id", Seq(ComparisonSpec("a", "levenshtein", 1), ComparisonSpec("b", "levenshtein", 2)),
      graft.blocking.BlockingRule.parse("l.a = r.a"), u,
      initialLambda = 0.5)
    // within-block pairs are true duplicates: m should concentrate on gamma 1 (typo) over 0
    assert(m("b")(1) > 0.5, s"m=${m("b").mkString(",")}")
    assert(lambda > 0.5)
  }

  test("EM driver-side and distributed paths produce identical estimates") {
    val rows = (0 until 30).flatMap { i =>
      val base = f"name$i%03d"
      Seq((s"u${i}_a", base, s"city$i", i % 3), (s"u${i}_b", base, s"city${i}x", i % 3))
    }
    val df = rows.toDF("id", "a", "b", "blk")
    val specs = Seq(ComparisonSpec("a", "levenshtein", 1), ComparisonSpec("b", "levenshtein", 2))
    val u = Map("a" -> Array(0.9, 0.05, 0.05), "b" -> Array(0.9, 0.05, 0.05))
    val rule = graft.blocking.BlockingRule.parse("l.blk = r.blk")
    val driver = Estimation.emTrain(df, "id", specs, rule, u, initialLambda = 0.5)
    // maxDriverPatterns = 0 forces the distributed per-iteration aggregation path
    val dist = Estimation.emTrain(df, "id", specs, rule, u, initialLambda = 0.5,
      maxDriverPatterns = 0L)
    assert(math.abs(driver._1 - dist._1) < 1e-9)
    specs.foreach { s =>
      (0 until s.numLevels).foreach { g =>
        assert(math.abs(driver._2(s.column)(g) - dist._2(s.column)(g)) < 1e-9,
          s"m ${s.column} $g")
        assert(math.abs(driver._3(s.column)(g) - dist._3(s.column)(g)) < 1e-9,
          s"u ${s.column} $g")
      }
    }
  }

  test("EM single-iteration update matches the closed form at double precision") {
    // 5 records, 2 blocks, 4 pairs → agreement patterns (γa,γb): (2,2)×1, (0,0)×2,
    // (2,1)×1. The expected values below are the Fellegi–Sunter EM equations written
    // out independently (E-step responsibilities from the INITIAL parameters, M-step
    // count-weighted refits) — not a re-run of the implementation. One iteration
    // exactly: tol = 0 never converges early, maxIter = 1 stops after the update.
    val df = Seq(
      ("1", "x", "aa", "pp"), ("2", "x", "aa", "pp"), ("3", "x", "zz", "qq"),
      ("4", "y", "mm", "rr"), ("5", "y", "mm", "rs")).toDF("id", "blk", "a", "b")
    val specs = Seq(ComparisonSpec("a", "levenshtein", 1), ComparisonSpec("b", "levenshtein", 1))
    val u0 = Map("a" -> Array(0.7, 0.2, 0.1), "b" -> Array(0.6, 0.3, 0.1))
    val lambda0 = 0.25
    val (lambda1, m1, u1) = Estimation.emTrain(df, "id", specs,
      graft.blocking.BlockingRule.parse("l.blk = r.blk"), u0, lambda0,
      tol = 0.0, maxIter = 1)

    // E-step: w(γ) = λ·∏m0[γ] / (λ·∏m0[γ] + (1−λ)·∏u0[γ]), m0 = DefaultM (.1,.3,.6)
    val w22 = lambda0 * 0.6 * 0.6 / (lambda0 * 0.6 * 0.6 + 0.75 * 0.1 * 0.1)
    val w00 = lambda0 * 0.1 * 0.1 / (lambda0 * 0.1 * 0.1 + 0.75 * 0.7 * 0.6)
    val w21 = lambda0 * 0.6 * 0.3 / (lambda0 * 0.6 * 0.3 + 0.75 * 0.1 * 0.3)
    val floor = 1e-9

    // M-step, column a: γ2 from patterns (2,2)+(2,1), γ0 from (0,0)×2, γ1 empty→floor
    val mTotA = w22 + w21 + 2 * w00
    val uTotA = (1 - w22) + (1 - w21) + 2 * (1 - w00)
    val expM_a = Array(2 * w00 / mTotA, floor, (w22 + w21) / mTotA)
    val expU_a = Array(2 * (1 - w00) / uTotA, floor, ((1 - w22) + (1 - w21)) / uTotA)
    // column b: γ2 from (2,2), γ1 from (2,1), γ0 from (0,0)×2
    val mTotB = w22 + w21 + 2 * w00
    val uTotB = (1 - w22) + (1 - w21) + 2 * (1 - w00)
    val expM_b = Array(2 * w00 / mTotB, w21 / mTotB, w22 / mTotB)
    val expU_b = Array(2 * (1 - w00) / uTotB, (1 - w21) / uTotB, (1 - w22) / uTotB)
    val expLambda = (w22 + 2 * w00 + w21) / 4.0

    assert(math.abs(lambda1 - expLambda) < 1e-12, s"lambda $lambda1 vs $expLambda")
    Seq(("a", expM_a, expU_a), ("b", expM_b, expU_b)).foreach { case (c, em, eu) =>
      (0 until 3).foreach { g =>
        assert(math.abs(m1(c)(g) - em(g)) < 1e-12, s"m($c)($g)=${m1(c)(g)} vs ${em(g)}")
        assert(math.abs(u1(c)(g) - eu(g)) < 1e-12, s"u($c)($g)=${u1(c)(g)} vs ${eu(g)}")
      }
    }
  }

  test("u-estimation approximates value-frequency collision rates") {
    val df = (0 until 400).map(i => (i.toString, s"v${i % 4}")).toDF("id", "c")
    val u = Estimation.estimateU(df, "id", Seq(ComparisonSpec("c", "levenshtein", 0)), 4000)
    // P(exact match of uniform 4-valued col) = 0.25
    assert(math.abs(u("c")(2) - 0.25) < 0.05, u("c").mkString(","))
  }

  test("u-estimation pre-samples large tables without changing the estimate") {
    // targetPairs ≪ rows triggers the seeded pre-sample (no full-table sort); the
    // estimator must stay a collision-rate estimate and be run-to-run deterministic
    val df = (0 until 5000).map(i => (i.toString, s"v${i % 4}")).toDF("id", "c")
    val spec = Seq(ComparisonSpec("c", "levenshtein", 0))
    val u1 = Estimation.estimateU(df, "id", spec, targetPairs = 500)
    val u2 = Estimation.estimateU(df, "id", spec, targetPairs = 500)
    assert(math.abs(u1("c")(2) - 0.25) < 0.1, u1("c").mkString(","))
    assert(u1("c").sameElements(u2("c")))
  }

  test("rule generation end-to-end produces plausibly-ordered candidate rules") {
    // low-cardinality attributes: the reference's prune threshold (0.2·N/partitions)
    // drops any block smaller than ~20%/P of rows, so only chunky blocks survive
    val df = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(col("c_mktsegment"),
        (col("c_custkey") % 2).cast("string").as("p2"),
        (col("c_custkey") % 3).cast("string").as("p3"))
      // prune threshold is 0.2·N/P and applies progressively at partial-map merges, so
      // a key only survives if each partial (partition × bucket cell, ~N/P² rows) already
      // clears it — with P=2 only the 2-valued p2 column does
      .repartition(2)
    val rules = RuleGen.generateBlockingRules(df, 1, 2, Seq("c_mktsegment", "p2", "p3"))
    val collected = rules.collect()
    assert(collected.length > 0)
    assert(collected.forall(_.getString(0).contains("l.")))
    val parsed = BlockingRule.parse(collected.head.getString(0))
    assert(parsed.branches.nonEmpty)
  }

  test("model JSON round-trip") {
    val model = TrainedModel(0.01,
      Seq(ComparisonSpec("a", "jaro_winkler", 0.9), ComparisonSpec("b", "levenshtein", 2)),
      Map("a" -> ColumnParams(Array(0.1, 0.2, 0.7), Array(0.8, 0.15, 0.05)),
        "b" -> ColumnParams(Array(0.2, 0.2, 0.6), Array(0.9, 0.05, 0.05))),
      Seq("(l.a = r.a) OR (l.b = r.b)"))
    val back = TrainedModel.fromJson(model.toJson)
    assert(back.lambda === model.lambda)
    assert(back.comparisons === model.comparisons)
    assert(back.blockingRules === model.blockingRules)
    assert(back.params("a").m.toSeq === model.params("a").m.toSeq)
    assert(back.params("b").u.toSeq === model.params("b").u.toSeq)
  }

  test("sorted neighborhood: positions are the dense sort order; pairs ≡ brute-force window") {
    import graft.blocking.SortedNeighborhood
    import org.apache.spark.sql.functions.col
    // shared 2-char prefix on most keys exercises the skewed-bucket path
    val rows = Seq(("smith", 3L), ("smyth", 1L), ("smith", 7L), ("adams", 9L),
      ("smoke", 2L), ("zzz", 4L), ("smith", 5L))
    val df = rows.toDF("k", "id")
    val ranked = SortedNeighborhood.rank(df, col("k"), col("id"))
      .select("k", "id", "position").as[(String, Long, Long)].collect()
      .sortBy(_._3)
    val expOrder = rows.sortBy(identity).zipWithIndex
      .map { case ((k, id), i) => (k, id, i + 1L) }
    assert(ranked.toSeq === expOrder)

    val w = 4
    val got = SortedNeighborhood.pairs(df, col("k"), col("id"), w)
      .select("id_l", "id_r", "distance").as[(String, String, Long)].collect().toSet
    val brute = (for {
      (a, i) <- expOrder.zipWithIndex; (b, j) <- expOrder.zipWithIndex
      if j > i && j - i <= w - 1
    } yield (a._2.toString, b._2.toString, (j - i).toLong)).toSet
    assert(got === brute)
    val n = rows.size
    assert(got.size === (w - 1) * n - (w - 1) * w / 2)
  }

  test("phonetic key: classic soundex examples; documented H/W divergence; no-letter null") {
    import graft.compare.Phonetic.phoneticKey
    import org.apache.spark.sql.functions.col
    val got = Seq("Robert", "Rupert", "Pfeiffer", "Tymczak", "Ashcraft", "ash-CRAFT",
        "R2D2", "42", "", "Lee")
      .toDF("w").select(col("w"), phoneticKey(col("w"))).as[(String, String)]
      .collect().toMap
    assert(got("Robert") === "R163" && got("Rupert") === "R163") // classic match
    assert(got("Pfeiffer") === "P160")
    assert(got("Tymczak") === "T522")
    // simplified spec: H/W-transparency omitted (classic soundex gives A261)
    assert(got("Ashcraft") === "A226")
    assert(got("ash-CRAFT") === "A226") // case/punctuation invariant
    assert(got("R2D2") === "R300") // digits stripped before coding
    assert(got("42") === null && got("") === null)
    assert(got("Lee") === "L000") // all-vowel tail pads out
  }

  test("sorted neighborhood: null sort keys fail loudly") {
    import graft.blocking.SortedNeighborhood
    import org.apache.spark.sql.functions.col
    val df = Seq(("a", 1L), (null, 2L)).toDF("k", "id")
    val e = intercept[IllegalArgumentException] {
      SortedNeighborhood.rank(df, col("k"), col("id")).collect()
    }
    assert(e.getMessage.contains("null sort keys"))
  }
}
