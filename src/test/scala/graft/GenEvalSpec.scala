package graft

import org.apache.spark.sql.functions._

import graft.metrics.GenEval

class GenEvalSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Int, String, String)*) =
    rows.toDF("pair_id", "cand", "ref")

  test("clippedNgramStats: multiset min counts, totals, zero-grid rows") {
    val st = GenEval
      .clippedNgramStats(pairs((1, "a b a c", "a a d")), col("pair_id"),
        col("cand"), col("ref"), Seq(1, 2))
      .orderBy("n")
      .as[(Int, Int, Long, Long, Long)].collect()
    // n=1: cand {a:2,b:1,c:1} vs ref {a:2,d:1} -> matched min(2,2)=2
    assert(st(0) === ((1, 1, 2L, 4L, 3L)))
    // n=2: no shared bigrams
    assert(st(1) === ((1, 2, 0L, 3L, 2L)))
  }

  test("clippedNgramStats: empty side gets explicit zeros") {
    val st = GenEval
      .clippedNgramStats(pairs((7, "", "a b")), col("pair_id"), col("cand"),
        col("ref"), Seq(1))
      .as[(Int, Int, Long, Long, Long)].collect()
    assert(st.toSeq === Seq((7, 1, 0L, 0L, 2L)))
  }

  test("bleu: clipping example, self-pair, and no-overlap zero") {
    val df = pairs(
      (1, "the the the the the the the", "the cat is on the mat"),
      (2, "x y z w", "x y z w"),
      (3, "p q", "r s"))
    val out = GenEval.bleu(df, col("pair_id"), col("cand"), col("ref"))
      .orderBy("pair_id")
      .as[(Int, Long, Long, Double, Double)].collect()
    // pair 1 (Papineni clipping example): p1=2/7, smoothed p2=1/7, p3=1/6, p4=1/5;
    // cand_len 7 >= ref_len 6 -> bp = 1
    val expected =
      math.exp((math.log(2.0 / 7) + math.log(1.0 / 7) +
        math.log(1.0 / 6) + math.log(1.0 / 5)) / 4)
    assert(out(0)._2 === 7L && out(0)._3 === 6L && out(0)._4 === 1.0)
    assert(math.abs(out(0)._5 - expected) < 1e-12)
    // identical pair: every precision 1 -> bleu exactly 1
    assert(out(1)._5 === 1.0)
    // zero unigram overlap -> forced 0 despite smoothing
    assert(out(2)._5 === 0.0)
  }

  test("bleu: brevity penalty when the candidate is shorter") {
    val out = GenEval.bleu(pairs((1, "a b", "a b c d")), col("pair_id"),
        col("cand"), col("ref"))
      .as[(Int, Long, Long, Double, Double)].head()
    assert(math.abs(out._4 - math.exp(1.0 - 4.0 / 2.0)) < 1e-12)
  }

  test("corpusBleu: counts summed before the formula; zero-order forces 0") {
    import graft.metrics.GenEval
    // group g: two pairs whose POOLED counts differ from any per-pair mean:
    // pair1 contributes bigram matches, pair2 only unigrams
    val df = Seq(
      ("g", "a b c d", "a b c d"),
      ("g", "x q", "q z"),
      ("h", "p p", "r s")) // zero unigram matches -> bleu 0
      .toDF("lang", "cand", "ref")
    val out = GenEval.corpusBleu(df, col("lang"), col("cand"), col("ref"))
      .orderBy("group")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val g = out(0)
    assert((g._2, g._3, g._4) === ((2L, 6L, 6L))) // 2 pairs, 4+2 tokens each side
    // pooled: p1=5/6, p2=3/4, p3=2/2, p4=1/1 (pair2 has no 3/4-grams); bp=1
    val expected = math.exp((math.log(5.0 / 6) + math.log(3.0 / 4)) / 4)
    assert(g._5 === 1.0 && math.abs(g._6 - expected) < 1e-12)
    assert(out(1)._6 === 0.0)
  }

  test("rougeN: hand-computed precision/recall/F1 and zero-denominator rules") {
    val out = GenEval
      .rougeN(pairs((1, "a b c", "a b d e")), col("pair_id"), col("cand"),
        col("ref"), Seq(1, 2))
      .orderBy("n")
      .as[(Int, Int, Long, Double, Double, Double)].collect()
    // n=1: m=2, p=2/3, r=2/4, f1 = 2*(2/3)*(1/2)/(2/3+1/2) = 4/7
    assert(out(0)._3 === 2L)
    assert(math.abs(out(0)._4 - 2.0 / 3) < 1e-12)
    assert(math.abs(out(0)._5 - 0.5) < 1e-12)
    assert(math.abs(out(0)._6 - 4.0 / 7) < 1e-12)
    // n=2: only "a b" shared: p=1/2, r=1/3, f1=2/5
    assert(math.abs(out(1)._6 - 0.4) < 1e-12)
    val z = GenEval.rougeN(pairs((1, "", "")), col("pair_id"), col("cand"),
        col("ref"), Seq(1))
      .as[(Int, Int, Long, Double, Double, Double)].head()
    assert(z._4 === 0.0 && z._5 === 0.0 && z._6 === 0.0)
  }

  test("chrF: identical pair scores exactly 1; disjoint pair 0") {
    val out = GenEval.chrF(pairs((1, "ab cd", "ab cd"), (2, "aaaa", "bbbb")),
        col("pair_id"), col("cand"), col("ref"))
      .orderBy("pair_id")
      .as[(Int, Double, Double, Double)].collect()
    assert(out(0)._2 === 1.0 && out(0)._3 === 1.0 && out(0)._4 === 1.0)
    assert(out(1)._4 === 0.0)
  }

  test("chrF: whitespace is stripped before gram extraction") {
    // "a b" vs "ab": identical after stripping -> perfect score
    val out = GenEval.chrF(pairs((1, "a b", "ab")), col("pair_id"), col("cand"),
        col("ref"), maxN = 2)
      .as[(Int, Double, Double, Double)].head()
    assert(out._4 === 1.0)
  }

  test("rougeL: classic LCS example, identity, disjoint, empty") {
    val df = pairs(
      (1, "a b c b d a b", "b d c a b a"), // LCS("abcbdab","bdcaba") = 4
      (2, "x y z", "x y z"),
      (3, "p q", "r s"),
      (4, "", "a b"))
    val out = GenEval.rougeL(df, col("pair_id"), col("cand"), col("ref"))
      .orderBy("pair_id")
      .as[(Int, Int, Int, Int, Double, Double, Double)].collect()
    assert(out(0)._2 === 4)
    assert(math.abs(out(0)._5 - 4.0 / 7) < 1e-12)
    assert(math.abs(out(0)._6 - 4.0 / 6) < 1e-12)
    assert(out(1)._2 === 3 && out(1)._7 === 1.0)
    assert(out(2)._2 === 0 && out(2)._7 === 0.0)
    assert(out(3)._2 === 0 && out(3)._3 === 0 && out(3)._5 === 0.0)
  }

  test("rougeL: LCS is order-sensitive where token overlap is not") {
    val out = GenEval.rougeL(pairs((1, "a b c", "c b a")), col("pair_id"),
        col("cand"), col("ref"))
      .as[(Int, Int, Int, Int, Double, Double, Double)].head()
    // any single token is the longest common subsequence
    assert(out._2 === 1)
  }

  test("tokenF1: case-folded EM, multiset overlap F1") {
    val out = GenEval
      .tokenF1(pairs((1, "The cat", "the cat"), (2, "a a b", "a c")),
        col("pair_id"), col("cand"), col("ref"))
      .orderBy("pair_id")
      .as[(Int, Boolean, Long, Double, Double, Double)].collect()
    assert(out(0)._2 && out(0)._6 === 1.0)
    // multiset: cand {a:2,b:1}, ref {a:1,c:1} -> m=1, p=1/3, r=1/2, f1=2/5
    assert(!out(1)._2 && out(1)._3 === 1L)
    assert(math.abs(out(1)._6 - 0.4) < 1e-12)
  }

  test("winRateCi: Wilson interval closed form, zero/all-win bounds stay in [0,1]") {
    import graft.metrics.Preference
    // A beats B 8x, B beats A 2x; C beats D once (n=1 extremes)
    val duels = (Seq.fill(8)(("A", "B")) ++ Seq.fill(2)(("B", "A")) ++
      Seq(("C", "D"))).toDF("winner", "loser")
    val out = Preference.winRateCi(duels, "winner", "loser")
      .orderBy("item")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    val z = 1.959963984540054
    def wilson(wins: Long, n: Long): (Double, Double) = {
      val p = wins.toDouble / n; val z2 = z * z
      val denom = 1.0 + z2 / n
      val c = (p + z2 / (2.0 * n)) / denom
      val h = (z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))) / denom
      (c - h, c + h)
    }
    val a = out(0)
    assert((a._2, a._3) === ((10L, 8L)))
    val (lo, hi) = wilson(8, 10)
    assert(math.abs(a._5 - lo) < 1e-12 && math.abs(a._6 - hi) < 1e-12)
    val c = out(2) // C: 1/1 wins
    assert(c._4 === 1.0 && c._6 <= 1.0 && c._5 > 0.0)
    val d = out(3) // D: 0/1 wins
    assert(d._4 === 0.0 && d._5 >= 0.0 && d._6 < 1.0)
  }

  test("distinctN: ratios per group and n") {
    val df = Seq(("g", "a a b"), ("g", "a b")).toDF("lang", "text")
    val out = GenEval.distinctN(df, col("lang"), col("text"), Seq(1, 2))
      .orderBy("n")
      .as[(String, Int, Long, Long, Double)].collect()
    // unigrams: 5 total, distinct {a,b} = 2
    assert(out(0)._3 === 5L && out(0)._4 === 2L)
    assert(math.abs(out(0)._5 - 0.4) < 1e-12)
    // bigrams: "a a","a b","a b" -> 3 total, 2 distinct
    assert(out(1)._3 === 3L && out(1)._4 === 2L)
  }

  test("CharShingles: strips whitespace, short-string empty, n=1 chars") {
    val df = Seq(Tuple1("ab\tcd"), Tuple1("x")).toDF("s")
    val g2 = df.select(GenEval.charGrams(col("s"), 2).as("g"))
      .as[Seq[String]].collect()
    assert(g2(0) === Seq("ab", "bc", "cd"))
    assert(g2(1) === Seq.empty)
    val g1 = df.select(GenEval.charGrams(col("s"), 1).as("g"))
      .as[Seq[String]].head()
    assert(g1 === Seq("a", "b", "c", "d"))
  }
}
