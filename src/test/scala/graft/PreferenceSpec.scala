package graft

import org.apache.spark.sql.functions._

import graft.metrics.Preference

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def duelDf(rows: (String, String)*) = rows.toDF("winner", "loser")

  test("winRates: canonical unordered pairs with hand-computed counts") {
    val df = duelDf(("a", "b"), ("a", "b"), ("b", "a"), ("c", "a"), ("a", "a"))
    val out = Preference.winRates(df, "winner", "loser")
      .orderBy("item_a", "item_b").collect()
    // (a,b): 3 games, a wins 2; (a,c): 1 game, a wins 0; self-pair dropped
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq ===
      Seq(("a", "b", 3L, 2L, 1L), ("a", "c", 1L, 0L, 1L)))
    assert(out(0).getDouble(5) === 2.0 / 3.0)
  }

  test("btScores: two-player closed form — strength ratio equals win ratio (eps=0)") {
    // For 2 players the BT MLE satisfies s_a/s_b = w_a/w_b exactly; with
    // sum-normalization to N=2: s_a = 2·w_a/(w_a+w_b)
    val df = duelDf(Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")): _*)
    val s = Preference.btScores(df, "winner", "loser", iters = 30, epsilon = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(s("a") - 1.5) < 1e-9, s)
    assert(math.abs(s("b") - 0.5) < 1e-9, s)
  }

  test("btScores: symmetric records give equal scores; sum-normalization holds") {
    val df = duelDf(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"), ("c", "a"))
    val out = Preference.btScores(df, "winner", "loser", iters = 10).collect()
    out.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
    assert(math.abs(out.map(_.getDouble(1)).sum - 3.0) < 1e-9)
  }

  test("btScores: planted strength ordering recovered; zero-win item stays positive") {
    // round-robin where a beats everyone, b beats c and d, c beats d; d never wins
    val df = duelDf(
      ("a", "b"), ("a", "b"), ("a", "c"), ("a", "c"), ("a", "d"),
      ("b", "c"), ("b", "d"), ("b", "d"), ("c", "d"))
    val s = Preference.btScores(df, "winner", "loser", iters = 25)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s("a") > s("b") && s("b") > s("c") && s("c") > s("d"), s)
    assert(s("d") > 0.0)
    assert(math.abs(s.values.sum - 4.0) < 1e-9)
  }

  test("btScores: distributed loop (cap=0) matches the driver-local fast path") {
    val df = duelDf((1 to 40).map(i =>
      (s"m${i % 5}", s"m${(i * 3 + 1) % 5}")).filter(p => p._1 != p._2): _*)
    val local = Preference.btScores(df, "winner", "loser", iters = 6)
      .orderBy("item").collect().toSeq
    val dist = Preference.btScores(df, "winner", "loser", iters = 6,
      localMatrixCap = 0L).orderBy("item").collect().toSeq
    assert(local.map(_.getString(0)) === dist.map(_.getString(0)))
    local.zip(dist).foreach { case (x, y) =>
      assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-9)
    }
  }

  test("btScores: deterministic across runs and partitionings") {
    val df = duelDf((1 to 60).map(i =>
      (s"m${i % 7}", s"m${(i * 3 + 1) % 7}")).filter(p => p._1 != p._2): _*)
    val r1 = Preference.btScores(df, "winner", "loser", iters = 8)
      .orderBy("item").collect().toSeq
    val r2 = Preference.btScores(df.repartition(13), "winner", "loser", iters = 8)
      .orderBy("item").collect().toSeq
    assert(r1.map(_.getString(0)) === r2.map(_.getString(0)))
    r1.zip(r2).foreach { case (x, y) =>
      assert(math.abs(x.getDouble(1) - y.getDouble(1)) < 1e-9)
    }
  }
}
