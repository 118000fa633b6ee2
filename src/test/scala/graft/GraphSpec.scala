package graft

import org.apache.spark.sql.functions._

import graft.cluster.PageRank

/** Pins for PageRank: mass conservation, agreement with a dense driver reference,
  * dangling redistribution, and partitioning invariance.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Dense reference implementation of the identical update equation. */
  private def reference(
      edges: Seq[(String, String)], d: Double, iters: Int): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length
    val idx = nodes.zipWithIndex.toMap
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var rank = Array.fill(n)(1.0 / n)
    (1 to iters).foreach { _ =>
      val dangling = nodes.zipWithIndex
        .filterNot { case (v, _) => out.contains(v) }.map { case (_, i) => rank(i) }.sum
      val next = Array.fill(n)((1.0 - d) / n + d * dangling / n)
      edges.foreach { case (u, v) =>
        next(idx(v)) += d * rank(idx(u)) / out(u) / 1.0
      }
      rank = next
    }
    nodes.zipWithIndex.map { case (v, i) => v -> rank(i) }.toMap
  }

  private val fixture = Seq(
    ("a", "b"), ("b", "a"), ("c", "a"), ("c", "b"), ("a", "d"))
  // d is dangling (no out-edges)

  test("rank mass sums to 1 at every iteration (dangling mass redistributed)") {
    Seq(1, 3, 7).foreach { iters =>
      val total = PageRank.pageRank(fixture.toDF("src", "dst"), 0.85, iters)
        .agg(sum("rank")).as[Double].head()
      assert(math.abs(total - 1.0) < 1e-9, s"iters=$iters total=$total")
    }
  }

  test("matches the dense driver reference on a random graph (10 iterations)") {
    val rnd = new scala.util.Random(23)
    val edges = (0 until 120).map(_ => (s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
    val got = PageRank.pageRank(edges.toDF("src", "dst"), 0.85, 10)
      .as[(String, Double)].collect().toMap
    val expect = reference(edges, 0.85, 10)
    assert(got.keySet === expect.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - expect(v)) < 1e-9, s"node $v: $r vs ${expect(v)}")
    }
  }

  test("authority flows: the sink of a star graph outranks its spokes") {
    val star = (1 to 10).map(i => (s"spoke$i", "hub")) :+ (("hub", "spoke1"))
    val ranks = PageRank.pageRank(star.toDF("src", "dst"), 0.85, 15)
      .as[(String, Double)].collect().toMap
    assert(ranks("hub") > ranks("spoke2") * 5, s"hub=${ranks("hub")} spoke2=${ranks("spoke2")}")
    // spoke1 receives the hub's whole out-mass, so it beats the other spokes
    assert(ranks("spoke1") > ranks("spoke2"))
  }

  test("result is invariant to input partitioning (round-6)") {
    val df = fixture.toDF("src", "dst")
    val a = PageRank.pageRank(df, 0.85, 8)
      .select(col("node"), round(col("rank"), 6).as("r")).collect().toSeq
    val b = PageRank.pageRank(df.repartition(7), 0.85, 8)
      .select(col("node"), round(col("rank"), 6).as("r")).collect().toSeq
    assert(a.sortBy(_.getString(0)).map(_.toSeq) === b.sortBy(_.getString(0)).map(_.toSeq))
  }

  // ---- label propagation ----------------------------------------------------

  test("LPA: planted two-clique fixture resolves to exactly its two communities") {
    val cliqueA = Seq("a1", "a2", "a3", "a4").combinations(2).map(p => (p(0), p(1))).toSeq
    val cliqueB = Seq("b1", "b2", "b3", "b4").combinations(2).map(p => (p(0), p(1))).toSeq
    val out = graft.cluster.LabelPropagation.run((cliqueA ++ cliqueB).toDF("src", "dst"), 5)
      .as[(String, String)].collect().toMap
    assert(out.keySet === Set("a1", "a2", "a3", "a4", "b1", "b2", "b3", "b4"))
    assert(Set("a1", "a2", "a3", "a4").map(out).size === 1, "clique A must share one label")
    assert(Set("b1", "b2", "b3", "b4").map(out).size === 1, "clique B must share one label")
    assert(out("a1") !== out("b1"), "disconnected cliques must get distinct labels")
  }

  test("LPA: every node gets exactly one label (valid partition) and result is " +
      "invariant to input partitioning") {
    val edges = (0 until 60).map(i => (s"n$i", s"n${(i * 7 + 1) % 60}"))
    val a = graft.cluster.LabelPropagation.run(edges.toDF("src", "dst"), 4)
      .as[(String, String)].collect().sorted.toSeq
    assert(a.map(_._1).distinct.size === a.size, "one label per node")
    val b = graft.cluster.LabelPropagation.run(edges.toDF("src", "dst").repartition(7), 4)
      .as[(String, String)].collect().sorted.toSeq
    assert(a === b)
  }

  test("LPA: one iteration from identity labels is min-neighbor (hand fixture)") {
    // undirected star a-(b,c,d): after one sync iteration a takes min(b,c,d)=b;
    // b,c,d each have sole neighbor a
    val out = graft.cluster.LabelPropagation
      .run(Seq(("a", "b"), ("a", "c"), ("a", "d")).toDF("src", "dst"), 1)
      .as[(String, String)].collect().toMap
    assert(out === Map("a" -> "b", "b" -> "a", "c" -> "a", "d" -> "a"))
  }

  // ---- personalized PageRank + degree stats ---------------------------------

  test("personalized PageRank: mass sums to 1, unreachable components get 0") {
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "d")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r = graft.cluster.PageRank.personalizedPageRank(edges, seeds, 0.85, 8)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r("c") === 0.0 && r("d") === 0.0, "nodes unreachable from the seed must be 0")
    assert(r("a") > r("b"), "the teleport target holds more mass than its neighbor")
  }

  test("personalized PageRank: seeds outside the graph are ignored; empty seed set rejected") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    val r = graft.cluster.PageRank
      .personalizedPageRank(edges, Seq("a", "zzz").toDF("node"), 0.85, 3)
      .as[(String, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    intercept[IllegalArgumentException] {
      graft.cluster.PageRank.personalizedPageRank(edges, Seq("zzz").toDF("node"), 0.85, 3)
    }
  }

  test("degree stats: hand-checked degrees and flags, multi-edges counted") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "c")).toDF("src", "dst")
    val r = graft.cluster.PageRank.degreeStats(edges)
      .as[(String, Long, Long, Long, Boolean, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    assert(r("a") === (("a", 0L, 2L, 2L, false, true)))
    assert(r("b") === (("b", 2L, 1L, 3L, false, false)))
    assert(r("c") === (("c", 1L, 0L, 1L, true, false)))
  }

  test("HITS: directory graph separates hub and authority roles; norms are 1") {
    // h1,h2 are pure hubs (point at everything, nothing points at them);
    // p1..p3 are pure authorities
    val edges = (for (h <- Seq("h1", "h2"); p <- Seq("p1", "p2", "p3")) yield (h, p))
      .toDF("src", "dst")
    val r = graft.cluster.PageRank.hits(edges, 6)
      .as[(String, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    Seq("h1", "h2").foreach { h =>
      assert(r(h)._1 > 0.5 && r(h)._2 === 0.0, s"$h must be a pure hub: ${r(h)}")
    }
    Seq("p1", "p2", "p3").foreach { p =>
      assert(r(p)._2 > 0.4 && r(p)._1 === 0.0, s"$p must be a pure authority: ${r(p)}")
    }
    val hubNorm = math.sqrt(r.values.map(_._1).map(x => x * x).sum)
    val authNorm = math.sqrt(r.values.map(_._2).map(x => x * x).sum)
    assert(math.abs(hubNorm - 1.0) < 1e-9 && math.abs(authNorm - 1.0) < 1e-9)
  }

  test("HITS: result is invariant to input partitioning") {
    val edges = (0 until 60).map(i => (s"n$i", s"n${(i * 7 + 1) % 60}"))
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.cluster.PageRank.hits(df, 5)
        .select(col("node"), round(col("hub"), 9), round(col("authority"), 9))
        .as[(String, Double, Double)].collect().sorted.toSeq
    assert(run(edges.toDF("src", "dst")) === run(edges.toDF("src", "dst").repartition(7)))
  }

  // ---- triangles ------------------------------------------------------------

  test("triangles: K4 gives every node 3 triangles and coefficient 1; paths give 0") {
    val k4 = Seq("a", "b", "c", "d").combinations(2).map(p => (p(0), p(1))).toSeq
    val path = Seq(("p", "q"), ("q", "r"))
    val r = graft.cluster.Triangles.nodeTriangles((k4 ++ path).toDF("src", "dst"))
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    Seq("a", "b", "c", "d").foreach { n =>
      assert(r(n) === ((n, 3L, 3L, 1.0)), s"$n: ${r(n)}")
    }
    assert(r("p") === (("p", 1L, 0L, 0.0)))
    assert(r("q") === (("q", 2L, 0L, 0.0)))
    assert(graft.cluster.Triangles.totalTriangles((k4 ++ path).toDF("src", "dst")) === 4L)
  }

  test("triangles: degree-oriented count equals brute-force all-triples on a random graph") {
    val rnd = new scala.util.Random(13)
    val edges = (0 until 120).map(_ => (s"n${rnd.nextInt(18)}", s"n${rnd.nextInt(18)}"))
      .filter { case (a, b) => a != b }
    // brute force: distinct undirected edge set, count closed triples
    val und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val eset = und.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val expTotal = nodes.combinations(3).count { case Seq(x, y, z) =>
      eset((x, y)) && eset((y, z)) && eset((x, z))
    }
    assert(graft.cluster.Triangles.totalTriangles(edges.toDF("src", "dst")) === expTotal.toLong)
    // duplicate + reversed edges must not change anything
    val doubled = edges ++ edges.map(_.swap)
    assert(graft.cluster.Triangles.totalTriangles(doubled.toDF("src", "dst")) === expTotal.toLong)
  }

  // ---- link prediction ------------------------------------------------------

  test("link prediction: path and K4 closed forms") {
    import graft.cluster.LinkPrediction
    // path a-b-c: only candidate (a,c) through b (deg 2)
    val path = LinkPrediction.scores(Seq(("a", "b"), ("b", "c")).toDF("src", "dst"))
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(path === Seq(("a", "c", 1L,
      1.0, BigDecimal(1.0 / math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // K4: every pair is an edge -> nothing to predict
    val k4 = Seq("a", "b", "c", "d").combinations(2).map(p => (p(0), p(1))).toSeq
    assert(LinkPrediction.scores(k4.toDF("src", "dst")).count() === 0L)
    // with existing pairs kept: (a,b) shares {c,d}, jaccard 2/(3+3-2)
    val kept = LinkPrediction.scores(k4.toDF("src", "dst"), excludeExisting = false)
      .filter(col("a") === "a" && col("b") === "b")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(kept.head._3 === 2L)
    assert(kept.head._4 === 0.5)
  }

  test("link prediction: wedge-join scores equal brute-force set arithmetic") {
    import graft.cluster.LinkPrediction
    val rnd = new scala.util.Random(29)
    val edges = (0 until 140).map(_ => (s"n${rnd.nextInt(20)}", s"n${rnd.nextInt(20)}"))
      .filter { case (a, b) => a != b }
    val und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val nbrs = (und.map(e => e._1 -> e._2) ++ und.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val eset = und.toSet
    val exp = nbrs.keys.toSeq.sorted.combinations(2).flatMap { case Seq(x, y) =>
      val cn = nbrs(x) & nbrs(y)
      if (cn.isEmpty || eset((x, y))) None
      else Some((x, y, cn.size.toLong,
        BigDecimal(cn.size.toDouble / (nbrs(x).size + nbrs(y).size - cn.size))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(cn.toSeq.map(z => 1.0 / math.log(nbrs(z).size)).sum)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toSeq.sorted
    val got = LinkPrediction.scores(edges.toDF("src", "dst"))
      .as[(String, String, Long, Double, Double)].collect().toSeq.sorted
    assert(got === exp)
  }

  // ---- k-core ---------------------------------------------------------------

  test("k-core: K4 plus a pendant path — 3-core is exactly the K4") {
    import graft.cluster.KCore
    val k4 = Seq("a", "b", "c", "d").combinations(2).map(p => (p(0), p(1))).toSeq
    val tail = Seq(("d", "e"), ("e", "f")) // pendant path peels away
    val df = (k4 ++ tail).toDF("src", "dst")
    val core3 = KCore.kCore(df, 3).as[(String, Long)].collect().toMap
    assert(core3 === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
    // 2-core: the path still peels (e,f have degree <= 2 but f has 1 -> cascade)
    val core2 = KCore.kCore(df, 2).as[(String, Long)].collect().toMap
    assert(core2.keySet === Set("a", "b", "c", "d"))
    // a 4-core does not exist in K4 (max degree 3) -> empty
    assert(KCore.kCore(df, 4).count() === 0L)
  }

  test("k-core: fixpoint equals brute-force peel on a random graph; degrees >= k") {
    import graft.cluster.KCore
    val rnd = new scala.util.Random(41)
    val edges = (0 until 150).map(_ => (s"n${rnd.nextInt(24)}", s"n${rnd.nextInt(24)}"))
      .filter { case (a, b) => a != b }
    // driver-side peel to fixpoint
    var und = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    var changed = true
    while (changed) {
      val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 3).keySet
      val nxt = und.filter(e => keep(e._1) && keep(e._2))
      changed = nxt.size != und.size
      und = nxt
    }
    val expDeg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val got = KCore.kCore(edges.toDF("src", "dst"), 3).as[(String, Long)].collect().toMap
    assert(got === expDeg)
    assert(got.values.forall(_ >= 3L))
  }

  test("k-core: peel(iters) is the truncated loop — one round keeps what fixpoint drops") {
    import graft.cluster.KCore
    // chain a-b-c-d-e: every interior node has degree 2; one 2-core peel drops
    // only the endpoints, the fixpoint drops everything
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")).toDF("src", "dst")
    val one = KCore.peel(chain, 2, 1).as[(String, Long)].collect().toMap
    assert(one.keySet === Set("b", "c", "d"))
    assert(KCore.kCore(chain, 2).count() === 0L)
  }

  test("link prediction: maxWedgeDegree drops hub-mediated evidence only") {
    import graft.cluster.LinkPrediction
    // hub h connects x1..x5; separate wedge a-m-b (deg(m)=2)
    val hub = (1 to 5).map(i => ("h", s"x$i"))
    val side = Seq(("a", "m"), ("m", "b"))
    val df = (hub ++ side).toDF("src", "dst")
    val capped = LinkPrediction.scores(df, maxWedgeDegree = 2)
      .as[(String, String, Long, Double, Double)].collect().toSeq
    // all x-x pairs went through h (deg 5 > cap) -> gone; a-b survives
    assert(capped.map(t => (t._1, t._2)) === Seq(("a", "b")))
  }

  test("two-hop reach: path fixture hand-computed; relay cap stops hub-mediated reach only") {
    import graft.cluster.Neighborhood
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = Neighborhood.twoHopReach(path).as[(String, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got === Seq(("a", 1L, 2L), ("b", 2L, 3L), ("c", 2L, 3L), ("d", 1L, 2L)))
    // hub h-x1..x5, cap 2: hub stops relaying, so each spoke sees only the hub;
    // spokes (deg 1) still relay, which adds nothing new for the hub
    val hub = (1 to 5).map(i => ("h", s"x$i")).toDF("src", "dst")
    val capped = Neighborhood.twoHopReach(hub, maxDegree = Some(2))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(capped.head === (("h", 5L, 5L)))
    assert(capped.tail.forall(r => r._2 === 1L && r._3 === 1L))
    // uncapped, the spokes reach everything
    val exact = Neighborhood.twoHopReach(hub).as[(String, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(exact.tail.forall(_._3 === 5L))
  }

  test("community metrics: two bridged triangles — hand-computed cut/volume/modularity") {
    import graft.cluster.CommunityMetrics
    val triA = Seq(("a1", "a2"), ("a2", "a3"), ("a3", "a1"))
    val triB = Seq(("b1", "b2"), ("b2", "b3"), ("b3", "b1"))
    val edges = (triA ++ triB :+ ("a1" -> "b1")).toDF("src", "dst")
    val labels = Seq("a1" -> "A", "a2" -> "A", "a3" -> "A",
      "b1" -> "B", "b2" -> "B", "b3" -> "B").toDF("node", "label")
    val q = CommunityMetrics.communityQuality(edges, labels).orderBy("community")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // each side: 3 nodes, 3 internal edges, the 1 bridge cut, volume 7 (bridge
    // endpoint has degree 3); conductance = 1 / min(7, 14-7)
    assert(q === Seq(("A", 3L, 3L, 1L, 7L, 0.142857), ("B", 3L, 3L, 1L, 7L, 0.142857)))
    val m = CommunityMetrics.modularity(edges, labels)
      .as[(Long, Long, Double, Double)].collect().head
    // m=7, coverage 6/7, Q = 2 * (3/7 - (7/14)^2)
    assert(m === ((2L, 7L, 0.857143, 0.357143)))
  }

  test("community metrics: one community is modularity 0; empty complement guards conductance") {
    import graft.cluster.CommunityMetrics
    // duplicate + reversed edges canonicalize away
    val tri = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "b"))
      .toDF("src", "dst")
    val labels = Seq("a" -> "X", "b" -> "X", "c" -> "X").toDF("node", "label")
    val q = CommunityMetrics.communityQuality(tri, labels)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(q === Seq(("X", 3L, 3L, 0L, 6L, 0.0)))
    val m = CommunityMetrics.modularity(tri, labels)
      .as[(Long, Long, Double, Double)].collect().head
    assert(m === ((1L, 3L, 1.0, 0.0)))
  }
}
