package graft

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.expressions.{CombinatorialCountAgg, CountMapSerde, EntropyAgg, JaroWinkler}

/** Property-based pins (scalacheck) for the algebraic invariants the distributed
  * aggregates rely on: merge commutativity/associativity, serde round-trip, entropy
  * bounds, combination cardinalities.
  */
class PropertySpec extends SparkSpec {

  private def check(name: String, prop: Prop, minOk: Int = 200): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minOk), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val countMapGen: Gen[Map[String, Long]] =
    Gen.mapOf(Gen.zip(Gen.alphaStr.map(_.take(8)), Gen.choose(1L, 1000L)))

  test("count-map merge is commutative and associative (threshold 0)") {
    val agg = CombinatorialCountAgg(Seq.empty, Seq.empty, 1, threshold = 0L)
    def m(x: Map[String, Long]): mutable.Map[String, Long] = mutable.HashMap(x.toSeq: _*)
    check("commutative", Prop.forAll(countMapGen, countMapGen) { (a, b) =>
      agg.merge(m(a), m(b)).toMap == agg.merge(m(b), m(a)).toMap
    })
    check("associative", Prop.forAll(countMapGen, countMapGen, countMapGen) { (a, b, c) =>
      agg.merge(agg.merge(m(a), m(b)), m(c)).toMap ==
        agg.merge(m(a), agg.merge(m(b), m(c))).toMap
    })
  }

  test("count-map serde round-trips") {
    check("serde", Prop.forAll(countMapGen) { a =>
      CountMapSerde.read(CountMapSerde.write(mutable.HashMap(a.toSeq: _*))).toMap == a
    })
  }

  test("sqlDouble renders every finite double to a literal that parses back bit-exactly") {
    // the oracle-SQL contract: DuckDB parses the decimal literal to the nearest
    // IEEE double, so Java parsing the same string must recover the same bits
    val doubles: Gen[Double] = Gen.oneOf(
      Gen.choose(-1e300, 1e300),
      Gen.choose(-1.0, 1.0),
      Gen.choose(-1e-300, 1e-300), // subnormal-adjacent, forces scientific notation
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, Double.MaxValue, 1e-7, -2.5e-13))
    check("round-trip", Prop.forAll(doubles) { x =>
      java.lang.Double.parseDouble(graft.util.Render.sqlDouble(x)) == x
    })
  }

  test("normalizeTs yields the same instants for the long-nanos and NTZ shapes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampNTZType
    // any micros value representable in both shapes must land on the same instant
    // (UTC session) — the invariant the 14 events queries' oracles rely on
    check("shape-equivalence", Prop.forAll(
        Gen.listOfN(20, Gen.choose(0L, 4102444800000000L))) { usList =>
      usList.isEmpty || {
        val asLong = graft.sources.Events.normalizeTs(
          usList.map(_ * 1000L).toDF("ts"))
        val asNtz = graft.sources.Events.normalizeTs(
          usList.toDF("us")
            .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
        asLong.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq ==
          asNtz.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
      }
    }, minOk = 20)
  }

  test("merge-time threshold prune keeps exactly the keys above threshold") {
    val agg = CombinatorialCountAgg(Seq.empty, Seq.empty, 1, threshold = 10L)
    check("prune", Prop.forAll(countMapGen, countMapGen) { (a, b) =>
      val merged = agg.merge(mutable.HashMap(a.toSeq: _*), mutable.HashMap(b.toSeq: _*))
      val expected = (a.keySet ++ b.keySet).flatMap { k =>
        val v = a.getOrElse(k, 0L) + b.getOrElse(k, 0L)
        if (v > 10L) Some(k -> v) else None
      }.toMap
      merged.toMap == expected
    })
  }

  test("entropy is within [0, log10(distinct)/divisor] and 0 for constant columns") {
    val countsGen = Gen.nonEmptyListOf(Gen.choose(1L, 500L))
    check("bounds", Prop.forAll(countsGen) { cs =>
      val m = cs.zipWithIndex.map { case (c, i) => i.toString -> c }.toMap
      val h = EntropyAgg.entropy(m, 0)
      val d = m.size
      val maxH = if (d < 2) 0.0 else if (d == 10) math.log10(d.toDouble) else 1.0 + 1e-9
      h >= -1e-12 && h <= maxH + 1e-9
    })
    assert(EntropyAgg.entropy(Map("only" -> 99L), 0) === 0.0)
  }

  test("combinations cardinality C(n,k) for all k <= n <= 8") {
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    for (n <- 1 to 8; k <- 1 to n) {
      val els = (1 to n).map(i => s"e$i")
      assert(els.combinations(k).size === fact(n) / (fact(k) * fact(n - k)))
    }
  }

  test("repetition stats invariants hold for arbitrary token sequences") {
    val textGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "aa")).map(_.mkString(" "))
    check("repetition-invariants", Prop.forAll(textGen) { t =>
      val r = graft.expressions.RepetitionStats.compute(t)
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      val n = r.getInt(0)
      val (top, n2, d2, n3, d3, adj) =
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))
      n == toks.length &&
        (if (n == 0) top == 0 else top >= 1 && top <= n) &&
        n2 == math.max(n - 1, 0) && d2 >= 0 && d2 <= n2 &&
        n3 == math.max(n - 2, 0) && d3 >= 0 && d3 <= n3 &&
        adj >= 0 && adj <= n2 &&
        // exact cross-checks against direct set construction
        d2 == toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSet.size &&
        adj == toks.sliding(2).count(w => w.length == 2 && w(0) == w(1))
    })
  }

  test("chunking at stride == window partitions the token sequence exactly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val textGen = Gen.choose(1, 40).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("x", "y", "z")).map(_.mkString(" ")))
    check("chunk-partition", Prop.forAll(textGen, Gen.choose(1, 8)) { (t, w) =>
      val out = graft.textops.Curation
        .chunkPassages(Seq((1L, t)).toDF("id", "text"), "id", "text", w, w)
        .orderBy("chunk_index").as[(Long, Int, Int, String)].collect()
      val toks = t.trim.split("\\s+").filter(_.nonEmpty)
      out.flatMap(_._4.split(" ")).toSeq == toks.toSeq &&
        out.forall(_._3 <= w) && out.dropRight(1).forall(_._3 == w)
    }, minOk = 30)
  }

  test("md5 prefix long equals parsing the first 16 hex chars of md5") {
    import org.apache.spark.unsafe.types.UTF8String
    check("hex-compat", Prop.forAll(Gen.alphaNumStr.map(_.take(40))) { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
      graft.expressions.Md5PrefixLong.compute(UTF8String.fromString(s)) ==
        java.lang.Long.parseUnsignedLong(hex, 16)
    })
  }

  test("array normalize yields unit vectors and passes zero vectors through") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecGen = Gen.nonEmptyListOf(Gen.choose(-100.0, 100.0)).map(_.toArray)
    check("unit-norm", Prop.forAll(vecGen) { v =>
      val out = graft.expressions.ArrayNormalize
        .compute(new GenericArrayData(v.map(java.lang.Double.valueOf)))
      val n = math.sqrt((0 until out.numElements()).map(i => {
        val x = out.getDouble(i); x * x
      }).sum)
      val inNorm = math.sqrt(v.map(x => x * x).sum)
      if (inNorm == 0.0) (0 until out.numElements()).forall(i => out.getDouble(i) == 0.0)
      else math.abs(n - 1.0) < 1e-9
    })
  }

  test("jaro-winkler triangle-ish sanity: appending a char can only lower similarity from 1") {
    val strGen = Gen.nonEmptyListOf(Gen.alphaChar).map(_.take(10).mkString)
    check("append", Prop.forAll(strGen) { s =>
      val sim = JaroWinkler.similarity(s, s + "x")
      sim < 1.0 && sim > 0.0
    })
  }

  test("keepTopFraction keeps exactly ceil(frac*n) rows per stratum for random layouts") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val layoutGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1, 12)).map(_.take(4)),
      Gen.choose(0.05, 1.0))
    check("topfrac", Prop.forAll(layoutGen) { case (sizes, frac) =>
      val rows = sizes.zipWithIndex.flatMap { case (n, g) =>
        (0 until n).map(i => (s"g$g", (g * 100 + i).toLong, (i % 5).toDouble))
      }
      val out = graft.textops.Curation.keepTopFraction(
          rows.toDF("g", "id", "score"), col("score"), Seq(col("g")), col("id"), frac)
        .groupBy("g").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      sizes.zipWithIndex.forall { case (n, g) =>
        out.getOrElse(s"g$g", 0L) == math.ceil(n * frac).toLong
      }
    }, minOk = 10)
  }

  test("sampleExactN draws min(n, |stratum|) rows with order-invariant membership") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val layoutGen = Gen.zip(
      Gen.nonEmptyListOf(Gen.choose(1, 15)).map(_.take(3)),
      Gen.choose(1, 10))
    check("exactn", Prop.forAll(layoutGen) { case (sizes, n) =>
      val rows = sizes.zipWithIndex.flatMap { case (sz, g) =>
        (0 until sz).map(i => (s"g$g", (g * 100 + i).toLong))
      }
      val df = rows.toDF("g", "id")
      def draw(d: org.apache.spark.sql.DataFrame) =
        graft.textops.Curation.sampleExactN(d, col("id"), Seq(col("g")), n, "p")
          .select("g", "id").as[(String, Long)].collect().toSet
      val a = draw(df)
      val b = draw(df.orderBy(col("id").desc)) // input order must not matter
      val perStratum = a.groupBy(_._1).view.mapValues(_.size).toMap
      a == b && sizes.zipWithIndex.forall { case (sz, g) =>
        perStratum.getOrElse(s"g$g", 0) == math.min(sz, n)
      }
    }, minOk = 10)
  }

  test("jacobi eigensolver: V diag(λ) Vᵀ reconstructs M and V is orthonormal") {
    val rnd = new scala.util.Random(23)
    (1 to 20).foreach { trial =>
      val d = 2 + rnd.nextInt(9) // 2..10
      val half = Array.fill(d, d)(rnd.nextDouble() * 4 - 2)
      val m = Array.tabulate(d, d)((i, j) => half(i)(j) + half(j)(i)) // symmetric
      val (values, vectors) = graft.textops.Pca.jacobiEigen(m)
      // reconstruction: Σ_k λ_k v_k v_kᵀ == M to double precision
      var maxErr = 0.0
      var maxOrtho = 0.0
      for (i <- 0 until d; j <- 0 until d) {
        val rec = (0 until d).map(k => values(k) * vectors(i)(k) * vectors(j)(k)).sum
        maxErr = math.max(maxErr, math.abs(rec - m(i)(j)))
        val dot = (0 until d).map(k => vectors(k)(i) * vectors(k)(j)).sum
        maxOrtho = math.max(maxOrtho, math.abs(dot - (if (i == j) 1.0 else 0.0)))
      }
      assert(maxErr < 1e-9, s"trial $trial (d=$d): reconstruction error $maxErr")
      assert(maxOrtho < 1e-9, s"trial $trial (d=$d): orthonormality error $maxOrtho")
      // trace preserved: Σλ == tr(M)
      val tr = (0 until d).map(i => m(i)(i)).sum
      assert(math.abs(values.sum - tr) < 1e-9)
    }
  }

  private val wordsGen: Gen[String] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "xyz")).map(_.mkString(" "))

  test("LcsLength matches the recursive definition; bounds and symmetry hold") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(s: String) = new GenericArrayData(
      s.trim.split("\\s+").filter(_.nonEmpty).map(UTF8String.fromString(_): Any))
    def naive(a: List[String], b: List[String]): Int = (a, b) match {
      case (Nil, _) | (_, Nil) => 0
      case (x :: xs, y :: ys) if x == y => 1 + naive(xs, ys)
      case (x :: xs, y :: ys) => math.max(naive(xs, y :: ys), naive(x :: xs, ys))
    }
    def toks(s: String) = s.trim.split("\\s+").filter(_.nonEmpty).toList
    val shortGen = wordsGen.map(w => toks(w).take(7).mkString(" "))
    check("lcs=naive", Prop.forAll(shortGen, shortGen) { (a, b) =>
      graft.expressions.LcsLength.lcs(arr(a), arr(b)) == naive(toks(a), toks(b))
    }, minOk = 150)
    check("lcs symmetric+bounded", Prop.forAll(wordsGen, wordsGen) { (a, b) =>
      val l = graft.expressions.LcsLength.lcs(arr(a), arr(b))
      l == graft.expressions.LcsLength.lcs(arr(b), arr(a)) &&
        l <= math.min(toks(a).length, toks(b).length) &&
        graft.expressions.LcsLength.lcs(arr(a), arr(a)) == toks(a).length
    })
  }

  test("NgramOverlapStats matches naive clipped counts; self-pair is total") {
    def naiveStats(cand: String, ref: String, n: Int): (Long, Long, Long) = {
      def grams(s: String) = {
        val t = s.trim.split("\\s+").filter(_.nonEmpty)
        (0 to t.length - n).map(i => t.slice(i, i + n).mkString(" "))
      }
      val (c, r) = (grams(cand), grams(ref))
      val rc = r.groupBy(identity).view.mapValues(_.size).toMap
      val matched = c.groupBy(identity).map { case (g, occ) =>
        math.min(occ.size, rc.getOrElse(g, 0))
      }.sum
      (matched.toLong, c.size.toLong, r.size.toLong)
    }
    check("clipped=naive", Prop.forAll(wordsGen, wordsGen, Gen.choose(1, 3)) { (a, b, n) =>
      val st = graft.expressions.NgramOverlapStats.stats(a, b, n, charMode = false)
      val row = st.getStruct(n - 1, 4)
      (row.getLong(1), row.getLong(2), row.getLong(3)) == naiveStats(a, b, n)
    })
    check("self-pair matched=total", Prop.forAll(wordsGen, Gen.choose(1, 4)) { (a, n) =>
      val row = graft.expressions.NgramOverlapStats.stats(a, a, n, charMode = false)
        .getStruct(n - 1, 4)
      row.getLong(1) == row.getLong(2) && row.getLong(2) == row.getLong(3)
    })
  }

  test("CharShingles: count identity and reconstruction") {
    check("charshingles", Prop.forAll(wordsGen, Gen.choose(1, 4)) { (s, n) =>
      val stripped = s.filterNot(c => c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f')
      val out = graft.expressions.CharShingles.shingle(s, n)
      val expected = math.max(0, stripped.length - n + 1)
      out.numElements() == expected &&
        (0 until out.numElements()).forall(i =>
          out.getUTF8String(i).toString == stripped.substring(i, i + n))
    })
  }
}
