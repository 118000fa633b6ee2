package graft

import org.apache.spark.sql.functions._

import graft.textops.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("repetition_stats counts match hand computation") {
    val r = Seq("a b a b c c", "x", "", "w w w w")
      .toDF("t").select(graft.functions.repetition_stats(col("t")).as("r"))
      .select("r.n_tokens", "r.top_token", "r.n2", "r.d2", "r.n3", "r.d3", "r.adj")
      .as[(Int, Int, Int, Int, Int, Int, Int)].collect()
    // "a b a b c c": toks=6, top=2(a/b/c all twice), 2-grams {ab,ba,ab,bc,cc}→d2=4,
    // 3-grams {aba,bab,abc,bcc}→d3=4, adjacent repeats: cc→1
    assert(r(0) === ((6, 2, 5, 4, 4, 4, 1)))
    assert(r(1) === ((1, 1, 0, 0, 0, 0, 0)))
    assert(r(2) === ((0, 0, 0, 0, 0, 0, 0)))
    // "w w w w": top=4, 2-grams all "w w"→d2=1, 3-grams all "w w w"→d3=1, adj=3
    assert(r(3) === ((4, 4, 3, 1, 2, 1, 3)))
  }

  test("weighted sample matches an independent Efraimidis-Spirakis reimplementation") {
    val rows = (0 until 200).map(i => (i.toLong, 1L + (i % 13) * 7L))
    val df = rows.toDF("id", "w")
    val got = Curation.weightedSample(df, col("id"), col("w"), 40, "wtest")
      .as[(Long, Long)].collect().toSet
    // independent replay: same md5 draw, ln(u)/w key, top-40 with id tiebreak
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(s"wtest:$id".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      math.log(u) / math.max(w.toDouble, 1e-12)
    }
    val expect = rows.sortBy { case (id, w) => (-key(id, w), id) }.take(40).toSet
    assert(got === expect)
    assert(got.size === 40)

    // a row with an astronomically dominant weight is (deterministically) selected
    val heavy = df.union(Seq((999L, 1000000000L)).toDF("id", "w"))
    val picked = Curation.weightedSample(heavy, col("id"), col("w"), 5, "wtest")
      .as[(Long, Long)].collect().toMap
    assert(picked.contains(999L))

    // determinism: same inputs, same selection
    val again = Curation.weightedSample(df, col("id"), col("w"), 40, "wtest")
      .as[(Long, Long)].collect().toSet
    assert(again === got)
  }

  test("hash sampling is deterministic, nested across rates, and near the target rate") {
    val keys = spark.range(4000).toDF("id")
    val at20 = Curation.hashSample(keys, col("id"), 0.2, "s").as[Long].collect().toSet
    val at50 = Curation.hashSample(keys, col("id"), 0.5, "s").as[Long].collect().toSet
    val at50again = Curation.hashSample(keys, col("id"), 0.5, "s").as[Long].collect().toSet
    assert(at50 === at50again)
    assert(at20.subsetOf(at50), "a lower rate must select a subset of a higher rate")
    assert(math.abs(at20.size / 4000.0 - 0.2) < 0.03)
    assert(math.abs(at50.size / 4000.0 - 0.5) < 0.03)
    assert(Curation.hashSample(keys, col("id"), 1.0, "s").count() === 4000)
  }

  test("importance sample: prob clamps, determinism, and agreement with hashSample") {
    val df = spark.range(100).toDF("id")
    assert(Curation.importanceSample(df, col("id"), lit(1.5), "s").count() === 100)
    assert(Curation.importanceSample(df, col("id"), lit(-0.2), "s").count() === 0)
    val a = Curation.importanceSample(df, col("id"), lit(0.5), "s")
      .collect().map(_.getLong(0)).toSet
    val b = Curation.importanceSample(df, col("id"), lit(0.5), "s")
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty && a.size < 100)
    // same draw machinery as the fixed-rate sampler: at a power-of-two rate the
    // numeric (draw/2^32 < p) and hex-threshold (draw < floor(p·2^32)) cuts agree
    // exactly (they can differ by the single draw == floor(p·2^32) otherwise)
    val c = Curation.hashSample(df, col("id"), 0.5, "s").collect().map(_.getLong(0)).toSet
    assert(a === c)
    // nested like the rate samplers: raising a row's probability can only ADD rows
    val lo = Curation.importanceSample(df, col("id"), lit(0.25), "s")
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(a))
  }

  test("temperature mix: hand-computed n^alpha rates, importance-sample equivalence") {
    // domains: a×16, b×4; α=0.5 → weights 4 and 2, W=6; budget 3 →
    //   rate_a = 3·4/6/16 = 0.125   rate_b = 3·2/6/4 = 0.25
    // (both exact in double and unchanged by the round-6) — the small domain keeps
    // 2× the rate of the large one, which proportional sampling (α=1) would not do
    val df = spark.range(20).toDF("id")
      .withColumn("lang", when(col("id") < 16, "a").otherwise("b"))
    val mixed = Curation.temperatureMix(df, col("id"), col("lang"),
      alpha = 0.5, budgetRows = 3, salt = "t")
    val got = mixed.collect().map(_.getLong(0)).toSet
    // same draw machinery, same comparison: membership must equal importanceSample
    // with the hand-computed per-domain rates
    val expected = Curation.importanceSample(df, col("id"),
        when(col("lang") === "a", 0.125).otherwise(0.25), "t")
      .collect().map(_.getLong(0)).toSet
    assert(got === expected)
    // α=1 is proportional: every domain gets the same rate, so mixing at the full
    // budget keeps everything
    assert(Curation.temperatureMix(df, col("id"), col("lang"),
      alpha = 1.0, budgetRows = 20, salt = "t").count() === 20)
    // determinism
    assert(Curation.temperatureMix(df, col("id"), col("lang"),
      alpha = 0.5, budgetRows = 3, salt = "t")
      .collect().map(_.getLong(0)).toSet === got)
  }

  test("global shuffle: dense 1..N positions equal to the single-window order") {
    val df = spark.range(1000).toDF("id").repartition(7)
    val out = Curation.globalShuffle(df, col("id"), "gs")
      .select("position", "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // dense 1..N, no gaps or duplicates
    assert(out.map(_._1).toSeq === (1L to 1000L))
    // bucket-offset numbering must equal the (draw, key) global order computed
    // the naive single-window way
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(Curation.hashDraw(col("id"), "gs"), col("id").cast("string"))
    val naive = df.withColumn("p", row_number().over(w))
      .select("p", "id").collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).sortBy(_._1)
    assert(out.map(_._2).toSeq === naive.map(_._2).toSeq)
    // no single-partition global window in the executed plan: the numbering window
    // must be PARTITIONED (by the draw bucket), never an empty-partition-spec window
    val plan = Curation.globalShuffle(df, col("id"), "gs")
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(_bucket"),
      s"numbering window must partition by _bucket:\n${plan.take(1500)}")
  }

  test("stratified sample applies per-stratum rates; split covers every row once") {
    val df = docs.select(col("doc_id"), col("lang"))
    val kept = Curation.stratifiedSample(df, col("doc_id"), col("lang"),
      Map("en" -> 0.0, "zh" -> 1.0), defaultRate = 0.5, salt = "t")
    assert(kept.filter(col("lang") === "en").count() === 0)
    assert(kept.filter(col("lang") === "zh").count() ===
      df.filter(col("lang") === "zh").count())
    val split = Curation.assignSplit(df, col("doc_id"), 0.8, "t")
    assert(split.count() === df.count())
    assert(split.select("split").distinct().as[String].collect().toSet === Set("train", "val"))
  }

  test("packSequences assigns chunked sequences with per-shard running offsets") {
    val rows = Seq(("s", 1L, 100), ("s", 2L, 100), ("s", 3L, 100), ("s", 4L, 50),
      ("t", 1L, 220), ("t", 2L, 220)).toDF("shard", "id", "n_tokens")
    val out = Curation.packSequences(rows, col("n_tokens"), Seq(col("shard")),
        col("id"), budget = 256)
      .select("shard", "id", "cum_before", "seq_id")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // shard s: offsets 0,100,200,300 → seqs 0,0,0,1; shard t: 0,220 → seqs 0,0
    assert(out.map(r => (r._3, r._4)).toSeq ===
      Seq((0L, 0L), (100L, 0L), (200L, 0L), (300L, 1L), (0L, 0L), (220L, 0L)))
  }

  test("chunkPassages produces overlapping windows with a partial tail") {
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"), (3L, " "))
      .toDF("id", "text")
    val out = Curation.chunkPassages(df, "id", "text", windowTokens = 4, strideTokens = 3)
      .as[(Long, Int, Int, String)].collect().sortBy(r => (r._1, r._2))
    // doc 1: 10 tokens → chunks at 0,3,6,9 → n_chunks = 1 + ceil(6/3) = 3? starts 0,3,6
    // cover t1..t10 (start 6 → t7..t10); formula: 1 + ceil((10-4)/3) = 3 chunks
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._4)) === Seq(
      (0, "t1 t2 t3 t4"), (1, "t4 t5 t6 t7"), (2, "t7 t8 t9 t10")))
    assert(out.filter(_._1 == 2L) === Seq((2L, 0, 2, "a b")))
    assert(!out.exists(_._1 == 3L), "all-whitespace docs produce no chunks")
  }

  test("removeBoilerplateLines strips corpus-frequent lines and keeps order") {
    val df = Seq(
      (1L, "cookie banner\nreal content one\nfooter"),
      (2L, "cookie banner\nreal content two\nfooter"),
      (3L, "cookie banner\nunique text\nmore unique\nfooter"),
      (4L, "only original prose here")).toDF("id", "text")
    val out = Curation.removeBoilerplateLines(df, "id", "text", "\n", maxDocFreq = 2)
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "real content one", 2)))
    assert(out(1) === ((2L, "real content two", 2)))
    assert(out(2) === ((3L, "unique text\nmore unique", 2)))
    assert(out(3) === ((4L, "only original prose here", 0)))
  }

  test("removeBoilerplateLines handles regex-metachar delimiters literally") {
    val df = Seq(
      (1L, "ad block|keep this|tail"),
      (2L, "ad block|keep that|tail"),
      (3L, "ad block|solo line|tail")).toDF("id", "text")
    val out = Curation.removeBoilerplateLines(df, "id", "text", "|", maxDocFreq = 2)
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(0) === ((1L, "keep this", 2)))
    assert(out(1) === ((2L, "keep that", 2)))
    assert(out(2) === ((3L, "solo line", 2)))
  }

  test("contaminationStats flags full and partial benchmark overlap") {
    val bench = Seq((10L, "alpha beta gamma delta")).toDF("id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),        // exact copy: ratio 1.0
      (2L, "alpha beta gamma other words"),  // partial overlap
      (3L, "totally different tokens here")) // no overlap
      .toDF("id", "text")
    val out = Curation.contaminationStats(corpus, bench, "id", "text", 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 2L, 2L)))
    assert(out(1)._1 === 2L && out(1)._3 === 1L) // "alpha beta gamma" only
    assert(out(2) === ((3L, 2L, 0L)))
  }

  test("foldText strips accents and lowercases; pure ASCII passes through") {
    import graft.textops.TextOps
    val d = Seq("Café NAÏVE Straße ÉLAN", "plain ASCII 123", "étude").toDF("t")
    val out = d.select(TextOps.foldText(col("t"))).as[String].collect()
    assert(out(0) === "cafe naive straße elan")
    assert(out(1) === "plain ascii 123")
    assert(out(2) === "etude") // decomposed input folds identically
    // spacing (Mc) and enclosing (Me) marks drop too — DuckDB STRIPMARK semantics
    val marks = Seq("का", "a⃝").toDF("t")
      .select(graft.functions.strip_accents(col("t"))).as[String].collect()
    assert(marks(0) === "क")
    assert(marks(1) === "a")
  }

  test("encodeTokens maps tokens through the vocab with OOV fallback") {
    val d = Seq((1L, "a b a zz"), (2L, " ")).toDF("id", "text")
    val vocab = Seq(("a", 1), ("b", 2)).toDF("token", "token_id")
    val out = Curation.encodeTokens(d, "id", "text", vocab)
      .orderBy("id").as[(Long, Seq[Int])].collect()
    assert(out(0) === ((1L, Seq(1, 2, 1, 0))))
    assert(out(1)._2.isEmpty)
  }

  test("bloom decontamination is exact even at an absurd false-positive rate") {
    val bench = Seq((10L, "alpha beta gamma delta")).toDF("id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),        // overlaps: removed
      (2L, "alpha beta gamma other words"),  // overlaps: removed
      (3L, "totally different tokens here"), // clean: kept
      (4L, "no"))                            // < 3 tokens, no shingles: kept
      .toDF("id", "text")
    // fpp 0.5 floods the probe with false positives; the verify join must still
    // produce the exact answer
    for (fpp <- Seq(0.5, 0.01)) {
      val kept = Curation.bloomDecontaminate(corpus, bench, "id", "text", 3, fpp)
        .select("id").as[Long].collect().sorted
      assert(kept === Array(3L, 4L), s"fpp=$fpp")
      spark.sqlContext.clearCache()
    }
  }

  test("bloom probe is a scalar filter before the verify join (no corpus-wide shuffle)") {
    val d = docs.select(col("doc_id"), col("text"))
    val ids = Curation.bloomContaminatedIds(d, d.filter(col("doc_id") % 13 === 0),
      "doc_id", "text", 3)
    val plan = ids.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from plan:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in plan:\n${plan.take(2000)}")
    // exactness vs the hash-relation path on real data
    val viaStats = Curation.contaminationStats(d, d.filter(col("doc_id") % 13 === 0),
        "doc_id", "text", 3)
      .filter(col("n_overlap") > 0).select("doc_id").as[Long].collect().sorted
    assert(ids.select("doc_id").as[Long].collect().sorted === viaStats)
    spark.sqlContext.clearCache()
  }

  test("boilerplate and contamination joins broadcast the small set (no all-pairs join)") {
    val d = docs.select(col("doc_id"), col("text"))
    Seq(
      Curation.boilerplateShingleStats(d, "doc_id", "text", 3, 5),
      Curation.contaminationStats(d, d.filter(col("doc_id") % 13 === 0), "doc_id", "text", 3)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in plan:\n${plan.take(2000)}")
      assert(plan.contains("BroadcastHashJoin"),
        s"frequent/benchmark shingle set must broadcast:\n${plan.take(2000)}")
    }
  }

  test("quality classifier distills the heuristic quality label; loss collapses") {
    import graft.textops.{QualityClassifier, TextOps}
    val d = docs.select(col("doc_id"), col("text"))
      .withColumn("y", (TextOps.qualityScore(col("text")) >= 0.54).cast("int"))
    val model = QualityClassifier.fit(d,
      QualityClassifier.textFeatures(col("text")), col("y"), dim = 9, iters = 8)
    assert(model.losses.last < model.losses.head * 0.2,
      s"loss did not collapse: ${model.losses.head} -> ${model.losses.last}")
    assert(model.losses.sliding(2).forall(p => p(1) <= p(0) + 1e-9),
      s"Newton loss not monotone: ${model.losses}")
    val scored = QualityClassifier.predict(d,
      QualityClassifier.textFeatures(col("text")), model)
    val acc = scored
      .select(((col("p_quality") >= 0.5) === (col("y") === 1)).cast("int").as("ok"))
      .agg(avg("ok")).first().getDouble(0)
    assert(acc >= 0.95, s"accuracy $acc below 0.95")
  }

  test("dedupParagraphs keeps first occurrences corpus-wide and rebuilds in order") {
    val d = Seq(
      (1L, "intro\nbody\noutro"),
      (2L, "body\nnew stuff"),   // "body" already seen in doc 1 → removed
      (3L, "intro\nbody\noutro"), // full copy → everything removed
      (4L, "solo\nsolo"),        // in-doc repeat → second removed
      (5L, "\n \n"))             // delimiter-only doc must SURVIVE as (0, 0, "")
      .toDF("doc_id", "text")
    val out = Curation.dedupParagraphs(d, "doc_id", "text", "\n")
      .orderBy("id").as[(Long, Long, Long, String)].collect()
    assert(out(0) === ((1L, 3L, 3L, "intro\nbody\noutro")))
    assert(out(1) === ((2L, 2L, 1L, "new stuff")))
    assert(out(2) === ((3L, 3L, 0L, "")))
    assert(out(3) === ((4L, 2L, 1L, "solo")))
    assert(out(4) === ((5L, 0L, 0L, "")))
  }

  test("reserved-name and sizing guards fail loudly instead of silently corrupting") {
    import graft.events.AsofJoin
    val l = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
    val r = Seq((10L, 90L, 7L, 1.5)).toDF("k", "t", "rid", "v")
    // internal scratch column on the left would be silently overwritten mid-union
    val eCarried = intercept[IllegalArgumentException] {
      AsofJoin.leftAsof(l.withColumn("_carried", lit(0)), r, "k", "t", Seq("v"), "rid")
    }
    assert(eCarried.getMessage.contains("_carried"))
    // an existing <col>_asof output name would be silently shadowed
    val eAsof = intercept[IllegalArgumentException] {
      AsofJoin.leftAsof(l.withColumn("v_asof", lit(0)), r, "k", "t", Seq("v"), "rid")
    }
    assert(eAsof.getMessage.contains("v_asof"))
    // writeShards must refuse to replace a pre-existing shard column
    val eShard = intercept[IllegalArgumentException] {
      Curation.writeShards(docs.limit(5).withColumn("shard", lit(9)),
        col("doc_id"), 4, s"${System.getProperty("java.io.tmpdir")}/graft_spec_noshard", "s")
    }
    assert(eShard.getMessage.contains("shard"))
    // bloom_filter_agg must ratchet the runtime-filter caps up to the requested
    // size — a silently clamped filter has effective fpp ≈ 1
    val big = 100000000L // → ~9.6e8 bits, far above the 8M-bit default cap
    graft.functions.bloom_filter_agg(xxhash64(col("doc_id")), big, 0.01)
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits").toLong
      >= 9e8.toLong)
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems").toLong
      >= big)
  }

  test("writeShards round-trips deterministically with shards in range") {
    val d = docs.select(col("doc_id"), col("text")).limit(100)
    // per-run token: concurrent sbt invocations must not overwrite each other's dirs
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_shards_${graft.util.Scratch.runToken}"
    val a = Curation.writeShards(d, col("doc_id"), 4, path, "s")
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    val b = Curation.writeShards(d, col("doc_id"), 4, path, "s")
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    assert(a.size === 100)
    assert(a === b) // same keys → same shards, run to run
    assert(a.values.forall(s => s >= 0 && s < 4))
    assert(a.values.toSet.size > 1) // actually spreads
  }

  test("curriculum order: dense positions, non-decreasing difficulty, naive-window equality") {
    val rnd = new scala.util.Random(29)
    val df = (1 to 800).map(i => (i.toLong, rnd.nextInt(100)))
      .toDF("id", "score").repartition(5)
    val out = Curation.curriculumOrder(df, col("id"), col("score"), 4, "c")
      .select("position", "id", "bucket", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq === (1L to 800L))
    // bucket-major: difficulty bucket never decreases along the position axis,
    // and every bucket's max score <= the next bucket's min score
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
    val byBucket = out.groupBy(_._3).toSeq.sortBy(_._1).map(_._2.map(_._4))
    byBucket.sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min)
      case _ =>
    }
    // equality with the naive (bucket, draw, key) total order, draw recomputed
    // driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(id: Long): String =
      md.digest(s"c:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val expectedOrder = out.sortBy(t => (t._3, draw(t._2), t._2.toString)).map(_._2)
    assert(out.sortBy(_._1).map(_._2).toSeq === expectedOrder.toSeq)
  }

  test("interval join equals the naive range join; no nested loop; loud span guard") {
    import graft.events.IntervalJoin
    val rnd = new scala.util.Random(17)
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val points = (1 to 400).map(i => (i.toLong, ts(rnd.nextInt(10000).toLong)))
      .toDF("pid", "ts")
    val ivRaw = (1 to 60).map { i =>
      val start = rnd.nextInt(9000).toLong
      (i.toLong, start, start + rnd.nextInt(900).toLong)
    }
    val intervals = ivRaw.map { case (id, s, e) => (id, ts(s), ts(e)) }
      .toDF("iid", "w_start", "w_end")
    val out = IntervalJoin.pointInInterval(
        points, intervals, "ts", "w_start", "w_end", binWidthSeconds = 300)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // naive cross check driver-side
    val pts = (1 to 400).map(i => i.toLong).zip(
      points.orderBy("pid").select("ts").as[java.sql.Timestamp].collect()).toMap
    val expected = (for {
      (pid, t) <- pts.toSeq
      (iid, s, e) <- ivRaw
      if !t.before(ts(s)) && !t.after(ts(e))
    } yield (pid, iid)).toSet
    assert(out === expected)
    assert(out.nonEmpty)
    // plan: hash equi-join on the bin, never a nested loop
    val plan = IntervalJoin.pointInInterval(
        points, intervals, "ts", "w_start", "w_end", binWidthSeconds = 300)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"range join fell back to a nested loop:\n$plan")
    // an interval spanning more bins than the cap must fail loudly, not drop matches
    val huge = Seq((1L, ts(0), ts(100000))).toDF("iid", "w_start", "w_end")
    val err = intercept[Exception] {
      IntervalJoin.pointInInterval(points, huge, "ts", "w_start", "w_end",
        binWidthSeconds = 10, maxBinsPerInterval = 16).count()
    }
    assert(err.getMessage.contains("pointInInterval") ||
      err.getCause != null && err.getCause.getMessage.contains("pointInInterval"))
  }

  test("leftAsof attaches the latest at-or-before right row per key") {
    import graft.events.AsofJoin
    val l = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L))
      .toDF("id", "k", "t")
    val r = Seq(
      (10L, 100L, 7L, 1.5), // equal ts: inclusive
      (10L, 200L, 8L, 2.5), (10L, 200L, 9L, 3.5), // tie at ts 200: largest rid wins
      (20L, 60L, 5L, 9.9)) // after left's t=50: no match
      .toDF("k", "t", "rid", "v")
    val out = AsofJoin.leftAsof(l, r, "k", "t", Seq("rid", "v"), rightTie = "rid")
      .orderBy("id")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
    assert(out(0) === ((1L, 10L, 100L, Some(7L), Some(1.5))))
    assert(out(1) === ((2L, 10L, 205L, Some(9L), Some(3.5))))
    assert(out(2) === ((3L, 20L, 50L, None, None)))
    // a null-ts right row must never leak its payload (ts <= left.ts is unsatisfiable)
    val rNull = Seq((Some(20L), Option.empty[Long], Some(5L), Some(9.9)))
      .toDF("k", "t", "rid", "v")
    val outNull = AsofJoin.leftAsof(l.filter(col("k") === 20), rNull, "k", "t",
        Seq("rid", "v"), rightTie = "rid")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
    assert(outNull(0)._4.isEmpty && outNull(0)._5.isEmpty)
  }

  test("leftAsofForward attaches the earliest at-or-after right row per key") {
    import graft.events.AsofJoin
    val l = Seq((1L, 10L, 100L), (2L, 10L, 150L), (3L, 20L, 70L))
      .toDF("id", "k", "t")
    val r = Seq(
      (10L, 100L, 7L, 1.5), // equal ts: inclusive
      (10L, 200L, 8L, 2.5), (10L, 200L, 9L, 3.5), // tie at ts 200: largest rid wins
      (20L, 60L, 5L, 9.9)) // before left's t=70: no FUTURE match
      .toDF("k", "t", "rid", "v")
    val out = AsofJoin.leftAsofForward(l, r, "k", "t", Seq("rid", "v"), rightTie = "rid")
      .orderBy("id")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
    assert(out(0) === ((1L, 10L, 100L, Some(7L), Some(1.5))))
    assert(out(1) === ((2L, 10L, 150L, Some(9L), Some(3.5))))
    assert(out(2) === ((3L, 20L, 70L, None, None)))
    // brute-force equivalence on random data (mirrors the backward property)
    val rnd = new scala.util.Random(13)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(50).toLong))
    val right = (1 to 200).map(i =>
      ((i + 1000).toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(50).toLong))
    val got = AsofJoin.leftAsofForward(
        left.toDF("id", "k", "t"),
        right.toDF("rid", "k", "t").select(col("k"), col("t"), col("rid")),
        "k", "t", Seq("rid"), rightTie = "rid")
      .select("id", "rid_asof").as[(Long, Option[Long])].collect().toMap
    val rByK = right.groupBy(_._2)
    left.foreach { case (id, k, t) =>
      val want = rByK.getOrElse(k, Nil).filter(_._3 >= t)
        .sortBy(x => (x._3, -x._1)).headOption.map(_._1)
      assert(got(id) === want, s"left $id")
    }
  }

  test("leftAsof equals a brute-force inequality join on random data (property)") {
    import graft.events.AsofJoin
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(50).toLong))
    val right = (1 to 200).map(i =>
      ((i + 1000).toLong, (rnd.nextInt(5) + 1).toLong, rnd.nextInt(50).toLong,
        rnd.nextInt(1000) / 10.0))
    val out = AsofJoin.leftAsof(
        left.toDF("id", "k", "t"),
        right.toDF("rid", "k", "t", "v").select(col("k"), col("t"), col("rid"), col("v")),
        "k", "t", Seq("rid", "v"), rightTie = "rid")
      .as[(Long, Long, Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    left.foreach { case (id, k, t) =>
      val cand = right.filter(r => r._2 == k && r._3 <= t)
      val exp =
        if (cand.isEmpty) (None, None)
        else {
          val best = cand.maxBy(r => (r._3, r._1)) // latest ts, then largest tie id
          (Some(best._1), Some(best._4))
        }
      assert(out(id) === exp, s"left row ($id, k=$k, t=$t)")
    }
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    import org.apache.spark.sql.functions.timestamp_micros
    // user u: events at 0s, 10s, 1810s (gap 1800 = NOT new), 3611s (gap 1801 > 1800 = new)
    val ev = Seq(("u", 0L), ("u", 10L), ("u", 1810L), ("u", 3611L), ("v", 5L))
      .toDF("user_id", "sec")
      .withColumn("ts", timestamp_micros(col("sec") * 1000000L))
    val out = graft.events.Sessionize.assign(ev, col("user_id"), col("ts"), 1800L)
      .select("user_id", "sec", "session_index")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out === Array(("u", 0L, 0L), ("u", 10L, 0L), ("u", 1810L, 0L),
      ("u", 3611L, 1L), ("v", 5L, 0L)))
  }

  test("keepTopFraction keeps ceil(frac*n) per stratum with deterministic ties") {
    // stratum a: 4 rows, frac 0.5 → keep 2; equal scores break by id ASC.
    // stratum b: 1 row → ceil(0.5) = 1 keeps it (non-empty strata never vanish).
    val d = Seq(("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 9L, 0.2)).toDF("g", "id", "score")
    val out = Curation.keepTopFraction(d, col("score"), Seq(col("g")), col("id"), 0.5)
      .select("g", "id", "qrank").as[(String, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(out === Array(("a", 1L, 1), ("a", 2L, 2), ("b", 9L, 1)))
  }

  test("epochMix replicates whole epochs and draws the fractional copy") {
    val d = (0 until 200).map(i => (i.toString, if (i % 2 == 0) "x" else "y"))
      .toDF("id", "g")
    // x: 2.5 epochs → 2 full copies each + ~half get a third; y: 0.25 → ~quarter kept
    val out = Curation.epochMix(d, col("id"), col("g"),
        Map("x" -> 2.5, "y" -> 0.25), defaultEpochs = 1.0, salt = "s")
      .groupBy("g", "epoch").count()
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("x", 0L)) === 100L && out(("x", 1L)) === 100L)
    val xFrac = out(("x", 2L)); val yFrac = out(("y", 0L))
    assert(xFrac > 30 && xFrac < 70, s"x fractional draw $xFrac ~ Binomial(100, .5)")
    assert(yFrac > 10 && yFrac < 40, s"y fractional draw $yFrac ~ Binomial(100, .25)")
    assert(!out.contains(("y", 1L))) // no full copy below 1 epoch
    // determinism: identical draw on a second run
    val again = Curation.epochMix(d, col("id"), col("g"),
        Map("x" -> 2.5, "y" -> 0.25), defaultEpochs = 1.0, salt = "s")
      .groupBy("g", "epoch").count()
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(again === out)
  }

  test("gopher rule stats match hand-computed values") {
    import graft.textops.TextOps
    // 2 lines: 6 tokens "aa bbbb cc#" / "- x..." ; mean len = (2+4+3+1+1+4)/6? No:
    // tokens are [aa, bbbb, cc#, -, x..., the] → lens 2,4,3,1,4,3 → mean 17/6
    val t = "aa bbbb cc# the\n- x..."
    val out = Seq(t).toDF("t").select(
      TextOps.tokenCount(col("t")).as("n"),
      TextOps.meanWordLength(col("t")).as("mean"),
      TextOps.symbolWordRatio(col("t")).as("sym"),
      TextOps.bulletLineFraction(col("t")).as("bullet"),
      TextOps.ellipsisLineFraction(col("t")).as("ell"),
      TextOps.alphaWordFraction(col("t")).as("alpha"))
      .as[(Int, Double, Double, Double, Double, Double)].collect()(0)
    assert(out._1 === 6)
    assert(math.abs(out._2 - (2 + 4 + 3 + 3 + 1 + 4) / 6.0) < 1e-12)
    assert(math.abs(out._3 - 2.0 / 6.0) < 1e-12) // one '#', one '...'
    assert(math.abs(out._4 - 0.5) < 1e-12)       // line 2 of 2 starts with '-'
    assert(math.abs(out._5 - 0.5) < 1e-12)       // line 2 of 2 ends with '...'
    assert(math.abs(out._6 - 5.0 / 6.0) < 1e-12) // all but "-" contain a letter
  }

  test("bigram cross-entropy matches the hand-computed Laplace-smoothed model") {
    // corpus bigrams: "a b"×3, "b a"×1; V = |{a,b,c}| = 3
    // P(a b) = (3+1)/(3+3) = 2/3, P(b a) = (1+1)/(1+3) = 1/2
    val d = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val out = Curation.bigramCrossEntropy(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    spark.sqlContext.clearCache()
    val nllAB = -math.log(2.0 / 3.0)
    val nllBA = -math.log(1.0 / 2.0)
    assert(out(0)._2 === 3L)
    assert(math.abs(out(0)._3 - BigDecimal((2 * nllAB + nllBA) / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1)._2 === 1L)
    assert(math.abs(out(1)._3 - BigDecimal(nllAB)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(2) === ((3L, 0L, 0.0))) // single-token doc: no bigrams, zero score
  }

  test("tfidf keywords rank rare terms above common ones") {
    val d = Seq((1L, "apple apple banana shared"), (2L, "cherry shared shared"),
      (3L, "durian shared")).toDF("doc_id", "text")
    val out = Curation.tfidfKeywords(d, "doc_id", "text", 2)
      .as[(Long, Int, String, Double)].collect().sortBy(r => (r._1, r._2))
    spark.sqlContext.clearCache()
    // doc 1: apple tf=2 df=1 → 2·ln3 ≈ 2.197; banana 1·ln3 ≈ 1.099; shared ln1 = 0
    assert(out.filter(_._1 == 1L).map(_._3).toSeq === Seq("apple", "banana"))
    assert(math.abs(out.find(r => r._1 == 1L && r._3 == "apple").get._4
      - BigDecimal(2 * math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // shared appears in every doc → idf 0 → never outranks a unique term
    assert(out.filter(_._1 == 2L).head._3 === "cherry")
  }

  test("BPE merges reproduce the classic Sennrich fixture with deterministic ties") {
    // word counts: low×5, lower×2, newest×6, widest×3 — es/st/t</w> all tie at 9;
    // lexicographic tie-break picks (e,s), then the merged (es,t), then (est,</w>)
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = Seq(corpus.mkString(" ")).toDF("text")
    val out = Curation.trainBpeMerges(df, col("text"), numMerges = 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(out === Array(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "est", "</w>", 9L),
      (4, "l", "o", 7L), (5, "lo", "w", 7L)))
  }

  test("row-local DSIR expression matches the relational scores (streaming shape)") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = raw.filter(col("lang") === "en")
    val lr = Curation.dsirLogRatios(raw, target, "text")
    val viaExpr = raw.select(col("doc_id"),
        Curation.dsirScoreColumn(col("text"), lr, 256).as("s"))
      .as[(Long, Double)].collect().toMap
    val viaAgg = Curation.dsirScores(raw, target, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(viaExpr.keySet === viaAgg.keySet)
    viaExpr.foreach { case (id, v) =>
      assert(math.abs(v - viaAgg(id)) <= 2e-6, s"doc $id: $v vs ${viaAgg(id)}")
    }
  }

  test("kAnonymityGate flags rare quasi-identifier combinations, groups NULLs") {
    val df = Seq(
      (1L, Some("en"), "a"), (2L, Some("en"), "a"), (3L, Some("en"), "a"),
      (4L, Some("fr"), "a"),                       // singleton combination
      (5L, None, "b"), (6L, None, "b")             // NULL lang groups together
    ).toDF("doc_id", "lang", "src")
    val got = Curation.kAnonymityGate(df, Seq("lang", "src"), k = 2)
      .select("doc_id", "group_size", "k_anonymous")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === ((3L, true)) && got(4L) === ((1L, false)))
    assert(got(5L) === ((2L, true)) && got(6L) === ((2L, true)))
  }

  test("vocab decode inverts encode: in-vocab exact, OOV ids -> <unk>") {
    val vocab = Map("alpha" -> 1, "beta" -> 2)
    val df = Seq((1L, "alpha beta omega")).toDF("doc_id", "text")
    val enc = df.select(col("doc_id"),
      graft.functions.vocab_encode(graft.textops.TextOps.tokens(col("text")), vocab)
        .as("ids"))
    val dec = enc.select(
      graft.functions.vocab_decode(col("ids"), vocab).as("toks"))
      .as[Seq[String]].head()
    assert(dec === Seq("alpha", "beta", "<unk>"))
    // non-injective vocab rejected
    intercept[IllegalArgumentException] {
      graft.functions.vocab_decode(col("ids"), Map("a" -> 1, "b" -> 1))
    }
  }

  test("DSIR scores match an independent reimplementation; target-like docs win") {
    val rawDocs = Map(
      1L -> "alpha beta alpha", 2L -> "gamma delta gamma delta",
      3L -> "alpha beta", 4L -> "")
    val raw = rawDocs.toSeq.toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") === 1L || col("doc_id") === 3L)
    val got = Curation.dsirScores(raw, target, "doc_id", "text")
      .as[(Long, Double)].collect().toMap

    // independent reimplementation: same md5-prefix buckets, Laplace smoothing, sum
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(g: String) = java.lang.Long.parseLong(md5hex(g).take(4), 16) % 256
    def grams(text: String): Seq[String] = {
      val t = text.split("\\s+").filter(_.nonEmpty).toSeq
      t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    val targetDocs = rawDocs.view.filterKeys(Set(1L, 3L)).toMap
    val ct = targetDocs.values.toSeq.flatMap(grams).groupBy(bucket).view.mapValues(_.size).toMap
    val cr = rawDocs.values.toSeq.flatMap(grams).groupBy(bucket).view.mapValues(_.size).toMap
    val (nT, nR) = (ct.values.sum, cr.values.sum)
    def lr(b: Long) = math.log((ct.getOrElse(b, 0) + 1).toDouble / (nT + 256)) -
      math.log((cr.getOrElse(b, 0) + 1).toDouble / (nR + 256))
    def score(text: String) = grams(text).map(g => lr(bucket(g))).sum
    rawDocs.foreach { case (id, tx) =>
      assert(math.abs(got(id) - score(tx)) < 2e-6, s"doc $id: ${got(id)} vs ${score(tx)}")
    }
    // target-domain docs outscore the off-domain one; empty doc scores exactly 0
    assert(got(1L) > got(2L) && got(3L) > got(2L))
    assert(got(4L) === 0.0)
  }

  test("canonicalizeUrl: fragment, utm params, host case, trailing punct/slash") {
    import graft.textops.TextOps
    val cases = Seq(
      "https://Ex5.COM/Path/?utm_source=feed&id=2#frag" -> "https://ex5.com/Path/?id=2",
      "http://T.co/abc?utm_campaign=x," -> "http://t.co/abc",
      "http://a.com/" -> "http://a.com",
      "https://B.org/x?a=1&utm_medium=m&b=2" -> "https://b.org/x?a=1&b=2",
      "http://c.net/p?utm_a=1&utm_b=2" -> "http://c.net/p",
      "https://plain.io/path" -> "https://plain.io/path")
    val got = cases.map(_._1).toDF("u")
      .select(TextOps.canonicalizeUrl(col("u"))).as[String].collect()
    got.zip(cases).foreach { case (g, (in, want)) => assert(g === want, in) }
    assert(TextOps.urlHost(lit("https://ex5.com/Path?id=2")) != null)
    val host = Seq("https://ex5.com/Path?id=2").toDF("u")
      .select(TextOps.urlHost(col("u"))).as[String].head()
    assert(host === "ex5.com")
  }

  test("applyChangelog: delete/update/insert, per-id argmax, same-seq tie on op") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val cl = Seq(
      (1L, 1L, "D", "x"),   // same seq as the U below: op DESC → U wins
      (1L, 1L, "U", "a2"),
      (2L, 1L, "D", "x"),   // delete
      (3L, 1L, "U", "c2"), (3L, 2L, "U", "c3"), // highest seq wins
      (4L, 1L, "I", "d")    // insert under a new id
    ).toDF("doc_id", "seq", "op", "text")
    val out = Curation.applyChangelog(base, cl, "doc_id", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a2", 3L -> "c3", 4L -> "d"))
  }

  test("unigram Viterbi equals exhaustive best-segmentation enumeration") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    def allSegmentations(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap(l =>
        allSegmentations(w.drop(l)).map(w.take(l) +: _))
    (0 until 50).foreach { _ =>
      val w = (0 until (2 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // random piece table over substrings of the word (plus all single chars)
      val pieces = (w.indices.flatMap(i => (1 to math.min(4, w.length - i))
          .map(l => w.substring(i, i + l))).distinct
          .filter(_ => rnd.nextBoolean()) ++ alphabet.map(_.toString))
        .distinct.map(p => p -> -(1.0 + rnd.nextInt(8))).toMap
      val table = new java.util.HashMap[String, java.lang.Double]()
      pieces.foreach { case (k, v) => table.put(k, Double.box(v)) }
      val got = graft.expressions.UnigramEncode.segment(w, table, -20.0, 4)
      def score(seg: Seq[String]): Double =
        seg.map(p => pieces.getOrElse(p,
          if (p.length == 1) -20.0 else Double.NegativeInfinity)).sum
      val bestScore = allSegmentations(w)
        .filter(_.forall(p => p.length <= 4)).map(score).max
      assert(math.abs(score(got.toSeq) - bestScore) < 1e-9,
        s"word $w: viterbi ${got.mkString("+")} score ${score(got.toSeq)} != $bestScore")
      assert(got.mkString === w, "segmentation must concatenate back to the word")
    }
  }

  test("trainUnigramLm learns the planted piece; encode uses it; round trip holds") {
    // corpus dominated by 'abab...' repetitions: 'ab' must become a high-rank piece
    // and the Viterbi encode of an unseen 'abababab' must use it throughout
    val corpus = (Seq.fill(50)("ababab abab") ++ Seq.fill(5)("cc dd")).toDF("text")
    val pieces = Curation.trainUnigramLm(corpus, col("text"),
      vocabSize = 10, seedSize = 50, emIters = 2)
    val m = pieces.collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    val byPiece = m.map(t => t._1 -> t._2).toMap
    // the corpus words themselves win (hard EM routes all mass to the whole-word
    // pieces), 'ab' itself gets pruned — the correct unigram outcome here
    assert(byPiece.contains("abab") && byPiece.contains("ababab"),
      s"learned pieces: ${m.mkString(", ")}")
    // every single char survives pruning (coverage guarantee)
    Seq("a", "b", "c", "d").foreach(c => assert(byPiece.contains(c), s"missing $c"))
    // unseen 'abababab' (len 8) must segment through the learned pieces:
    // abab+abab (2·lp(abab)) beats ababab+a+b — and never falls back to chars
    val enc = Curation.unigramApply(
        Seq((1L, "abababab unseen")).toDF("doc_id", "text"), "doc_id", "text", pieces)
      .select("pieces").collect().head.getSeq[String](0)
    assert(enc.take(2) === Seq("abab", "abab"), s"encoded: $enc")
    assert(enc.mkString("") === "ababababunseen", "concatenation restores the words")
    // determinism: identical rerun
    val again = Curation.trainUnigramLm(corpus, col("text"),
      vocabSize = 10, seedSize = 50, emIters = 2).collect()
    assert(again.map(_.toSeq).toSeq === pieces.collect().map(_.toSeq).toSeq)
  }

  test("unigramSeedCandidates matches hand-computed substring weights") {
    val df = Seq("aa ab", "aa").toDF("text")
    // words: aa x2, ab x1 → substrings: aa: a(2x2)=..; piece 'a': from 'aa' two
    // singles per occurrence (2 occurrences → 4) + from 'ab' one = 5; 'aa': 2;
    // 'ab': 1; 'b': 1
    val got = Curation.unigramSeedCandidates(df, col("text"), maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 5L, "aa" -> 2L, "ab" -> 1L, "b" -> 1L))
  }

  test("incrementalAggMaintain == recompute over applyChangelog; zero groups drop") {
    // base: g1 = {1:10, 2:20}, g2 = {3:30}, g3 = {5:50}
    val base = Seq((1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L), (5L, "g3", 50L))
      .toDF("doc_id", "grp", "v")
    val cl = Seq(
      (2L, 1L, "U", "g2", 25L),  // group MOVE g1 → g2 with a value change
      (3L, 1L, "D", "g2", 0L),   // delete
      (4L, 1L, "I", "g1", 40L),  // insert new id
      (5L, 1L, "D", "g3", 0L),   // deletes its group to zero → row must drop
      (6L, 1L, "U", "g4", 60L),  // U on a missing id acts as insert (MERGE upsert)
      (1L, 1L, "I", "g1", 11L)   // I on an EXISTING id acts as replace (upsert)
    ).toDF("doc_id", "seq", "op", "grp", "v")
    val oldAgg = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).cast("long").as("val_sum"))
    val inc = Curation.incrementalAggMaintain(base, oldAgg, cl,
        "doc_id", "seq", "op", "grp", "v")
      .as[(String, Long, Long)].collect().map { case (g, n, s) => g -> ((n, s)) }.toMap
    val recomputed = Curation.applyChangelog(
        base.withColumnRenamed("v", "v0"),
        cl.withColumnRenamed("v", "v0"), "doc_id", "seq", "op")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v0")).cast("long").as("s"))
      .as[(String, Long, Long)].collect().map { case (g, n, s) => g -> ((n, s)) }.toMap
    assert(inc === recomputed)
    assert(inc === Map("g1" -> ((2L, 51L)), "g2" -> ((1L, 25L)), "g4" -> ((1L, 60L))))
    assert(!inc.contains("g3"))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, multi-column content") {
    val v1 = Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "z")).toDF("doc_id", "text", "meta")
    val v2 = Seq((2L, "b", "y"), (3L, "c", "ZZ"), (4L, "d", "w")).toDF("doc_id", "text", "meta")
    val got = Curation.snapshotDiff(v1, v2, "doc_id", Seq("text", "meta"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
    // content compare restricted to `text` only: 3's meta edit no longer counts
    val textOnly = Curation.snapshotDiff(v1, v2, "doc_id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(textOnly(3L) === "unchanged")
  }

  test("BPE encode: hand-computed segmentations, train→apply round trip lossless") {
    // fixed merges (same list the driver query uses): 1:(e,</w>) 2:(t,h)
    // 3:(th,e</w>) 4:(a,n) 5:(i,n) 6:(s,</w>) 7:(a,t) 8:(r,o)
    val merges = Seq("e" -> "</w>", "t" -> "h", "th" -> "e</w>", "a" -> "n",
      "i" -> "n", "s" -> "</w>", "a" -> "t", "r" -> "o")
    val df = Seq((1L, "the that in rows")).toDF("doc_id", "text")
    val got = Curation.bpeApply(df, "doc_id", "text", merges)
      .select("bpe_tokens").as[Seq[String]].head()
    // the → [the</w>]; that → th at </w> (rank 2 before 7, nothing joins t,</w>);
    // in → in </w> (rank 5); rows → ro w s</w> (ranks 8 then 6)
    assert(got === Seq("the</w>", "th", "at", "</w>", "in", "</w>", "ro", "w", "s</w>"))

    // train on the Sennrich fixture, apply the trained table: segmentation uses the
    // learned merges and reconstruction is lossless (subwords concat to word+</w>)
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val cdf = Seq((1L, corpus)).toDF("doc_id", "text")
    val trained = Curation.trainBpeMerges(cdf, col("text"), numMerges = 5)
    val toks = Curation.bpeApply(Seq((1L, "newest lowest low")).toDF("doc_id", "text"),
      "doc_id", "text", trained).select("bpe_tokens").as[Seq[String]].head()
    // merges: es, est, est</w>, lo, low → newest = [n,e,w,est</w>],
    // lowest = [low,est</w>], low = [low,</w>] (no (low,</w>) merge trained)
    assert(toks === Seq("n", "e", "w", "est</w>", "low", "est</w>", "low", "</w>"))
    val rebuilt = toks.mkString("").replace("</w>", " ").trim
    assert(rebuilt === "newest lowest low")
  }

  test("keepTopFractionApprox tracks the exact ranking without a per-stratum sort") {
    import graft.textops.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        round(TextOps.qualityScore(col("text")), 6).as("quality"))
    val exact = Curation.keepTopFraction(docs, col("quality"), Seq(col("lang")),
      col("doc_id"), 0.3).select("doc_id").as[Long].collect().toSet
    val approx = Curation.keepTopFractionApprox(docs, col("quality"), Seq(col("lang")), 0.3)
      .select("doc_id").as[Long].collect().toSet
    // the sketch blurs only the cut boundary: overlap stays high, size stays close
    val overlap = (exact & approx).size.toDouble / exact.size
    assert(overlap >= 0.85, s"overlap $overlap")
    assert(math.abs(approx.size - exact.size) <= math.max(5, exact.size / 5),
      s"approx kept ${approx.size} vs exact ${exact.size}")
    // plan shape: no row_number window (the whole point); the sort-free path
    val plan = Curation.keepTopFractionApprox(docs, col("quality"), Seq(col("lang")), 0.3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), "approx path must not rank")
  }

  test("blocklistFlags drops blocked sources and bad-word hits, case-insensitively") {
    val df = Seq(
      (1L, "clean text here", "good"),
      (2L, "has a BadWord inside", "good"),
      (3L, "clean again", "spamhost"),
      (4L, "badword badword ok", "spamhost")
    ).toDF("doc_id", "text", "source")
    val out = Curation.blocklistFlags(df, "text", "source",
        blockedSources = Seq("spamhost"), blockedWords = Seq("BADWORD"))
      .select("doc_id", "source_blocked", "blocked_word_count", "kept")
      .as[(Long, Boolean, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, false, 0L, true)))
    assert(out(2L) === ((2L, false, 1L, false)))
    assert(out(3L) === ((3L, true, 0L, false)))
    assert(out(4L) === ((4L, true, 2L, false)))
    // partial-word occurrences must NOT match (token-level, not substring)
    val part = Curation.blocklistFlags(
        Seq((9L, "notbadwordhere", "good")).toDF("doc_id", "text", "source"),
        "text", "source", Seq.empty, Seq("badword"))
      .select("kept").as[Boolean].collect()
    assert(part === Array(true))
  }

  test("knBigramCrossEntropy: hand-computed Kneser-Ney probabilities on a 2-doc corpus") {
    // corpus bigrams: doc1 = {a b, b a, a b}, doc2 = {a c}; D = 0.75, B = 3 types
    //   P(b|a) = 1.25/3 + 0.75·(2/3)·(1/3) = 0.583333…
    //   P(a|b) = 0.25/1 + 0.75·(1/1)·(1/3) = 0.5
    //   P(c|a) = 0.25/3 + 0.75·(2/3)·(1/3) = 0.25
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = Curation.knBigramCrossEntropy(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val x1 = -(2 * math.log(0.25 / 3 + 0.5 / 3 + 1.0 / 3) + math.log(0.5)) / 3
    assert(out(1L)._2 === 3L)
    assert(math.abs(out(1L)._3 - x1) < 1e-6, s"doc1 ${out(1L)._3} vs $x1")
    assert(out(2L)._2 === 1L)
    assert(math.abs(out(2L)._3 + math.log(0.25)) < 1e-6)
  }

  test("knBigramCrossEntropy: per-context probabilities sum to 1 (smoothing is proper)") {
    // reconstruct the model of the fixture above and sum P(·|a) over the vocab
    // {a, b, c}: seen continuations (b, c) plus the unseen-bigram backoff for a
    val pB = 1.25 / 3 + 0.75 * (2.0 / 3) * (1.0 / 3)
    val pC = 0.25 / 3 + 0.75 * (2.0 / 3) * (1.0 / 3)
    val pAUnseen = 0.75 * (2.0 / 3) * (1.0 / 3)
    assert(math.abs(pB + pC + pAUnseen - 1.0) < 1e-12)
    // docs with fewer than two tokens produce no bigrams and score 0
    val tiny = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    val rows = Curation.knBigramCrossEntropy(tiny, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(rows.forall(r => r._2 === 0L && r._3 === 0.0))
  }

  test("mixtureWeights: binding domain keeps rate 1.0, others scale to the target mix") {
    // a: 100 tokens, b: 300; targets 50/50 → N = 200, rate_a = 1, rate_b = 1/3
    val df = (Seq.fill(10)(("a", 10)) ++ Seq.fill(10)(("b", 30))).toDF("dom", "w")
    val out = Curation.mixtureWeights(df, col("dom"), col("w"),
        Map("a" -> 0.5, "b" -> 0.5))
      .select("domain", "n_tokens", "rate", "expected_tokens")
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("a")._2 === 100L && out("a")._3 === 1.0 && out("a")._4 === 100L)
    assert(out("b")._2 === 300L && math.abs(out("b")._3 - 1.0 / 3.0) < 1e-12)
    assert(out("b")._4 === 100L)
    // resulting mixture hits the target shares exactly
    val tot = out.values.map(_._4).sum.toDouble
    assert(out.values.forall(v => math.abs(v._4 / tot - 0.5) < 1e-12))
  }

  test("mixtureWeights fails loudly on a domain absent from the targets") {
    val df = Seq(("a", 10), ("mystery", 5)).toDF("dom", "w")
    val e = intercept[Exception] {
      Curation.mixtureWeights(df, col("dom"), col("w"), Map("a" -> 1.0)).collect()
    }
    assert(e.getMessage != null)
  }

  test("redactPii masks emails and IPv4s and counts them") {
    val out = Seq("write a.user+tag@sub.example.co.uk from 192.168.0.1 or 8.8.8.8 v1.2 x")
      .toDF("t")
      .select(Curation.redactPii(col("t")).as("red"),
        Curation.emailCount(col("t")).as("ne"), Curation.ipv4Count(col("t")).as("ni"))
      .as[(String, Int, Int)].collect()(0)
    assert(out._1 === "write <EMAIL> from <IP> or <IP> v1.2 x")
    assert(out._2 === 1)
    assert(out._3 === 2)
  }

  test("dedupLinesWithinDoc: later repeats drop, blanks survive, order preserved") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "header\nbody one\n\nheader\nbody two\nheader"),
      (2L, "all\nunique\nlines")).toDF("id", "text")
    val out = graft.textops.Curation.dedupLinesWithinDoc(docs, "id", "text")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("text") === "header\nbody one\n\nbody two")
    assert(out(0).getAs[Long]("n_dropped") === 2L)
    assert(out(0).getAs[Long]("n_lines") === 6L)
    assert(out(1).getAs[String]("text") === "all\nunique\nlines")
    assert(out(1).getAs[Long]("n_dropped") === 0L)
  }
}
