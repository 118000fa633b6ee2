package graft

import org.apache.spark.sql.functions._

import graft.textops.{Dedup, Multimodal, Similarity, TextOps}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("shingles produce n-k+1 word n-grams") {
    val out = Seq("a b c d e").toDF("t")
      .select(TextOps.shingles(col("t"), 3).as("s")).as[Seq[String]].collect()(0)
    assert(out === Seq("a b c", "b c d", "c d e"))
    val short = Seq("a b").toDF("t")
      .select(TextOps.shingles(col("t"), 3).as("s")).as[Seq[String]].collect()(0)
    assert(short === Seq.empty)
  }

  test("substring spans merge overlapping/adjacent duplicated k-gram windows") {
    val corpus = Seq(
      1 -> "a b c d e f g h a b c d e q r s t u v w", // self-repeat + shares with 2 and 3
      2 -> "x x a b c d e f g h y y",
      3 -> "p q r s t u v w p p",
      4 -> "tiny", // fewer than k tokens: no shingles, no spans
      5 -> "unique doc nothing shared here at all ok").toDF("doc_id", "text")
    val spans = Dedup.substringSpans(corpus, "doc_id", "text", 3)
      .orderBy("id", "span_start")
      .as[(Int, Int, Int, Int)].collect().toSeq
    // doc 1: positions 0-5 shared with doc 2, 8-10 self-repeat of 0-2, 13-17 shared
    // with doc 3 — gaps of exactly k merge (the covered token runs are contiguous)
    assert(spans === Seq((1, 0, 19, 20), (2, 2, 9, 8), (3, 1, 7, 7)))

    // invariants: per-doc spans disjoint with gap > k, and every span holds >= k tokens
    val byDoc = spans.groupBy(_._1).values
    byDoc.foreach { ss =>
      ss.sliding(2).foreach {
        case Seq((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1 + 1)
        case _ =>
      }
      ss.foreach { case (_, s, e, n) => assert(n === e - s + 1 && n >= 3) }
    }
  }

  test("substring apply removes exactly the span tokens from every doc") {
    val corpus = Seq(
      1 -> "a b c d e f g h a b c d e q r s t u v w",
      2 -> "x x a b c d e f g h y y",
      3 -> "p q r s t u v w p p",
      4 -> "tiny",
      5 -> "unique doc nothing shared here at all ok").toDF("doc_id", "text")
    val cleaned = Dedup.substringApply(corpus, "doc_id", "text", 3)
      .orderBy("id").as[(Int, Long, Long, String)].collect().toSeq
    assert(cleaned === Seq(
      (1, 20L, 20L, ""), // the whole doc was duplicated material
      (2, 12L, 8L, "x x y y"),
      (3, 10L, 7L, "p p p"),
      (4, 1L, 0L, "tiny"),
      (5, 8L, 0L, "unique doc nothing shared here at all ok")))
    cleaned.foreach { case (_, n, rem, text) =>
      val kept = text.split("\\s+").count(_.nonEmpty)
      assert(kept === n - rem, s"cleaned token count must be n_tokens - n_removed")
    }
  }

  test("exact dedup finds planted copies and nothing else") {
    val d = docs.select(col("doc_id"), col("text"))
    val planted = d.unionByName(d.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000).as("doc_id"), col("text")))
    val out = Dedup.exact(planted, "doc_id", "text")
    assert(out.filter(col("n_copies") === 2).count() === 5)
    assert(out.filter(col("n_copies") > 2).count() === 0)
  }

  test("minhash LSH surfaces exact and near duplicates with high shingle jaccard") {
    val d = docs.select(col("doc_id"), col("text"))
    val planted = d.unionByName(d.filter(col("doc_id") < 8)
      .select((col("doc_id") + 1000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text")))
    val pairs = Dedup.minhashLshPairs(planted, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
    val plantedFound = pairs.count { case (l, r, _) => r - l == 1000 && l < 8 }
    assert(plantedFound >= 6, s"found only $plantedFound of 8 planted near-dups")
    assert(pairs.forall(_._3 >= 0.5))
  }

  test("fingerprint overlap finds containment: a doc quoting a chunk of another") {
    val d = docs.select(col("doc_id"), col("text")).filter(col("doc_id") < 40)
    // doc 1000+i quotes the middle 200 chars of doc i inside otherwise-unrelated text
    val quoting = d.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000).as("doc_id"),
        concat(lit("completely unrelated preamble text here "),
          substring(col("text"), 30, 200)).as("text"))
    val pairs = Dedup.fingerprintOverlapPairs(d.unionByName(quoting),
        "doc_id", "text", k = 8, w = 4, minContainment = 0.5)
      .as[(Long, Long, Long, Double)].collect()
    val found = pairs.count { case (l, r, _, _) => r - l == 1000 && l < 5 }
    assert(found >= 4, s"found only $found of 5 planted quotations: ${pairs.toSeq}")
    // pin the SCORE itself (not just the function's own >= threshold filter): the
    // driver recompute of shared / min must equal the reported values exactly
    import org.apache.spark.unsafe.types.UTF8String
    def fps(s: String): Set[Long] = {
      val a = graft.expressions.RollingFingerprints.compute(UTF8String.fromString(s), 8, 4)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val texts = d.unionByName(quoting).as[(Long, String)].collect().toMap
    pairs.filter { case (l, r, _, _) => r - l == 1000 && l < 5 }.foreach {
      case (l, r, shared, containment) =>
        val (fa, fb) = (fps(texts(l)), fps(texts(r)))
        val expShared = (fa & fb).size.toLong
        assert(shared === expShared, s"pair ($l,$r)")
        assert(containment === expShared.toDouble / math.min(fa.size, fb.size),
          s"pair ($l,$r)")
    }
    spark.sqlContext.clearCache()
  }

  test("incremental minhash pairs equal the full run restricted to batch-touching pairs") {
    val d = docs.select(col("doc_id"), col("text"))
    val incoming = d.filter(col("doc_id") < 8)
      .select((col("doc_id") + 1000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val incremental = Dedup.incrementalMinhashPairs(d, incoming, "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect().sorted
    val full = Dedup.minhashLshPairs(d.unionByName(incoming), "doc_id", "text", 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (l, r, _) => l >= 1000 || r >= 1000 }.sorted
    assert(incremental === full)
    assert(incremental.nonEmpty) // planted near-dups must actually surface
    spark.sqlContext.clearCache()
  }

  test("deduplicate collapses transitive near-dup chains to one keeper") {
    val d = docs.select(col("doc_id"), col("text")).limit(30)
    // chain: x ≈ x+1000 (exact copy) and x+1000 ≈ x+2000 (near copy)
    val planted = d
      .unionByName(d.select((col("doc_id") + 1000).as("doc_id"), col("text")))
      .unionByName(d.select((col("doc_id") + 2000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text")))
    val pairs = Dedup.minhashLshPairs(planted, "doc_id", "text", 0.5)
    val out = Dedup.deduplicate(planted, "doc_id", pairs)
    val total = out.count()
    val keepers = out.filter(col("is_keeper")).count()
    assert(total === 90)
    // each 3-doc chain collapses to one keeper; a couple of base docs may legitimately
    // be near-dups of each other in this tiny-vocab corpus, merging chains further
    assert(keepers <= 30 && keepers >= 25, s"keepers=$keepers")
    // keeper is the minimum (string) id of its component
    val bad = out.filter(col("is_keeper") && col("cluster_id") =!= col("doc_id").cast("string"))
    assert(bad.count() === 0)
  }

  test("deduplicateBest keeps the top-score member per cluster, ties break on id") {
    val d = Seq(
      (1L, 0.3), (2L, 0.9), (3L, 0.5),   // cluster {1,2,3}: keeper 2 (best score)
      (4L, 0.7), (5L, 0.7),              // cluster {4,5}: tie → keeper 4 (min id)
      (6L, 0.1)                          // singleton: its own keeper
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_l", "id_r")
    val out = Dedup.deduplicateBest(d, "doc_id", pairs, col("score"))
      .select("doc_id", "keeper_id", "is_keeper")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((2L, false)) && out(2L) === ((2L, true)) &&
      out(3L) === ((2L, false)))
    assert(out(4L) === ((4L, true)) && out(5L) === ((4L, false)))
    assert(out(6L) === ((6L, true)))
  }

  test("simhash: near-identical docs collide, hamming distance grows with edits") {
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // 1 token changed
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhash16(d, "doc_id", "text")
      .as[(Long, Int)].collect().toMap
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
  }

  test("simhash64 banded pairs find exactly the brute-force hamming<=3 pairs") {
    // docs-table corpus with planted exact copies: copies are hamming-0, everything
    // else is typically far; banding (4×16 bits) must have EXACT recall at hamming ≤ 3
    val d = docs.select(col("doc_id"), col("text")).limit(120)
    val planted = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val sigs = Dedup.simhash64(planted, "doc_id", "text").as[(Long, Long)].collect()
    val brute = (for {
      (i1, s1) <- sigs; (i2, s2) <- sigs
      if i1 < i2 && java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (i1, i2)).toSet
    val banded = Dedup.simhash64Pairs(planted, "doc_id", "text", maxHamming = 3)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(banded === brute)
  }

  test("multimodal resize and frame sampling are deterministic batch transforms") {
    val df = docs.limit(50).withColumn("payload", col("text").cast("binary"))
    val r1 = Multimodal.resize(df, "doc_id", "payload", 16, 16).collect().sortBy(_.id)
    val r2 = Multimodal.resize(df, "doc_id", "payload", 16, 16).collect().sortBy(_.id)
    assert(r1.length === 50)
    assert(r1.zip(r2).forall { case (a, b) =>
      a.id == b.id && a.width == b.width && java.util.Arrays.equals(a.payload, b.payload)
    })
    assert(r1.forall(r => r.width <= 16 && r.height <= 16 && r.payload.nonEmpty))
    val frames = Multimodal.sampleFrames(df, "doc_id", "payload", stride = 2).collect()
    // stub header yields 1..4 frames; stride 2 samples ceil(frames/2) of them
    val byDoc = frames.groupBy(_.id)
    assert(byDoc.size === 50)
    assert(frames.forall(f => f.frame_index % 2 == 0 && f.frame_md5.length == 32))
  }

  test("deletion-neighborhood edit-distance pairs match brute force at d=1 and d=2") {
    val words = Seq("kitten", "sitten", "sittin", "sitting", "kitte", "kittens",
      "mitten", "banana", "bananna", "bananas", "", "a", "b", "ab")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "w")
    for (d <- Seq(1, 2)) {
      val got = Dedup.editDistancePairs(df, "id", "w", d)
        .as[(Long, Long, Int)].collect().toSet
      val brute = (for {
        (i1, w1) <- words; (i2, w2) <- words if i1 < i2
        dist = levenshteinRef(w1, w2) if dist <= d
      } yield (i1, i2, dist)).toSet
      assert(got === brute, s"d=$d")
    }
    // null text drops, never joins
    val withNull = Seq((0L, "abc"), (1L, null), (2L, "abd")).toDF("id", "w")
    assert(Dedup.editDistancePairs(withNull, "id", "w", 1)
      .as[(Long, Long, Int)].collect().toSeq === Seq((0L, 2L, 1)))
  }

  private def levenshteinRef(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("real bilinear resize: identity reproduces the raster, 2:1 averages neighbors") {
    val img = new java.awt.image.BufferedImage(2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x102030)
    img.setRGB(1, 0, 0x405070)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val df = Seq((0L, baos.toByteArray)).toDF("doc_id", "payload")
    // identity resize (target == source): packed RGB24 equals the raster exactly
    // (half-pixel-center sampling degenerates to fx = fy = 0)
    val same = Multimodal.resize(df, "doc_id", "payload", 2, 1).collect().head
    assert(same.width === 2 && same.height === 1)
    assert(same.payload.toSeq === Seq(0x10, 0x20, 0x30, 0x40, 0x50, 0x70).map(_.toByte))
    // 2→1 horizontal downscale: the midpoint sample is the per-channel average
    val half = Multimodal.resize(df, "doc_id", "payload", 1, 1).collect().head
    assert(half.width === 1 && half.height === 1)
    assert(half.payload.toSeq === Seq(0x28, 0x38, 0x50).map(_.toByte))
  }

  /** Canonical PCM-16 mono WAV built by hand (44-byte RIFF header, little-endian). */
  private def wavBytes(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val data = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(data)
    def le32(v: Int): Unit = { out.write(v); out.write(v >> 8); out.write(v >> 16); out.write(v >> 24) }
    def le16(v: Int): Unit = { out.write(v); out.write(v >> 8) }
    out.writeBytes("RIFF"); le32(36 + samples.length * 2); out.writeBytes("WAVE")
    out.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(sampleRate)
    le32(sampleRate * 2); le16(2); le16(16)
    out.writeBytes("data"); le32(samples.length * 2)
    samples.foreach(s => le16(s & 0xffff))
    data.toByteArray
  }

  test("audioMeta: real WAV header parsed, non-audio payload stubs deterministically") {
    val wav = wavBytes(8000, Array.fill[Short](32)(1000))
    val df = Seq((0L, wav), (1L, "plain text".getBytes)).toDF("id", "payload")
    val out = Multimodal.audioMeta(df, "id", "payload").collect().sortBy(_.id)
    assert((out(0).sample_rate, out(0).channels, out(0).bits, out(0).n_frames) ===
      ((8000, 1, 16, 32L)))
    assert(math.abs(out(0).duration_ms - 4.0) < 1e-9)
    // stub: len 10, first 'p'=112 → rate 8000·(1+112%3)=16000, ch 1, frames 5
    assert((out(1).sample_rate, out(1).channels, out(1).n_frames) === ((16000, 1, 5L)))
  }

  /** Independent ISO-BMFF writer (big-endian box layout per ISO/IEC 14496-12). */
  private def mp4Box(typ: String, body: Array[Byte], largesize: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(out)
    if (largesize) { o.writeInt(1); o.writeBytes(typ); o.writeLong(16L + body.length) }
    else { o.writeInt(8 + body.length); o.writeBytes(typ) }
    o.write(body); out.toByteArray
  }

  private def mp4Fixture(
      ts: Int, dur: Long, dims: Seq[(Int, Int)], v1: Boolean = false,
      largeMoov: Boolean = false): Array[Byte] = {
    def be(vals: (Int, Any)*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(out)
      vals.foreach {
        case (4, v: Int) => o.writeInt(v)
        case (8, v: Long) => o.writeLong(v)
        case (2, v: Int) => o.writeShort(v)
        case (n, 0) => o.write(new Array[Byte](n))
        case other => fail(s"bad spec $other")
      }
      out.toByteArray
    }
    val unity = be((4, 0x10000), (4, 0), (4, 0), (4, 0), (4, 0x10000), (4, 0),
      (4, 0), (4, 0), (4, 0x40000000))
    val mvhd =
      if (v1) mp4Box("mvhd", be((4, 0x01000000), (8, 0L), (8, 0L), (4, ts), (8, dur),
        (4, 0x10000), (2, 0x100), (10, 0)) ++ unity ++ be((24, 0), (4, 2)))
      else mp4Box("mvhd", be((4, 0), (4, 0), (4, 0), (4, ts), (4, dur.toInt),
        (4, 0x10000), (2, 0x100), (10, 0)) ++ unity ++ be((24, 0), (4, 2)))
    val traks = dims.zipWithIndex.map { case ((w, h), i) =>
      val tkhd =
        if (v1) mp4Box("tkhd", be((4, 0x01000007), (8, 0L), (8, 0L), (4, i + 1),
          (4, 0), (8, dur), (8, 0), (2, 0), (2, 0), (2, 0), (2, 0)) ++ unity ++
          be((4, w << 16), (4, h << 16)))
        else mp4Box("tkhd", be((4, 7), (4, 0), (4, 0), (4, i + 1), (4, 0),
          (4, dur.toInt), (8, 0), (2, 0), (2, 0), (2, 0), (2, 0)) ++ unity ++
          be((4, w << 16), (4, h << 16)))
      mp4Box("trak", tkhd)
    }
    mp4Box("ftyp", "isom".getBytes ++ be((4, 0x200))) ++
      mp4Box("moov", mvhd ++ traks.flatten.toArray, largesize = largeMoov)
  }

  test("silenceSpans: islands merge, loud files empty, threshold boundary") {
    import graft.textops.Multimodal
    def sq(n: Int, a: Int) = Array.tabulate[Short](n)(i => if (i % 2 == 0) a.toShort else (-a).toShort)
    val lql = wavBytes(8000, sq(16, 12000) ++ sq(16, 3) ++ sq(16, 11000))
    val quiet2runs = wavBytes(8000, sq(16, 5) ++ sq(16, 9000) ++ sq(16, 7))
    val loud = wavBytes(8000, sq(32, 5000))
    val df = Seq((0L, lql), (1L, quiet2runs), (2L, loud)).toDF("id", "payload")
    val out = Multimodal.silenceSpans(df, "id", "payload", 16, 100.0)
      .as[(Long, Int, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // id 0: one island (window 1); id 1: two separated 1-window islands
    assert(out.toSeq === Seq((0L, 1, 1, 1L), (1L, 0, 0, 1L), (1L, 2, 2, 1L)))
    // exact-threshold window (rms = 100) is NOT silent (strict <)
    val edge = Multimodal.silenceSpans(
      Seq((9L, wavBytes(8000, sq(16, 100)))).toDF("id", "payload"), "id", "payload", 16, 100.0)
    assert(edge.count() === 0L)
  }

  test("charEntropy: closed forms - uniform, constant, empty") {
    import graft.textops.TextOps
    val df = Seq("aaaa", "ab", "abcd", "", "aabb").toDF("t")
    val out = df.select(TextOps.charEntropy(col("t"))).as[Double].collect()
    assert(out(0) === 0.0)        // single symbol
    assert(out(1) === 1.0)        // two equiprobable -> 1 bit
    assert(out(2) === 2.0)        // four equiprobable -> 2 bits
    assert(out(3) === 0.0)        // empty
    assert(out(4) === 1.0)        // multiplicity doesn't change the distribution
  }

  test("nfcNormalize: composes decomposed marks, identity fast path, null") {
    import graft.textops.TextOps
    val decomposed = "café" // e + combining acute U+0301
    val composed = "café"
    val df = Seq(Some(decomposed), Some(composed), Some("plain"), None).toDF("t")
    val out = df.select(TextOps.nfcNormalize(col("t")).as("n"),
        length(col("t")).as("lb"), length(TextOps.nfcNormalize(col("t"))).as("la"))
      .collect()
    assert(out(0).getString(0) === composed && out(0).getInt(1) === 5 && out(0).getInt(2) === 4)
    assert(out(1).getString(0) === composed && out(1).getInt(1) === 4)
    assert(out(2).getString(0) === "plain")
    assert(out(3).isNullAt(0))
  }

  test("parseSrt: cue timing math, multi-line text join, CPS, malformed drop") {
    import graft.textops.Captions
    val srt = "1\n00:00:01,500 --> 00:00:03,000\nhello there\nworld\n\n" +
      "2\n00:01:00.000 --> 00:01:00.000\nzero length\n\n" +
      "oops no header\n\n" +
      "3\n00:02:00,000 --> 00:01:00,000\nbackwards"
    val out = Captions.parseSrt(Seq((7L, srt)).toDF("id", "s"), col("id"), col("s"))
      .orderBy("cue_index")
      .as[(Long, Int, Long, Long, Long, String, Long, Option[Double])].collect()
    assert(out.length === 3) // headerless block dropped
    assert(out(0)._3 === 1500L && out(0)._4 === 3000L && out(0)._5 === 1500L)
    assert(out(0)._6 === "hello there world" && out(0)._7 === 17L)
    assert(math.abs(out(0)._8.get - 17000.0 / 1500) < 1e-9)
    // VTT-style dot separator parses; zero duration -> NULL cps
    assert(out(1)._5 === 0L && out(1)._8.isEmpty)
    // negative duration also has no defined rate
    assert(out(2)._5 === -60000L && out(2)._8.isEmpty)
  }

  test("videoMeta: box walk reads back written fields; v1 and largesize paths; stub") {
    val f0 = mp4Fixture(1000, 5000L, Seq((640, 360)))
    val f1 = mp4Fixture(600, 1234L, Seq((0, 0), (320, 240)), v1 = true)
    val f2 = mp4Fixture(90000, 90000L, Seq((1920, 1080)), largeMoov = true)
    val truncated = f0.take(40) // moov header cut off mid-box
    val df = Seq((0L, f0), (1L, f1), (2L, f2), (3L, truncated),
      (4L, "not a video".getBytes)).toDF("id", "payload")
    val out = Multimodal.videoMeta(df, "id", "payload").collect().sortBy(_.id)
    assert((out(0).major_brand, out(0).timescale, out(0).n_tracks,
      out(0).width, out(0).height) === (("isom", 1000, 1, 640, 360)))
    assert(math.abs(out(0).duration_ms - 5000.0) < 1e-9)
    // v1 boxes; dims come from the FIRST trak with nonzero width (the second)
    assert((out(1).timescale, out(1).n_tracks, out(1).width, out(1).height) ===
      ((600, 2, 320, 240)))
    assert(math.abs(out(1).duration_ms - 1234000.0 / 600) < 1e-9)
    // 64-bit largesize moov still walks
    assert((out(2).width, out(2).height) === ((1920, 1080)))
    // truncated and non-video payloads both take the deterministic stub
    assert(out(3).major_brand === "stub" && out(4).major_brand === "stub")
    assert((out(4).timescale, out(4).n_tracks) === ((600, 2))) // len 11 → odd
  }

  test("EBML walk: webm/matroska fields read back; unknown-size segment; defaults; stub") {
    // programmatic EBML builder (1-byte size VINTs suffice here)
    def el(id: Seq[Int], body: Array[Byte]): Array[Byte] =
      (id.map(_.toByte) :+ (0x80 | body.length).toByte).toArray ++ body
    def uint(v: Long, w: Int): Array[Byte] =
      (1 to w).map(i => ((v >> (8 * (w - i))) & 0xff).toByte).toArray
    val hdr = el(Seq(0x1a, 0x45, 0xdf, 0xa3),
      el(Seq(0x42, 0x82), "webm".getBytes("ISO-8859-1")))
    val info = el(Seq(0x15, 0x49, 0xa9, 0x66),
      el(Seq(0x2a, 0xd7, 0xb1), uint(1000000L, 3)) ++
        el(Seq(0x44, 0x89), uint(java.lang.Float.floatToIntBits(4250f).toLong, 4)))
    val video = el(Seq(0xe0),
      el(Seq(0xb0), uint(640, 2)) ++ el(Seq(0xba), uint(360, 2)))
    val trkV = el(Seq(0xae), el(Seq(0xd7), uint(1, 1)) ++ el(Seq(0x83), uint(1, 1)) ++ video)
    val trkA = el(Seq(0xae), el(Seq(0xd7), uint(2, 1)) ++ el(Seq(0x83), uint(2, 1)))
    val tracks = el(Seq(0x16, 0x54, 0xae, 0x6b), trkV ++ trkA)
    val webm = hdr ++ el(Seq(0x18, 0x53, 0x80, 0x67), info ++ tracks)
    assert(Multimodal.decodeEbmlHeader(webm) ===
      Some(("webm", 1000000, 4250.0, 2, 640, 360)))
    // unknown-size segment (streamed): size byte 0xFF means to-end; Info omits
    // TimestampScale -> spec default 1e6 ns; f64 Duration path
    val info2 = el(Seq(0x15, 0x49, 0xa9, 0x66),
      el(Seq(0x44, 0x89), uint(java.lang.Double.doubleToLongBits(1234.5), 8)))
    val seg2 = Array[Byte](0x18, 0x53, 0x80.toByte, 0x67, 0xff.toByte) ++ info2 ++
      el(Seq(0x16, 0x54, 0xae, 0x6b), trkV)
    val mkv = el(Seq(0x1a, 0x45, 0xdf, 0xa3),
      el(Seq(0x42, 0x82), "matroska".getBytes("ISO-8859-1"))) ++ seg2
    assert(Multimodal.decodeEbmlHeader(mkv) ===
      Some(("matroska", 1000000, 1234.5, 1, 640, 360)))
    // sniff routes EBML to video; truncated/garbage payloads take the stub
    val df = Seq((0L, webm), (1L, webm.take(9)), (2L, "nope".getBytes)).toDF("id", "payload")
    val sniff = Multimodal.sniffTypes(df, "id", "payload").collect().sortBy(_.id)
    assert(sniff.map(_.kind).toSeq === Seq("video", "video", "unknown"))
    val out = Multimodal.videoMeta(df, "id", "payload").collect().sortBy(_.id)
    assert(out(0).major_brand === "webm" && out(0).n_tracks === 2)
    assert(out(1).major_brand === "stub" && out(2).major_brand === "stub")
  }

  test("audioEnergy: square-wave RMS closed form; ragged last window; stub path") {
    // amplitude-A square wave → rms = A exactly in every window
    val sq = Array.tabulate[Short](40)(i => if (i % 2 == 0) 1200 else -1200)
    val df = Seq((0L, wavBytes(8000, sq)), (1L, Array[Byte](0, 0, 0))).toDF("id", "payload")
    val out = Multimodal.audioEnergy(df, "id", "payload", windowSamples = 16)
      .collect().sortBy(w => (w.id, w.window_index))
    val w0 = out.filter(_.id == 0L)
    assert(w0.map(_.n_samples).toSeq === Seq(16, 16, 8))
    w0.foreach { w => assert(math.abs(w.rms - 1200.0) < 1e-9); assert(w.peak === 1200) }
    // stub: 3 zero bytes → samples -128 each → rms 128, one window
    val w1 = out.filter(_.id == 1L)
    assert(w1.map(w => (w.n_samples, w.rms, w.peak)).toSeq === Seq((3, 128.0, 128)))
  }

  test("audioEnergy: stereo reads channel 0; AIFF (big-endian) decodes like WAV") {
    // stereo WAV: L = 500-amplitude square, R = constant 30000 — rms must be 500
    val frames = Array.tabulate(20)(i => (if (i % 2 == 0) 500 else -500, 30000))
    val data = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(data)
    def le32(v: Int): Unit = { o.write(v); o.write(v >> 8); o.write(v >> 16); o.write(v >> 24) }
    def le16(v: Int): Unit = { o.write(v); o.write(v >> 8) }
    o.writeBytes("RIFF"); le32(36 + frames.length * 4); o.writeBytes("WAVE")
    o.writeBytes("fmt "); le32(16); le16(1); le16(2); le32(8000); le32(8000 * 4)
    le16(4); le16(16)
    o.writeBytes("data"); le32(frames.length * 4)
    frames.foreach { case (l, r) => le16(l & 0xffff); le16(r & 0xffff) }
    // AIFF via the JDK's own writer from the mono square fixture (big-endian path)
    val monoSq = Array.tabulate[Short](20)(i => if (i % 2 == 0) 700 else -700)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(monoSq.flatMap(s =>
        Array(((s >> 8) & 0xff).toByte, (s & 0xff).toByte))), fmt, monoSq.length)
    val aiffOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.AIFF, aiffOut)
    val df = Seq((0L, data.toByteArray), (1L, aiffOut.toByteArray)).toDF("id", "payload")
    val out = Multimodal.audioEnergy(df, "id", "payload", windowSamples = 20)
      .collect().sortBy(_.id)
    assert(math.abs(out(0).rms - 500.0) < 1e-9 && out(0).peak === 500)
    assert(math.abs(out(1).rms - 700.0) < 1e-9 && out(1).peak === 700)
  }

  test("frame sampling decodes real animated-GIF frames, stubs undecodable payloads") {
    // build a 3-frame animated GIF with the JDK's own sequence writer
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val rasters = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 4; y <- 0 until 2)
        img.setRGB(x, y, ((40 * f + 10 * x) << 16) | ((30 * f + 20 * y) << 8) | (60 * f))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      img
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = baos.toByteArray

    val frames = Multimodal.decodeFrames(gif).get.map(_._2)
    assert(frames.size === 3)
    assert(frames.forall(f => f.getWidth == 4 && f.getHeight == 2))
    // strided decode reads ONLY the sampled frames and carries their true indices
    assert(Multimodal.decodeFrames(gif, stride = 2).get.map(_._1) === Vector(0, 2))

    val df = Seq((0L, gif), (1L, "not an image payload".getBytes)).toDF("id", "payload")
    val sampled = Multimodal.sampleFrames(df, "id", "payload", stride = 2).collect()
    val gifRows = sampled.filter(_.id == 0L).sortBy(_.frame_index)
    assert(gifRows.map(_.frame_index).toSeq === Seq(0, 2))
    // each fingerprint is the md5 of that frame's packed-RGB24 raster (GIF is
    // palettized, so compare against the DECODED raster, not the source RGB)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = Seq(0, 2).map { f =>
      val rgb = Multimodal.bilinearRgb(frames(f), 4, 2)
      md.digest(rgb).map(b => f"$b%02x").mkString
    }
    assert(gifRows.map(_.frame_md5).toSeq === expected)
    assert(expected.distinct.size === 2) // frames genuinely differ
    // undecodable payload: deterministic stub byte ranges, still emitted
    assert(sampled.exists(_.id == 1L))
  }

  test("perceptual dHash pairs near-identical images, separates unrelated ones") {
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 16; y <- 0 until 16) img.setRGB(x, y, f(x, y))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val gradient = png((x, _) => { val v = x * 16; (v << 16) | (v << 8) | v })
    val tweaked = png((x, y) =>
      if (x == 7 && y == 3) 0xffffff
      else { val v = x * 16; (v << 16) | (v << 8) | v })
    val inverted = png((x, _) => { val v = 255 - x * 16; (v << 16) | (v << 8) | v })
    val h = Seq(gradient, tweaked, inverted).map(b => Multimodal.dHash64(b).get)
    assert(java.lang.Long.bitCount(h(0) ^ h(1)) <= 3) // one-pixel edit: near
    assert(java.lang.Long.bitCount(h(0) ^ h(2)) > 16) // inverted gradient: far
    assert(Multimodal.dHash64("not an image".getBytes).isEmpty)
    val df = Seq((0L, gradient), (1L, tweaked), (2L, inverted),
      (3L, "not an image".getBytes)).toDF("id", "payload")
    val pairs = Multimodal.perceptualHashPairs(df, "id", "payload", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((0L, 1L)))
  }

  test("rolling fingerprints match hand-computed winnowing values") {
    // expected values computed independently in python (B=131, M=1e9+7, k=8, w=4)
    val out = Seq("the quick brown fox jumps", "abcdefgh", "abc").toDF("t")
      .select(graft.functions.rolling_fingerprints(col("t"), 8, 4).as("fp"))
      .as[Seq[Long]].collect()
    assert(out(0) === Seq(51176257L, 115199380L, 151386197L, 186527843L, 203183807L,
      257891742L, 506694683L))
    assert(out(1) === Seq(407772522L)) // fewer hashes than the window: one global min
    assert(out(2) === Seq.empty)       // shorter than k: no fingerprints
  }

  test("candidate-generation pipelines never plan an all-pairs join") {
    // regression guard: every near-dup pair generator must stay equi-join shaped —
    // a cartesian / nested-loop join here is the canonical 100TB scale-killer
    val d = docs.select(col("doc_id"), col("text"), col("lang"))
    Seq(
      Dedup.simhash64Pairs(d, "doc_id", "text"),
      Dedup.minhashLshPairs(d, "doc_id", "text", 0.5),
      Dedup.tokenJaccardPairs(d, "doc_id", "text", Seq(col("lang")), 0.9),
      Dedup.ngramJaccardPairs(d, "doc_id", "text", 3, Seq(col("lang")), 0.5),
      Dedup.tokenJaccardPairsPrefix(d, "doc_id", "text", Seq.empty, 0.9),
      Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, Seq.empty, 0.5)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"all-pairs join in plan:\n${plan.take(2000)}")
    }
  }

  test("prefix-filtered jaccard equals the plain co-occurrence join, blocked and not") {
    // the prefix filter changes CANDIDATE GENERATION only; with the exact verify the
    // output must match tokenJaccardPairs pair for pair, digit for digit
    val base = docs.select(col("doc_id"), col("text"), col("lang")).limit(200)
    val planted = base.unionByName(base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"), col("lang")))
    def collectPairs(df: org.apache.spark.sql.DataFrame) = graft.util.Caching.withCached {
      df.select("id_l", "id_r", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    }
    val plain = collectPairs(
      Dedup.tokenJaccardPairs(planted, "doc_id", "text", Seq.empty, 0.5))
    val prefix = collectPairs(
      Dedup.tokenJaccardPairsPrefix(planted, "doc_id", "text", Seq.empty, 0.5))
    assert(plain.nonEmpty)
    assert(prefix === plain)
    val plainBlk = collectPairs(
      Dedup.tokenJaccardPairs(planted, "doc_id", "text", Seq(col("lang")), 0.5))
    val prefixBlk = collectPairs(
      Dedup.tokenJaccardPairsPrefix(planted, "doc_id", "text", Seq(col("lang")), 0.5))
    assert(prefixBlk === plainBlk)
    // the shingle-space variant must match the plain ngram join the same way
    val plainNg = collectPairs(
      Dedup.ngramJaccardPairs(planted, "doc_id", "text", 3, Seq(col("lang")), 0.5))
    val prefixNg = collectPairs(
      Dedup.ngramJaccardPairsPrefix(planted, "doc_id", "text", 3, Seq.empty, 0.5))
    // blockless prefix ⊇ blocked plain (blocking can only drop cross-block pairs)
    assert(plainNg.subsetOf(prefixNg))
    assert(prefixNg.nonEmpty)
  }

  test("embedding LSH dedup matches brute force exactly on planted near-dups, no cartesian") {
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val d = lit(0.02) + (col("vec_id") % 7).cast("double") * lit(0.01)
    val planted = base.unionByName(base.filter(col("vec_id") % 5 === 0)
      .withColumn("jittered", transform(col("embedding"), (x, i) =>
        x + d * element_at(col("embedding"), ((i + 1) % size(col("embedding"))) + 1)))
      .select((col("vec_id") + 100000).as("vec_id"), col("jittered").as("embedding")))
    val brute = Dedup.embeddingPairs(planted, "vec_id", "embedding", 0.9)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    val lshDf = Dedup.embeddingLshPairs(planted, "vec_id", "embedding", 0.9)
    val plan = lshDf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "LSH dedup plan must not contain an all-pairs join")
    val lsh = lshDf.select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(lsh === brute)
  }

  test("semantic dedup pairs are a subset of brute force with high planted recall") {
    import graft.textops.Similarity
    // PERTURBED copies (component-shifted, cosine ≈ 0.995 but not 1.0) so cell
    // co-location is genuinely tested, not guaranteed by identical directions
    val d = lit(0.02)
    val planted = emb.select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
      .unionByName(
        emb.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 100000).as("vec_id"),
            transform(col("embedding").cast("array<double>"), (x, i) =>
              x + d * element_at(col("embedding").cast("array<double>"),
                ((i + 1) % size(col("embedding"))) + 1)).as("embedding")))
    val brute = Dedup.embeddingPairs(planted, "vec_id", "embedding", 0.9)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    // explicit k AND the auto-k default must both hold subset + recall
    for ((kArg, cellSize) <- Seq(8 -> 512, 0 -> 64)) {
      val semantic = Dedup.semanticPairs(planted, "vec_id", "embedding", 0.9,
          k = kArg, targetCellSize = cellSize)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      assert(semantic.subsetOf(brute),
        s"k=$kArg: semantic pairs must be exact-verified: ${(semantic -- brute).take(5)}")
      val plantedPairs = brute.filter { case (l, r) => r - l == 100000 }
      val found = plantedPairs.count(semantic.contains)
      assert(found >= (plantedPairs.size * 0.8).toInt,
        s"k=$kArg: found $found of ${plantedPairs.size} planted semantic dups")
      spark.sqlContext.clearCache()
    }
  }

  // Arbitrary-angle regime (random embeddings, no planted structure — the HARDEST
  // case for bucketed ANN): the parameters below are sized for ≥0.9 recall against
  // brute force at the default fixed seeds, with measured headroom (LSH 32×4 scored
  // 1.0, IVF nprobe=12/16 scored 0.94, IVF-PQ 12/48 scored 0.94 on this corpus).
  // Recall-vs-parameters is monotone, so a regression here means the candidate
  // generation broke, not that the fixture got unlucky. The planted near-dup regime
  // (what production dedup actually runs at DEFAULT parameters) is pinned at ≥0.9
  // separately below.
  test("LSH band tuner reproduces the independently-computed S-curve error table") {
    import graft.textops.Dedup
    // independent reimplementation (plain Scala loop) of the midpoint Riemann sum
    def err(r: Int, b: Int): Double = {
      val s = (1 to 1000).map { i =>
        val x = (i - 0.5) / 1000.0
        val p = 1.0 - math.pow(1.0 - math.pow(x, r), b)
        if (x < 0.8) p else 1.0 - p
      }.sum / 1000.0
      math.round(s * 1e6) / 1e6
    }
    val got = Dedup.lshTuningTable(spark, 32, 0.8).collect()
      .map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2), r.getBoolean(4)))).toMap
    assert(got.keySet === Set(1, 2, 4, 8, 16, 32))
    got.foreach { case (r, (b, e, _)) =>
      assert(b === 32 / r)
      assert(math.abs(e - err(r, b)) < 2e-6, s"band_size=$r err $e vs ${err(r, b)}")
    }
    // exactly one chosen row, and at t=0.8 with k=32 it is band_size=8 (S-curve
    // midpoint (1/4)^(1/8) ≈ 0.84 sits closest to the target)
    assert(got.count(_._2._3) === 1)
    assert(got(8)._3, s"expected band_size=8 chosen, got $got")
  }

  test("LSH top-k recall vs brute force ≥ 0.9 (32 tables × 4 planes)") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding", 5,
        nTables = 32, planesPerTable = 4)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF top-k recall vs brute force ≥ 0.9 (nprobe=12 of k=16)") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val model = graft.textops.Ivf.fit(emb, "vec_id", "embedding", k = 16)
    val ivf = graft.textops.Ivf.topK(emb, queries, "vec_id", "embedding", 5, model, nprobe = 12)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("k-means|| fit: recall ≥ 0.9, determinism, and non-degenerate seed spread") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val model = graft.textops.Ivf.fitScalable(emb, "vec_id", "embedding", k = 16)
    assert(model.centroids.length === 16)
    // farthest-point reduction must not duplicate a seed
    assert(model.centroids.map(_.toSeq).distinct.length === 16)
    val ivf = graft.textops.Ivf.topK(emb, queries, "vec_id", "embedding", 5, model,
        nprobe = 12)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
    val again = graft.textops.Ivf.fitScalable(emb, "vec_id", "embedding", k = 16)
    assert(model.centroids.map(_.toSeq).toSeq === again.centroids.map(_.toSeq).toSeq)
  }

  test("k-means|| seeding separates planted far clusters that uniform seeding merges") {
    import spark.implicits._
    // two tight far-apart clusters + a diffuse mass: distance-proportional
    // oversampling must put at least one seed in EACH tight cluster
    val rows = (0 until 300).map { i =>
      val base = Array.fill(4)(0.0)
      if (i % 100 == 0) base(0) = 100.0 + i // far tight cluster A anchors
      else if (i % 100 == 1) base(1) = 100.0 + i // far tight cluster B anchors
      else { base(2) = 1.0 + (i % 7) * 0.01; base(3) = 1.0 } // diffuse mass
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val model = graft.textops.Ivf.fitScalable(rows, "vec_id", "embedding",
      k = 4, rounds = 4, oversample = 4.0)
    // normalized cluster-A anchors ≈ e0, cluster-B ≈ e1: some centroid must be
    // dominated by each axis
    assert(model.centroids.exists(c => c(0) > 0.9), "no seed near cluster A")
    assert(model.centroids.exists(c => c(1) > 0.9), "no seed near cluster B")
  }

  test("PQ encode/ADC match hand-computed codes and scores on explicit codebooks") {
    import graft.textops.Pq
    // m=2 subspaces of dim 2, ksub=2 — small enough to argmin by hand:
    //   sub 0 codebook: c0=(1,0), c1=(0,1);  sub 1 codebook: c0=(1,1), c1=(-1,0)
    val model = Pq.Model(Array(
      Array(Array(1.0, 0.0), Array(0.0, 1.0)),
      Array(Array(1.0, 1.0), Array(-1.0, 0.0))))
    val df = Seq(
      (1L, Seq(0.9, 0.1, 0.8, 1.2)), // sub0 → c0, sub1 → c0
      (2L, Seq(0.2, 1.1, -0.7, 0.1)) // sub0 → c1, sub1 → c1
    ).toDF("id", "v")
    val coded = df.select(col("id"),
        graft.functions.pq_encode(col("v"), model.codebooks).as("codes"),
        round(graft.functions.pq_adc_score(
          graft.functions.pq_encode(col("v"), model.codebooks),
          col("v"), model.codebooks), 6).as("adc"))
      .as[(Long, Seq[Int], Double)].collect().sortBy(_._1)
    assert(coded.map(r => (r._1, r._2)).toSeq ===
      Seq((1L, Seq(0, 0)), (2L, Seq(1, 1))))
    // ADC of a row against ITSELF = dot(v_sub, chosen centroid) summed:
    //   row 1: (0.9·1 + 0.1·0) + (0.8·1 + 1.2·1) = 0.9 + 2.0 = 2.9
    //   row 2: (0.2·0 + 1.1·1) + (−0.7·−1 + 0.1·0) = 1.1 + 0.7 = 1.8
    assert(coded.map(_._3).toSeq === Seq(2.9, 1.8))
  }

  test("IVF-PQ top-k recall vs brute force ≥ 0.9 (nprobe=12, refine=48)") {
    val queries = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val ivf = graft.textops.Ivf.fit(emb, "vec_id", "embedding", k = 16)
    val pq = graft.textops.Pq.fit(emb, "vec_id", "embedding", dim = 64)
    val found = graft.textops.Pq.topK(emb, queries, "vec_id", "embedding", 5, ivf, pq,
        nprobe = 12, refine = 48)
      .select("query_id", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & found).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("streaming minhash dedup equals the batch incremental run across micro-batches") {
    import graft.streaming.StreamOps
    val d = docs.select(col("doc_id"), col("text"))
    val b1 = d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val b2 = d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 9000).as("doc_id"), concat(col("text"), lit(" t")).as("text"))
    val incoming = b1.unionByName(b2)
    val batchRun = Dedup.incrementalMinhashPairs(d, incoming, "doc_id", "text", 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    // stage the two batches as separate files; cross-batch pairs (b1 doc vs its b2
    // near-copy) exist ONLY if the index grows at ingest — the property under test
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_mh_spec")
    val target = tmp.resolve("in")
    java.nio.file.Files.createDirectories(target)
    try {
      Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
        val part = tmp.resolve(s"b$i")
        b.coalesce(1).write.mode("overwrite").parquet(part.toString)
        val listing = java.nio.file.Files.list(part)
        val file =
          try listing.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
          finally listing.close()
        java.nio.file.Files.copy(file, target.resolve(f"$i%04d.parquet"))
      }
      val streamed = StreamOps.streamingMinhashDedup(
          spark, d, target.toString, "doc_id", "text", 0.5)
        .select("id_l", "id_r").as[(Long, Long)].collect().toSet
      assert(batchRun.nonEmpty)
      // cross-batch pair present (b1 id 5000+x vs b2 id 9000+x share the text)
      assert(streamed.exists { case (l, r) => l >= 5000 && l < 9000 && r >= 9000 },
        "no cross-micro-batch pair found — the index did not grow at ingest")
      assert(streamed === batchRun)
    } finally {
      spark.sqlContext.clearCache()
      java.nio.file.Files.walk(tmp)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("stored minhash band index reproduces in-memory incremental pairs exactly") {
    val d = docs.select(col("doc_id"), col("text"))
    val incoming = d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 5000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_mhidx_spec").toString
    val direct = Dedup.incrementalMinhashPairs(d, incoming, "doc_id", "text", 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    Dedup.writeMinhashIndex(d, "doc_id", "text", tmp)
    val fromIndex = Dedup.incrementalMinhashPairsFromIndex(
        tmp, d, incoming, "doc_id", "text", 0.5)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    spark.sqlContext.clearCache()
    assert(direct.nonEmpty)
    assert(fromIndex === direct)
  }

  test("LSH and IVF top-k pin >= 0.9 planted near-dup recall on a clustered+uniform mix") {
    import graft.textops.Ivf
    // Adversarial corpus: the uniform base + 8 DENSE clusters (40 jittered copies of
    // each of 8 base vectors — they crowd LSH buckets and soak up IVF centroids) +
    // a planted near-dup (cosine ≈ 0.9995) for every query. The ≥0.5 tests above
    // cover the arbitrary-angle regime; THIS is the near-dup regime the default
    // parameters are sized for (hyperplane miss math in Dedup.embeddingLshPairs),
    // so the gate is 0.9, with the default fixed seeds.
    val base = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val clusters = base.filter(col("vec_id") < 8)
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(39))).as("c"))
      .select((col("vec_id") * 100 + col("c") + 300000).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x + (lit(0.05) + col("c").cast("double") * lit(0.003)) *
            element_at(col("embedding"),
              ((i + col("c")) % size(col("embedding"))) + 1)).as("embedding"))
    val queries = base.filter(col("vec_id") >= 10 && col("vec_id") < 200 &&
      col("vec_id") % 5 === 0)
    val dups = queries.select((col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x + lit(0.02) * element_at(col("embedding"),
          ((i + 1) % size(col("embedding"))) + 1)).as("embedding"))
    val corpus = base.unionByName(clusters).unionByName(dups)
    val nQueries = queries.count()
    assert(nQueries === 38L) // fixture sanity: the gate below divides by this

    val lshFound = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 5)
      .filter(col("id") === col("query_id") + 100000).count()
    assert(lshFound >= math.ceil(nQueries * 0.9).toLong,
      s"LSH found $lshFound of $nQueries planted near-dups in top-5")

    val model = Ivf.fit(corpus, "vec_id", "embedding", k = 24)
    val ivfFound = Ivf.topK(corpus, queries, "vec_id", "embedding", 5, model, nprobe = 4)
      .filter(col("id") === col("query_id") + 100000).count()
    assert(ivfFound >= math.ceil(nQueries * 0.9).toLong,
      s"IVF found $ivfFound of $nQueries planted near-dups in top-5")

    // IVF-PQ shares IVF's probe geometry; the coarse quantizer must not lose the
    // planted near-dup, and the 4-int ADC shortlist must keep it for the refine pass
    val pqModel = graft.textops.Pq.fit(corpus, "vec_id", "embedding", dim = 64)
    val pqFound = graft.textops.Pq.topK(
        corpus, queries, "vec_id", "embedding", 5, model, pqModel, nprobe = 4)
      .filter(col("id") === col("query_id") + 100000).count()
    assert(pqFound >= math.ceil(nQueries * 0.9).toLong,
      s"IVF-PQ found $pqFound of $nQueries planted near-dups in top-5")

    // SQ8 has no bucketing to miss — the only loss channel is the integer ADC
    // shortlist dropping the near-dup, and at cosine ≈ 0.9995 the quantized dot
    // dominates every non-dup score, so the gate matches the others
    val sqFound = Similarity.sqTopK(corpus, queries, "vec_id", "embedding", 5)
      .filter(col("id") === col("query_id") + 100000).count()
    assert(sqFound >= math.ceil(nQueries * 0.9).toLong,
      s"SQ8 found $sqFound of $nQueries planted near-dups in top-5")
    spark.sqlContext.clearCache()
  }

  test("SQ8 top-k: hand-computed 2-D ranking; >= 0.9 recall vs brute force") {
    import spark.implicits._
    // scale = 1 (id 1 normalizes to (1,0)); codes: (0.6,0.8)→(76,102), (1,0)→(127,0),
    // (0,1)→(0,127). ADC for query 0: id1 = 76·127 = 9652, id2 = 102·127 = 12954 —
    // the integer shortlist already orders id2 first, and exact cosine agrees
    val tiny = Seq((0, Seq(3.0, 4.0)), (1, Seq(1.0, 0.0)), (2, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val got = Similarity.sqTopK(tiny, tiny.filter(col("vec_id") === 0),
        "vec_id", "embedding", k = 2)
      .select("query_id", "rank", "id", "cosine").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq === Seq((0, 1, 2, 0.8), (0, 2, 1, 0.6)))

    // random 64-dim regime: the ADC shortlist (refine·k = 20) must keep at least
    // 90% of the true top-5 for the exact re-rank to surface
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = pairs(Similarity.sqTopK(emb, queries, "vec_id", "embedding", 5))
    val brute = pairs(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val recall = (sq intersect brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"SQ8 recall vs brute force = $recall")
  }

  test("IVF on-disk index equals in-memory topK and prunes unprobed cell partitions") {
    val queries = emb.filter(col("vec_id") < 20)
    val model = graft.textops.Ivf.fit(emb, "vec_id", "embedding", k = 16)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    try {
      graft.textops.Ivf.writeIndex(emb, "vec_id", "embedding", model, tmp)
      val fromIndex = graft.textops.Ivf.topKFromIndex(
        spark, tmp, queries, "vec_id", "embedding", 5, model, nprobe = 4)
      val inMemory = graft.textops.Ivf.topK(
        emb, queries, "vec_id", "embedding", 5, model, nprobe = 4)
      assert(fromIndex.collect().toSet === inMemory.collect().toSet)
      val scan = fromIndex.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("cell"),
        s"index scan must prune on the cell partition column:\n${scan.take(2000)}")
    } finally {
      import java.nio.file.{Files, Path, Paths}
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("IVF appendToIndex equals a from-scratch rebuild under the same model") {
    import graft.textops.Ivf
    val queries = emb.filter(col("vec_id") < 20)
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val batch = emb.filter(col("vec_id") % 4 === 3)
    val model = Ivf.fit(base, "vec_id", "embedding", k = 16) // model fixed at base
    val grown = java.nio.file.Files.createTempDirectory("graft_ivf_grow").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("graft_ivf_full").toString
    try {
      Ivf.writeIndex(base, "vec_id", "embedding", model, grown)
      Ivf.appendToIndex(batch, "vec_id", "embedding", model, grown)
      Ivf.writeIndex(emb, "vec_id", "embedding", model, rebuilt)
      val a = Ivf.topKFromIndex(spark, grown, queries, "vec_id", "embedding", 5, model)
      val b = Ivf.topKFromIndex(spark, rebuilt, queries, "vec_id", "embedding", 5, model)
      assert(a.collect().toSet === b.collect().toSet)
    } finally {
      import java.nio.file.{Files, Path, Paths}
      Seq(grown, rebuilt).foreach(d =>
        Files.walk(Paths.get(d)).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p)))
    }
  }

  test("PQ appendToIndex equals a from-scratch rebuild under the same models") {
    import graft.textops.{Ivf, Pq}
    val queries = emb.filter(col("vec_id") < 20)
    val base = emb.filter(col("vec_id") % 4 =!= 3)
    val batch = emb.filter(col("vec_id") % 4 === 3)
    val ivf = Ivf.fit(base, "vec_id", "embedding", k = 16)
    val pq = Pq.fit(base, "vec_id", "embedding", dim = 64)
    val grown = java.nio.file.Files.createTempDirectory("graft_pq_grow").toString
    val rebuilt = java.nio.file.Files.createTempDirectory("graft_pq_full").toString
    try {
      Pq.writeIndex(base, "vec_id", "embedding", ivf, pq, grown)
      Pq.appendToIndex(batch, "vec_id", "embedding", ivf, pq, grown)
      Pq.writeIndex(emb, "vec_id", "embedding", ivf, pq, rebuilt)
      val a = Pq.topKFromIndex(spark, grown, emb, queries, "vec_id", "embedding", 5, ivf, pq)
      val b = Pq.topKFromIndex(spark, rebuilt, emb, queries, "vec_id", "embedding", 5, ivf, pq)
      assert(a.collect().toSet === b.collect().toSet)
    } finally {
      import java.nio.file.{Files, Path, Paths}
      Seq(grown, rebuilt).foreach(d =>
        Files.walk(Paths.get(d)).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p)))
    }
  }

  test("PQ on-disk code index equals in-memory topK, prunes cells, reads no vectors") {
    import graft.textops.{Ivf, Pq}
    val queries = emb.filter(col("vec_id") < 20)
    val ivf = Ivf.fit(emb, "vec_id", "embedding", k = 16)
    val pq = Pq.fit(emb, "vec_id", "embedding", dim = 64)
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq").toString
    try {
      Pq.writeIndex(emb, "vec_id", "embedding", ivf, pq, tmp)
      val inMem = Pq.topK(emb, queries, "vec_id", "embedding", 5, ivf, pq)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      val fromIndex = Pq.topKFromIndex(
        spark, tmp, emb, queries, "vec_id", "embedding", 5, ivf, pq)
      val got = fromIndex
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got === inMem)
      val scan = fromIndex.queryExecution.executedPlan.toString
      assert(scan.contains("PartitionFilters") && scan.contains("cell"),
        s"index scan must prune on the cell partition column:\n${scan.take(2000)}")
      // the index itself must never store raw vectors — codes only
      val indexSchema = spark.read.parquet(tmp).schema.fieldNames.toSet
      assert(indexSchema === Set("cell", "id", "codes"))
    } finally {
      import java.nio.file.{Files, Path, Paths}
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("PCA: hand-computed 2-D eigensystem and planted-axis recovery at 64 dims") {
    import graft.textops.Pca
    // 2-D fixture with a known eigensystem: points (±2, ±1) on the diagonal —
    // mean (0,0), cov = [[4, 2], [2, 1]] → eigenvalues 5 and 0, PC1 = (2,1)/√5
    val tiny = Seq(
      Seq(2.0, 1.0), Seq(-2.0, -1.0), Seq(4.0, 2.0), Seq(-4.0, -2.0)
    ).toDF("v")
    val m = Pca.fit(tiny, "v", r = 2)
    // cov = E[xxᵀ] over the 4 pts = [[10,5],[5,2.5]] → λ = (trace, 0) = (12.5, 0)
    assert(math.abs(m.variance(0) - 12.5) < 1e-9)
    assert(math.abs(m.variance(1)) < 1e-9)
    val s5 = math.sqrt(5.0)
    assert(math.abs(m.components(0)(0) - 2.0 / s5) < 1e-9)
    assert(math.abs(m.components(0)(1) - 1.0 / s5) < 1e-9)
    val proj = Pca.project(tiny, "v", m)
      .select("pc_0").as[Double].collect().sorted
    assert(proj.zip(Seq(-2 * s5, -s5, s5, 2 * s5).sorted)
      .forall { case (a, b) => math.abs(a - b) < 1e-9 })

    // 64-dim corpus with a planted dominant axis: x = t·axis + small noise — PC1
    // must recover the axis (|cos| ≥ 0.99) and dominate the variance spectrum
    val axis = Array.tabulate(64)(i => math.sin(i + 1.0))
    val nrm = math.sqrt(axis.map(x => x * x).sum)
    val unit = axis.map(_ / nrm)
    val lit64 = typedLit(unit.toSeq)
    val planted2 = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("t", (col("vec_id") % 21).cast("double") - 10.0)
      .select(col("vec_id"),
        zip_with(lit64, col("e"), (a, x) => col("t") * a + lit(0.05) * x).as("v"))
    val m64 = Pca.fit(planted2, "v", r = 4)
    val cos = m64.components(0).zip(unit).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) >= 0.99, s"PC1 misaligned with planted axis: |cos|=$cos")
    assert(m64.variance(0) > 10 * m64.variance(1),
      s"planted axis must dominate: ${m64.variance.take(3).mkString(",")}")
    // determinism
    val again = Pca.fit(planted2, "v", r = 4)
    assert(again.components(0).toSeq === m64.components(0).toSeq)
  }

  test("covariance DataFrame matches the hand-computed 2-D fixture") {
    import graft.textops.Pca
    // same fixture as the PCA test: E[xxᵀ] = [[10, 5], [5, 2.5]], mean (0,0)
    val tiny = Seq(
      Seq(2.0, 1.0), Seq(-2.0, -1.0), Seq(4.0, 2.0), Seq(-4.0, -2.0)
    ).toDF("v")
    val got = Pca.covariance(tiny, "v")
      .as[(Int, Int, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got.keySet === Set((0, 0), (0, 1), (1, 1)))
    assert(math.abs(got((0, 0)) - 10.0) < 1e-12)
    assert(math.abs(got((0, 1)) - 5.0) < 1e-12)
    assert(math.abs(got((1, 1)) - 2.5) < 1e-12)
  }

  test("subspace iteration recovers a planted 2-D eigenbasis and matches Jacobi") {
    import graft.textops.Pca
    // 4-dim corpus spanned by two NON-axis orthonormal directions with
    // well-separated variances: x = t·a + s·b, t ~ var 4, s ~ var 1/6,
    // t ⊥ s over a full lcm(7,3) cycle — top-2 eigenvectors are ±a, ±b
    val a = Array(0.5, 0.5, 0.5, 0.5)
    val b = Array(0.5, -0.5, 0.5, -0.5)
    val rows = (0 until 42).map { i =>
      val t = (i % 7).toDouble - 3.0
      val s = ((i % 3).toDouble - 1.0) * 0.5
      Seq.tabulate(4)(j => t * a(j) + s * b(j))
    }
    val df = rows.toDF("v")
    val got = Pca.subspaceIteration(df, "v", r = 2, iters = 25)
      .as[(Int, Int, Double)].collect()
    val cols = got.groupBy(_._2).map { case (k, xs) =>
      k -> xs.sortBy(_._1).map(_._3)
    }
    // orthonormal columns
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    assert(math.abs(dot(cols(0), cols(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(cols(1), cols(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(cols(0), cols(1))) < 1e-9)
    // planted-axis recovery up to sign
    assert(math.abs(dot(cols(0), a)) > 0.999, s"col0 !~ a: ${cols(0).mkString(",")}")
    assert(math.abs(dot(cols(1), b)) > 0.999, s"col1 !~ b: ${cols(1).mkString(",")}")
    // agrees with the driver Jacobi eigensolve (fit) up to sign, per component
    val m = Pca.fit(df, "v", r = 2)
    (0 until 2).foreach { k =>
      assert(math.abs(dot(cols(k), m.components(k))) > 0.999,
        s"component $k disagrees with Jacobi")
    }
  }

  test("silhouette: hand-computed simplified silhouette per cell") {
    import graft.textops.Similarity
    // centroids e1, e2; point (1,0) sits ON c0 (a=0, b=1 → s=1);
    // (0.6, 0.8) assigns to c1 with a=0.2, b=0.4 → s=0.5
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.6, 0.8)))
      .toDF("id", "v")
    val got = Similarity.silhouette(df, "id", "v", cents)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((0, 1L, 1.0), (1, 1L, 0.5)))
    // two points EQUIDISTANT-ish: a point on the bisector has a = b → s = 0
    val mid = Seq((3L, Seq(1.0, 1.0))).toDF("id", "v")
    val m = Similarity.silhouette(mid, "id", "v", cents)
      .as[(Int, Long, Double)].head()
    assert(m._3 === 0.0)
  }

  test("clusterBalancedSample: per-cell cap, md5-order determinism, assignment") {
    import graft.textops.Similarity
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    // 4 points near c0, 1 near c1; cap 2 per cell
    val df = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(1.0, 0.2)), (3L, Seq(1.0, 0.3)),
      (4L, Seq(1.0, 0.05)), (5L, Seq(0.1, 1.0)))
      .toDF("id", "v")
    val got = Similarity.clusterBalancedSample(df, "id", "v", cents, 2)
      .as[(Long, Int, Int)].collect().sortBy(r => (r._2, r._3))
    assert(got.count(_._2 === 0) === 2)
    assert(got.count(_._2 === 1) === 1)
    assert(got.forall(_._3 <= 2))
    // md5-hash order of the ids, not id order: md5("4") < md5("2") < md5("1") < md5("3")
    val expectCell0 = Seq(1L, 2L, 3L, 4L)
      .sortBy(id => java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
      .take(2).toSet
    assert(got.filter(_._2 === 0).map(_._1).toSet === expectCell0)
    // rerun identical
    val again = Similarity.clusterBalancedSample(df, "id", "v", cents, 2)
      .as[(Long, Int, Int)].collect().sortBy(r => (r._2, r._3))
    assert(again.toSeq === got.toSeq)
  }

  test("stripHtml: script/style content, block newlines, entity order, whitespace") {
    import graft.textops.TextOps
    val rows = Seq(
      """<html><head><style>p{x}</style></head><body><h1>Title</h1>""" +
        """<p>a  &amp;amp; b &lt;i&gt; c&nbsp;d</p><div>tail</div>""" +
        """<script>if (x < 2 && y > 1) { alert("z"); }</script></body></html>""")
      .toDF("h")
    val out = rows.select(TextOps.stripHtml(col("h")).as("t"))
      .as[String].head()
    // style+script content gone; </h1>,</p>,</div> → newlines; &amp;amp; decodes
    // to the literal "&amp;" (amp LAST), &lt;i&gt; to literal "<i>" (post-strip)
    assert(out === "Title\na &amp; b <i> c d\ntail")
  }

  test("multimodal metadata is deterministic and batch-extracted") {
    val d = docs.withColumn("payload", col("text").cast("binary")).limit(50)
    val out = Multimodal.extractMeta(d, "doc_id", "payload").collect()
    assert(out.length === 50)
    out.foreach { m =>
      assert(m.width >= 32 && m.width < 129)
      assert(m.content_md5.length === 32)
    }
    // deterministic: second run identical
    val out2 = Multimodal.extractMeta(d, "doc_id", "payload").collect()
    assert(out.sortBy(_.id).toSeq === out2.sortBy(_.id).toSeq)
  }

  test("multimodal header decode is REAL for JDK formats, stub otherwise") {
    // round-trip a PNG and a BMP written by the JDK's own ImageIO: extractMeta
    // must report the TRUE header dimensions, not the stub's length-derived fake
    def writeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 7919 + y * 104729) & 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val png = writeImage("png", 23, 17)
    val bmp = writeImage("bmp", 9, 4)
    val txt = "definitely not an image".getBytes("UTF-8")
    assert(Multimodal.decodeHeader(png) === Some((23, 17, 1)))
    assert(Multimodal.decodeHeader(bmp) === Some((9, 4, 1)))
    assert(Multimodal.decodeHeader(txt) === None)
    // a malformed "BM" magic must fall back cleanly, never throw or half-decode
    assert(Multimodal.decodeHeader("BMgarbage that is not a bitmap".getBytes) === None)
    val d = Seq((1L, png), (2L, bmp), (3L, txt)).toDF("doc_id", "payload")
    val metas = Multimodal.extractMeta(d, "doc_id", "payload")
      .collect().sortBy(_.id)
    assert((metas(0).width, metas(0).height, metas(0).frames) === ((23, 17, 1)))
    assert((metas(1).width, metas(1).height, metas(1).frames) === ((9, 4, 1)))
    val (sw, sh, sf) = Multimodal.decodeStub(txt)
    assert((metas(2).width, metas(2).height, metas(2).frames) === ((sw, sh, sf)))
  }

  test("duplicated n-gram coverage: copies score 1.0, short and unique docs 0.0") {
    val corpus = Seq(
      (1L, "a b c d"),   // bigrams: "a b","b c","c d" — all shared with doc 2
      (2L, "a b c d"),
      (3L, "x y z q"),   // unique bigrams
      (4L, "e b c f"),   // shares only "b c" with docs 1/2
      (5L, "w")          // no bigrams at all
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramCoverage(corpus, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) === ((3L, 3L, 1.0)))
    assert(out(2L) === ((3L, 3L, 1.0)))
    assert(out(3L) === ((3L, 0L, 0.0)))
    assert(out(4L) === ((3L, 1L, round6(1.0 / 3))))
    assert(out(5L) === ((0L, 0L, 0.0)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25 top-k matches the hand-computed Okapi formula on a 3-doc corpus") {
    // corpus: dl = 3, 4, 2; "fox" appears in docs 1 (tf=1) and 2 (tf=2); "cat" only in 3
    val corpus = Seq(
      (1L, "fox dog bird"),
      (2L, "fox fox dog bird"),
      (3L, "cat bird")).toDF("doc_id", "text")
    val q = Seq((0, "fox cat")).toDF("query_id", "qtext")
    val out = Similarity.bm25TopK(corpus, "doc_id", "text", q, 5)
      .orderBy("rank").collect()

    val k1 = 1.2; val b = 0.75; val n = 3.0; val avgdl = 3.0
    def idf(df: Int) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def c(tf: Long, dl: Long, df: Int) =
      r6(idf(df) * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl)))
    // doc 2: fox tf=2 dl=4; doc 1: fox tf=1 dl=3; doc 3: cat tf=1 dl=2
    val expected = Map(
      2L -> r6(c(2, 4, 2)), 1L -> r6(c(1, 3, 2)), 3L -> r6(c(1, 2, 1)))
    assert(out.length === 3)
    out.foreach { row =>
      val (doc, score, nTerms) = (row.getLong(2), row.getDouble(3), row.getLong(4))
      assert(nTerms === 1L)
      assert(math.abs(score - expected(doc)) < 1e-9, s"doc $doc: $score vs ${expected(doc)}")
    }
    // rarer "cat" (df=1) outscores common "fox" hits despite tf — rank order pins idf
    assert(out.map(_.getLong(2)).toSeq === Seq(3L, 2L, 1L))
  }

  test("streaming sharded sink lands the exact batch writeShards layout") {
    import java.nio.file.Files
    val d = (1L to 200L).map(i => (i, s"doc $i word${i % 7}")).toDF("doc_id", "text")
    val tmp = Files.createTempDirectory("graft_sink_spec")
    try {
      val batchPath = s"$tmp/batch"
      val streamSrc = s"$tmp/src"
      val streamOut = s"$tmp/stream"
      // batch layout
      val batchManifest = graft.textops.Curation
        .writeShards(d, col("doc_id"), 4, batchPath, "s1")
        .groupBy("shard").agg(count(lit(1)).as("n"), sum(length(col("text"))).as("len"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      // streamed in two files → two micro-batches appending into the same dirs
      // (staged OUTSIDE the source dir: the file index lists leaves recursively,
      // so nested write dirs inside the source would double-count)
      Files.createDirectories(java.nio.file.Paths.get(streamSrc))
      Seq(d.filter(col("doc_id") <= 100), d.filter(col("doc_id") > 100))
        .zipWithIndex.foreach { case (half, i) =>
          val stage = s"$tmp/stage$i"
          half.coalesce(1).write.parquet(stage)
          val ls = Files.list(java.nio.file.Paths.get(stage))
          try ls.filter(_.toString.endsWith(".parquet")).forEach(p =>
            Files.copy(p, java.nio.file.Paths.get(streamSrc, s"$i.parquet")))
          finally ls.close()
        }
      val streamManifest = graft.streaming.StreamOps
        .streamingShardedSink(spark, streamSrc, "doc_id", 4, streamOut, "s1")
        .groupBy("shard").agg(count(lit(1)).as("n"), sum(length(col("text"))).as("len"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(streamManifest === batchManifest)

      // versioned sink: same manifest, and REPLAYING a micro-batch (the at-least-
      // once retry foreachBatch can deliver) must not change it — the batch
      // overwrites its own batch=<id> dir instead of appending duplicates
      val vOut = s"$tmp/stream_v"
      def manifest() = spark.read.parquet(vOut)
        .groupBy("shard").agg(count(lit(1)).as("n"), sum(length(col("text"))).as("len"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val vManifest = graft.streaming.StreamOps
        .streamingShardedSinkVersioned(spark, streamSrc, "doc_id", 4, vOut, "s1")
        .groupBy("shard").agg(count(lit(1)).as("n"), sum(length(col("text"))).as("len"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(vManifest === batchManifest)
      val replayed = d.filter(col("doc_id") <= 100)
        .withColumn("shard", graft.textops.Curation.shardId(col("doc_id"), 4, "s1"))
      graft.streaming.StreamOps.writeVersionedBatch(replayed, 0L, vOut)
      graft.streaming.StreamOps.writeVersionedBatch(replayed, 0L, vOut) // retry again
      assert(manifest() === batchManifest, "replaying batch 0 must be idempotent")
      // compaction folds the batch dirs into the plain layout, same manifest
      val compacted = graft.streaming.StreamOps
        .compactVersionedSink(spark, vOut, s"$tmp/compacted")
      assert(!compacted.columns.contains("batch"))
      assert(compacted
        .groupBy("shard").agg(count(lit(1)).as("n"), sum(length(col("text"))).as("len"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
        === batchManifest)
    } finally {
      import java.nio.file.Path
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("MMR selection matches an independent greedy reimplementation") {
    val rnd = new scala.util.Random(13)
    (0 until 20).foreach { _ =>
      val n = 5 + rnd.nextInt(10)
      val cands = (0 until n).map { i =>
        (i.toLong, rnd.nextDouble(),
          Array.fill(4)(rnd.nextDouble() * 2 - 1))
      }
      val lam = 0.6
      val k = 1 + rnd.nextInt(n)
      // independent replay of the greedy rule
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
      }
      val expect = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (expect.length < k) {
        val scoresIdx = cands.indices.filterNot(expect.contains).map { i =>
          val maxSim = if (expect.isEmpty) 0.0
            else expect.map(p => cos(cands(i)._3, cands(p)._3)).max.max(0.0)
          i -> (lam * cands(i)._2 - (1 - lam) * maxSim)
        }
        expect += scoresIdx.maxBy { case (i, s) => (s, -i) }._1
      }
      val df = Seq((1, cands.map { case (id, rel, e) => (id, rel, e.toSeq) })).toDF("q", "cs")
      val got = df.select(graft.functions.mmr_select(col("cs"), lam, k).as("sel"))
        .collect().head.getSeq[Long](0)
      assert(got === expect.map(_.toLong).toSeq, s"n=$n k=$k")
    }
  }

  test("MMR drops a near-duplicate that plain top-k keeps; lambda=1 is rank order") {
    // c0 and c1 are the same high-rel direction; c2 is orthogonal with lower rel
    val cands = Seq(
      (10L, 0.99, Seq(1.0, 0.0)),
      (11L, 0.98, Seq(1.0, 0.001)),
      (12L, 0.60, Seq(0.0, 1.0)))
    val df = Seq((1, cands)).toDF("q", "cs")
    val diverse = df.select(graft.functions.mmr_select(col("cs"), 0.5, 2).as("sel"))
      .collect().head.getSeq[Long](0)
    assert(diverse === Seq(10L, 12L), s"got $diverse") // the near-dup 11 is skipped
    val relOnly = df.select(graft.functions.mmr_select(col("cs"), 1.0, 2).as("sel"))
      .collect().head.getSeq[Long](0)
    assert(relOnly === Seq(10L, 11L))
  }

  test("language id picks the language with most marker hits") {
    val d = Seq(
      (1, "the quick fox and the dog of war"),
      (2, "le chat et la maison des amis"),
      (3, "xyz qqq zzz")).toDF("id", "t")
    val out = d.select(col("id"), TextOps.langId(col("t")).as("l"))
      .as[(Int, String)].collect().toMap
    assert(out(1) === "en")
    assert(out(2) === "fr")
    assert(out(3) === "und")
  }

  test("marginBitext: IVF-backed top-k recovers >= 90% of the brute-force pairs") {
    // the operator's documented scale path: swap the exact-recall baseline for the
    // partition-pruned IVF index; with generous nprobe the mined pair set must
    // cover the brute-force mining almost completely
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val src = emb.filter(col("vec_id") % 2 === 0)
    val tgt = emb.filter(col("vec_id") % 2 === 1)
    val exact = Similarity.marginBitext(src, tgt, "vec_id", "embedding", k = 4)
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    val model = graft.textops.Ivf.fit(emb, "vec_id", "embedding", k = 8)
    val approx = Similarity.marginBitext(src, tgt, "vec_id", "embedding", k = 4,
        threshold = 1.0,
        topK = (c, q, id, v, kk) =>
          graft.textops.Ivf.topK(c, q, id, v, kk, model, nprobe = 6))
      .select("src_id", "tgt_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF bitext recall $recall < 0.9 (exact=${exact.size})")
  }

  test("dictionaryTag: longest match wins per start, flat mention counting") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "Hash join beats sort merge join"), (2L, "no entities here"))
      .toDF("doc_id", "text")
    val aliases = Seq(("hash join", "op_hash_join"), ("hash", "fn_hash"),
      ("join", "op_join"), ("sort merge join", "op_smj")).toDF("alias", "entity")
    val out = graft.textops.DictionaryTag.tag(docs, "doc_id", col("text"), aliases)
      .orderBy("id", "entity").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // doc 1: "hash join" wins over "hash" at pos 0; the trailing "join" of both
    // compounds still counts flat (pos 1 and pos 5); "sort merge join" at pos 3
    assert(out.toSeq === Seq(
      (1L, "op_hash_join", 1L, 0), (1L, "op_join", 2L, 1), (1L, "op_smj", 1L, 3)))
  }

  test("quantileNormalize: rank-order preserving, identical groups calibrate identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // group b's scores are group a's shifted +0.3: same ranks, different raws
    val a = (1 to 50).map(i => (i.toLong, "a", i / 100.0))
    val b = (1 to 50).map(i => ((i + 100).toLong, "b", i / 100.0 + 0.3))
    val df = (a ++ b).toDF("id", "src", "score")
    val out = graft.textops.Curation
      .quantileNormalize(df, col("score"), Seq(col("src")), col("id"), bins = 100)
    assert(out.count() === 100)
    val byGroup = out.collect().groupBy(_.getString(1))
      .map { case (g, rows) =>
        g -> rows.sortBy(_.getLong(0)).map(_.getAs[Double]("calibrated")).toSeq }
    // identical within-group rank structure -> identical calibrated sequences
    assert(byGroup("a") === byGroup("b"))
    // calibrated is non-decreasing in the within-group rank
    byGroup("a").sliding(2).foreach { case Seq(x, y) => assert(x <= y); case _ => }
    // calibrated values live on the pooled support (right bin edges in (0, 1])
    out.collect().foreach { r =>
      val c = r.getAs[Double]("calibrated")
      assert(c > 0.0 && c <= 1.0)
    }
  }
}
