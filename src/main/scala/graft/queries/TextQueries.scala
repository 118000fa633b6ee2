package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Caching.CacheSyntax

import graft.streaming.StreamOps
import graft.textops.{Curation, Dedup, Ivf, Multimodal, Pca, Pq, Similarity, TextOps}

/** SparkEntry query + oracle entries for the training-data pipeline operators: text
  * analysis, document dedup (exact / Jaccard / MinHash-LSH / SimHash / embedding),
  * ANN search, multimodal metadata, streaming aggregation, JSON extraction.
  *
  * Dedup queries run over a corpus with PLANTED duplicates (the documents table has
  * none): exact copies for `doc_id % 7 = 0` and near-copies (one appended token) for
  * `doc_id % 11 = 0` — reconstructed identically in the DuckDB oracles.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Round-robin spread for the HEAVY-scan consumers (the bm25 terms explode, the
    * qrels token join, passage chunking): a single-file source otherwise runs the
    * whole tokenize/explode/partial-agg pass on ONE task (guide §2.5 input skew).
    * Conditional — a naturally wide scan (the cluster-scale case) short-circuits,
    * so this can only add parallelism where the scan had none. Downstream
    * aggregates are counts/long-sums plus per-row deterministic projections, and
    * double sums ride groupBy shuffles whose intra-group order was never
    * deterministic — results are partition-layout-proof (pinned by the 6-dec
    * rounding both engines share).
    */
  private def spread(df: DataFrame): DataFrame =
    graft.util.Partitioning.spreadNarrowScan(df)

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Fixed retrieval queries for `text_bm25_topk` — rendered identically into the
    * DuckDB oracle's VALUES list so the two sides cannot drift.
    */
  private val BM25Queries: Seq[(Int, String)] = Seq(
    0 -> "spark window agg",
    1 -> "hash join table",
    2 -> "stream batch filter sort",
    3 -> "customer query vector")

  /** `mm_png_meta` fixtures: a real 5×3 grayscale PNG and a real 7×2 BMP (generated
    * once with the JDK's own ImageIO writers, frozen as hex so the payload bytes
    * are literal constants on both sides of the oracle), plus a non-image text
    * payload that must take the deterministic stub path.
    */
  private val MmPngHex =
    "89504e470d0a1a0a0000000d49484452000000050000000308000000007e5d9a240000001949444154785e636050f5ca9fc210ddb0f4d47b866db7813c00376b06ac364293c20000000049454e44ae426082"
  private val MmBmpHex =
    "424d66000000000000003600000028000000070000000200000001001800000000003000000000000000000000000000000000000000697a0098bc0fc7fe1ef6402e25833d54c54c83075c0000000000002f420f5e841e8dc62dbc083deb4a4c1a8d5b000000"
  private val MmTextHex = "6e6f7420616e20696d616765207061796c6f6164" // "not an image payload"

  /** `mm_audio_*` fixtures: two real canonical PCM-16 WAVs (44-byte RIFF header
    * written once from deterministic integer sample formulas — mono 8 kHz
    * s_k = (k·2654435761 mod 2¹⁶) − 2¹⁵ over 48 frames; stereo 16 kHz, L-channel
    * s_k = (k·40503 mod 2¹⁶) − 2¹⁵ over 20 frames — frozen as hex so the payloads
    * are literal constants on both oracle sides), plus a text payload that must
    * take the stub path.
    */
  /** Constant minimal ISO-BMFF payloads (hand-built per ISO/IEC 14496-12: ftyp +
    * moov[mvhd + trak[tkhd]×k]) — one video track 640×360 @ timescale 1000
    * duration 5000, and a two-track mp42 (320×240 video + dimension-less audio)
    * @ 600/1234; the stub row is plain text.
    */
  private val MmMp4OneTrackHex =
    "000000106674797069736f6d00000200000000d86d6f6f760000006c6d766864000000000000000000000000000003e8000013880001000001000000000000000000000000010000000000000000000000000000000100000000000000000000000000004000000000000000000000000000000000000000000000000000000000000002000000647472616b0000005c746b6864000000070000000000000000000000010000000000001388000000000000000000000000000000000001000000000000000000000000000000010000000000000000000000000000400000000280000001680000"
  private val MmMp4TwoTrackHex =
    "00000010667479706d703432000000000000013c6d6f6f760000006c6d76686400000000000000000000000000000258000004d20001000001000000000000000000000000010000000000000000000000000000000100000000000000000000000000004000000000000000000000000000000000000000000000000000000000000002000000647472616b0000005c746b68640000000700000000000000000000000100000000000004d2000000000000000000000000000000000001000000000000000000000000000000010000000000000000000000000000400000000140000000f00000000000647472616b0000005c746b68640000000700000000000000000000000200000000000004d2000000000000000000000000000000000001000000000000000000000000000000010000000000000000000000000000400000000000000000000000"
  private val MmVideoTextHex = "6e6f74206120766964656f2073747265616d2e2e"

  /** Constant minimal EBML payloads (hand-built per RFC 8794 + the Matroska
    * element registry: EBML[DocType] + Segment[Info[TimestampScale, Duration] +
    * Tracks[TrackEntry…]]) — a webm with a 640×360 video track + an audio track
    * @ scale 1 000 000 ns duration 4250 ticks (float32), and a matroska with one
    * 320×240 video track @ 2 000 000 ns / 1234.5 ticks (float64) inside an
    * UNKNOWN-SIZE (streamed) Segment.
    */
  private val MmWebmHex =
    "1a45dfa38b428681014282847765626d18538067b21549a9668e2ad7b1830f42404489844584d0001654ae6b9aae90d78101838101e088b0820280ba820168ae86d78102838102"
  private val MmMkvHex =
    "1a45dfa38b4282886d6174726f736b6118538067ff1549a966922ad7b1831e848044898840934a00000000001654ae6b92ae90d78101838101e088b0820140ba8200f0"

  /** Silence-pattern WAVs: loud(16)–quiet(16, amp 3)–loud(16) squares, and an
    * all-quiet amp-2 file — square-wave RMS = amplitude exactly.
    */
  private val MmWavLoudQuietLoudHex =
    "524946468400000057415645666d74201000000001000100401f0000803e0000020010006461746160000000e02e20d1e02e20d1e02e20d1e02e20d1e02e20d1e02e20d1e02e20d1e02e20d10300fdff0300fdff0300fdff0300fdff0300fdff0300fdff0300fdff0300fdfff82a08d5f82a08d5f82a08d5f82a08d5f82a08d5f82a08d5f82a08d5f82a08d5"
  private val MmWavAllQuietHex =
    "524946466400000057415645666d74201000000001000100401f0000803e00000200100064617461400000000200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff0200feff"

  private val MmWavMonoHex =
    "524946468400000057415645666d74201000000001000100401f0000803e00000200100064617461600000000080b1f9627313edc46675e0265ad7d3884d39c7ea409bba4c34fdadae275fa1101bc194720e2388d401857b36f5e76e98e84962fadbab555ccf0d49bec26f3c20b6d12f82a93323e49c95164690f709a88359fd0a77bbf06c6a1de4ce5d7fd7"
  private val MmWavStereoHex =
    "524946467400000057415645666d74201000000001000200803e000000fa000004001000646174615000000000807b80371e70a76ebc65cea55a5af5dcf84f1c139744434a35396a81d32e91b87123b8ef0f18df26ae0d065d4c022d94eaf753cb88ec7a0227e1a139c5d6c87063cbefa701c016de9fb53d153eaa64"
  private val MmAudioTextHex =
    "6e6f7420616e20617564696f207061796c6f6164" // "not an audio payload"

  /** Frozen 6×4 five-frame animated GIF (written once by the JDK's own GIF
    * sequence writer from a deterministic per-frame RGB formula) — the real
    * multi-frame container for `mm_frame_sample_real`.
    */
  private val MmGifHex =
    "47494638396106000400F40000000000003C00280000283C14007800287828500000503C28780000783C3C50785078787800B40028B43C50B47878B4B4A00000A03C50C80000C83C64A078A0C878C8C8B42CA0B4F000000000000000000000000000000000000000000000000021F90400000000002C000000000600040044081E00010830800082040205142CA05021C0800309224C60D0C0C1830B1602020021F90400000000002C0000000006000400C4321E0A325A0A5A1E0A5A5A1E32960A32D20A5A96325AD246821E0AAA1E0A825A32AA5A46D21E0AFA1E0AD25A5AFA5A6E82965AFAD236AA968282D282AAD2BED296AAFA96D2D2D2FA321E0A321E0A321E0A321E0A321E0A321E0A321E0A321E0A081E000108409080410302062048A86021C000050B1C3C28706002850B1102020021F90400000000002C0000000006000400C4043C142C3C140478642C7878643C1464781404F0042CF04064B41464F01404B4B42CB4DC8C3C14B43C148C7828B4783CDC3C14DC78508CB43CB4B4648CF050B4F08CDCB48CDCF0C8043C14043C14043C14043C14043C14043C14043C14043C14081E00093068000140000412265850B0A080830711040C4840A1C205030702020021F90400000000002C0000000006000400C4360E0E0E5A1E365A1E5E0E4A5E5A1E0E0ED20E965A36966E0ED29636D2BE5E96825ED2E6960E1EBE0E5A965A1EBE5A1EE65A1EE60E9696961EBE963296D21EBED246E69646E6D26E360E0E360E0E360E0E360E0E360E0E360E0E360E0E360E0E081E001D3C80104000010A152E2048B040C2040B060E2860D0204201000302020021F90400000000002C0000000006000400C4187828682C18407828687828182CA0402CDC18B45018F07840B46468B47840F0A068F0C8902C54907828C82C28F02C64C87828F07828C8B428F0B43CC8F028F0F05090B48C90F0F0187828187828187828187828187828187828187828187828081E00214400206040030A150E28587041C2040308125870F0804081000C0202003B"

  /** `mm_cdc_chunks_fixed` fixtures: a frozen 640-byte payload (md5 chain from the
    * seed "graft-cdc-fixture", generated once) and its 643-byte copy with 3 bytes
    * (AA BB CC) inserted at offset 300. Constant payloads make the gear-hash chunk
    * boundaries CONSTANTS, so the sequential rolling scan — no SQL form on live
    * data — gets a full oracle, including the boundary RESYNC after the edit.
    */
  private val MmCdcBaseHex =
    "cba62455b7349c2deec9dd1f59432589bf29280ad0fb7e5a8c900e243995d0b14448c5c0cceafc9adf1a140680ea357eeba6143f94f29c7b078d9c9c8ad22de8a7edead87abd27d1581b34e239dc014277be6d45b80d00b9d5a5fa7184808808867066c248f70691dbdae5ea03ea424986a2075db5f28711c0ce7dce3a4e21a26f9899cfbca17b51b3dcd7e61615284880496b6c7e23a4eb6a1db3a68401fd7df6084d82bffb142eda9340323b0388cd4e87392776cf27084c615a2d30fd009cc223df73f0afa89f24cf8b138ed05aaaab100b94f0cd04d694eef78bda9412bcc5f31c4f0ac53f7f3e066f06e02611e5df98578c76be2c9303debef4cf699cd8c6a7122d63eba2131dac4801af9db3facdf120cc6d5a8f14f222c68d47985cef816d5f617b53dcf31ef295e608d255bbc80c4e634dc7e6d93cd8a224f5467bf27e8388bd3eede8438bf443a27f6302d2b5d80d3dca3239df86c1fa9e2b0b5d8c92bc0c25a5552fa252083424aaf158ed87e3fb8d4f4dacf55f8c01e45e8c04c63a1ec4033ecf00db2c75ff9d0dbe1a3633a9094866911bd81c8189799ffba737437f5ae2d662ad6ac93afee22ce20c2e8dbb0ec3f0693869f47436c1b1a4fa3cfa976c0a5e737e531a08e08a46cbfe1d6a9a75b860ceda353de22be8e760a1c2985f1cb840c5c5f819f34e5dc446b10e46337a90162894fd81566031b220e8fcd3da59132fee424653e5eb340fe33f6c5d0fde9e86fe68e0ca78d1efeb3265729c9101bbd65de6f6897f7a6b8a94e1072738f755f5a807debb19ddf87cc24b1f9867ac45667b48d1779cfba8c656d6d955517e4dc86a12e8d3413233a963d972a813b2ce85b780ff08df25d8515edf350ae402731d1c4076ad9122b180fd9531"
  private val MmCdcEditHex =
    "cba62455b7349c2deec9dd1f59432589bf29280ad0fb7e5a8c900e243995d0b14448c5c0cceafc9adf1a140680ea357eeba6143f94f29c7b078d9c9c8ad22de8a7edead87abd27d1581b34e239dc014277be6d45b80d00b9d5a5fa7184808808867066c248f70691dbdae5ea03ea424986a2075db5f28711c0ce7dce3a4e21a26f9899cfbca17b51b3dcd7e61615284880496b6c7e23a4eb6a1db3a68401fd7df6084d82bffb142eda9340323b0388cd4e87392776cf27084c615a2d30fd009cc223df73f0afa89f24cf8b138ed05aaaab100b94f0cd04d694eef78bda9412bcc5f31c4f0ac53f7f3e066f06e02611e5df98578c76be2c9303debef4cf699cd8c6a7122d63eba2131dac4801af9db3facdf120cc6d5a8f14f222c68d47985cef816d5f617b53dcf31ef295e6aabbcc08d255bbc80c4e634dc7e6d93cd8a224f5467bf27e8388bd3eede8438bf443a27f6302d2b5d80d3dca3239df86c1fa9e2b0b5d8c92bc0c25a5552fa252083424aaf158ed87e3fb8d4f4dacf55f8c01e45e8c04c63a1ec4033ecf00db2c75ff9d0dbe1a3633a9094866911bd81c8189799ffba737437f5ae2d662ad6ac93afee22ce20c2e8dbb0ec3f0693869f47436c1b1a4fa3cfa976c0a5e737e531a08e08a46cbfe1d6a9a75b860ceda353de22be8e760a1c2985f1cb840c5c5f819f34e5dc446b10e46337a90162894fd81566031b220e8fcd3da59132fee424653e5eb340fe33f6c5d0fde9e86fe68e0ca78d1efeb3265729c9101bbd65de6f6897f7a6b8a94e1072738f755f5a807debb19ddf87cc24b1f9867ac45667b48d1779cfba8c656d6d955517e4dc86a12e8d3413233a963d972a813b2ce85b780ff08df25d8515edf350ae402731d1c4076ad9122b180fd9531"

  /** events.parquet has shipped with two physical `ts` types over time (long nanos
    * via the legacy conf, native timestamp[us]); the shared loader branches on the
    * schema and normalizes to TimestampType either way.
    */
  private[queries] def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Events.load(s, dir)

  /** Deterministic graded qrels for the fixed BM25 queries: rel(query, doc) = how
    * many distinct query tokens the document contains. Built as an equi-join on
    * token (doc-token stream × tiny broadcast query-token set), never a doc×query
    * cross join; docs sharing no token simply never appear (rel 0 by absence).
    */
  private def tokenOverlapQrels(
      s: SparkSession, dir: String, q: DataFrame): DataFrame = {
    // NO spread here (r12 measured): the qrels tokenize+explode is the LIGHT leg
    // of its two callers (ndcg, ep13) — both already pay a spread exchange for the
    // bm25 terms pass, and A/B showed the second exchange costs more than the
    // single-task tokenize it parallelizes (best-of-6 ndcg 3.47→4.01 with it)
    val docTok = docs(s, dir).select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
    val qTok = q.select(col("query_id"),
      explode(array_distinct(TextOps.tokens(col("qtext")))).as("token"))
    docTok.join(broadcast(qTok), "token")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).cast("int").as("rel"))
  }

  /** The matching DuckDB CTEs (`dt`, `qtok`, `rel`) over `documents` and the
    * rendered query table `q` from [[bm25Ctes]].
    */
  private def qrelsCtes: String = {
    val toks = toksSql("text")
    val qtoks = toksSql("qtext")
    s"""dt AS (SELECT doc_id, unnest(list_distinct($toks)) AS token FROM documents),
       |qtok AS (SELECT query_id, unnest(list_distinct($qtoks)) AS token FROM q),
       |rel AS (SELECT query_id, doc_id, COUNT(*)::INT AS rel
       |        FROM dt JOIN qtok USING (token) GROUP BY 1, 2)""".stripMargin
  }

  /** documents ∪ exact copies (id+100000, doc_id%7=0) ∪ near copies (id+200000, %11). */
  private[queries] def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
    d.unionByName(
        d.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("lang"), col("n_chars")))
      .unionByName(
        d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" xtradup token")).as("text"), col("lang"), col("n_chars")))
  }
  // NOT round-robin-spread here (r11 measured): the minhash/shingle family is
  // already ~6-way parallel through the 3 union branches and its per-row sig
  // work is cheap enough that a corpus-wide repartition COSTS ~0.4 s/query
  // (extra exchange + 32-task stages) — dedup_apply A/B 4.6 vs 5.1 s warm.
  // Heavy-scan consumers (quality/langid in ep3) spread their own projection.

  private[queries] val corpusCte =
    """corpus AS (
      |  SELECT doc_id, text, lang, n_chars FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, lang, n_chars FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' xtradup token', lang, n_chars
      |  FROM documents WHERE doc_id % 11 = 0
      |)""".stripMargin

  private def blockCols = Seq(col("lang"), floor(col("n_chars") / 25))

  /** embeddings ∪ planted near-dup copies (vec_id+100000 for vec_id%5=0): copy i gets
    * a deterministic perturbation `v'[j] = v[j] + d·v[(j+1) mod dim]` with
    * d = 0.02 + (vec_id%7)·0.01 ∈ [0.02, 0.08] — cosine(v, v') ≥ ~0.995, far above the
    * 0.9 near-dup threshold, while unrelated pairs stay ≤ ~0.61 (measured). The DuckDB
    * oracle reproduces the arithmetic with literals cast to DOUBLE; any residual ulp
    * difference is absorbed by the ROUND(…, 6) on both sides.
    */
  private def plantedEmb(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    // planted copies live at vec_id + 100000; a corpus with real ids in that range
    // would silently collide with the copies (and desync from the oracle CTE)
    val maxId = e.agg(max(col("vec_id"))).first().getLong(0)
    require(maxId < 100000, s"plantedEmb: max vec_id $maxId would collide with planted ids")
    // perturb BEFORE renaming vec_id: a lambda's outer column references resolve
    // against the projection output, so `vec_id` inside transform() would otherwise
    // bind to the aliased vec_id+100000 and silently change d
    val d = lit(0.02) + (col("vec_id") % 7).cast("double") * lit(0.01)
    val copies = e.filter(col("vec_id") % 5 === 0)
      .withColumn("jittered", transform(col("embedding"), (x, i) =>
        x + d * element_at(col("embedding"), ((i + 1) % size(col("embedding"))) + 1)))
      .select((col("vec_id") + 100000).as("vec_id"), col("jittered").as("embedding"))
    e.unionByName(copies)
  }

  /** Stages each DataFrame as one parquet file in a temp dir (one micro-batch each,
    * in order), runs `consume` (a run-to-completion streaming function whose results
    * land in a memory sink), then removes the staging files — by then the results
    * live in the sink, not on disk.
    */
  private def stagedStream(batches: Seq[DataFrame])(consume: String => DataFrame): DataFrame = {
    import java.nio.file.{Files, Path}
    val tmp = Files.createTempDirectory("graft_stream")
    val target = tmp.resolve("in")
    Files.createDirectories(target)
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        val part = tmp.resolve(s"b$i")
        b.coalesce(1).write.mode("overwrite").parquet(part.toString)
        // close the directory stream (it holds an fd); zero-pad so lexicographic
        // file ordering stays correct past 9 staged batches
        val listing = Files.list(part)
        val file =
          try listing.filter(p => p.toString.endsWith(".parquet")).findFirst().get()
          finally listing.close()
        Files.copy(file, target.resolve(f"$i%04d.parquet"))
      }
      consume(target.toString)
    } finally {
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  private val embCorpusCte =
    """ecorpus AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000,
      |    list_transform(range(1, len(embedding) + 1),
      |      i -> embedding[i]::DOUBLE
      |           + (0.02::DOUBLE + (vec_id % 7) * 0.01::DOUBLE) * embedding[(i % len(embedding)) + 1]::DOUBLE)
      |  FROM embeddings WHERE vec_id % 5 = 0
      |)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"), TextOps.tokenCount(col("text")).as("n_tokens"))
        .orderBy("doc_id")
    },
    "text_token_count_bpe" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          TextOps.bpeishTokenCount(col("text")).as("n_subwords"))
        .orderBy("doc_id")
    },
    "text_quality" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          length(col("text")).as("len_chars"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
          round(TextOps.wordSetRatio(col("text"), TextOps.EnglishStopwords), 6).as("stop_ratio"),
          round(TextOps.qualityScore(col("text")), 6).as("quality"))
        .orderBy("doc_id")
    },
    "text_mojibake" -> { (s, dir) =>
      // encoding-damage signal; damage planted (the synthetic corpus is clean):
      // every %5 doc gains a replacement char and a BEL control char
      val planted = docs(s, dir).withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 5 === 0, lit(" b\ufffdd\u0007")).otherwise(lit(""))))
      planted.select(col("doc_id"),
          TextOps.mojibakeCount(col("text")).cast("long").as("n_bad"),
          round(TextOps.mojibakeRatio(col("text")), 6).as("bad_ratio"))
        .orderBy("doc_id")
    },
    "text_url_density" -> { (s, dir) =>
      // link-density quality signal; URLs planted (the synthetic corpus has none):
      // every %3 doc gains TWO links (ex<N>.com + t.co/x), every %9 doc a THIRD
      val planted = docs(s, dir).withColumn("text",
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" see https://ex"), col("doc_id") % 7,
              lit(".com/a?b=1 and http://t.co/x"))).otherwise(lit("")),
          when(col("doc_id") % 9 === 0, lit(" ftp ignored http://only.this/counts"))
            .otherwise(lit(""))))
      planted.select(col("doc_id"),
          TextOps.urlCount(col("text")).as("n_urls"),
          round(TextOps.urlDensity(col("text")), 6).as("url_density"))
        .orderBy("doc_id")
    },
    "text_url_canonical" -> { (s, dir) =>
      // domain histogram over canonicalized links — the domain-mixing/blocklist
      // precursor: plant messy URLs (mixed-case hosts, fragments, utm params,
      // trailing punctuation), canonicalize row-locally, aggregate per host
      val planted = docs(s, dir).withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0, concat(
          lit(" see https://Ex"), col("doc_id") % 7,
          lit(".COM/Path/?utm_source=feed&id="), col("doc_id") % 5,
          lit("#frag"))).otherwise(lit("")),
        when(col("doc_id") % 9 === 0,
          lit(" and http://T.co/abc?utm_campaign=x, done")).otherwise(lit(""))))
      planted
        .select(col("doc_id"),
          explode(TextOps.canonicalUrls(col("text"))).as("url"))
        .groupBy(TextOps.urlHost(col("url")).as("host"))
        .agg(count(lit(1)).as("n_urls"),
          count_distinct(col("doc_id")).as("n_docs"),
          count_distinct(col("url")).as("n_unique_urls"))
        .orderBy("host")
    },
    "text_langid" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"), TextOps.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")
    },
    "text_html_strip" -> { (s, dir) =>
      // HTML -> text extraction on a deterministically planted markup wrapper
      // (script/style blocks with content, block-tag newlines, entities incl.
      // the &amp;amp; double-escape, whitespace normalization) — the crawl
      // extraction step upstream of every quality filter; row-local regex
      // chain, RE2-replayable
      val html = concat(
        lit("""<html><head><style type="text/css">p { color: red; }</style></head><body><h1>"""),
        col("source"),
        lit("""</h1><p>x &amp;amp; y &lt;tag&gt; &quot;q&quot; z&nbsp;w</p><div>"""),
        substring(col("text"), 1, 120),
        lit("""</div><script>if (x < 2 && y > 1) { alert("hi"); }</script></body></html>"""))
      docs(s, dir)
        .select(col("doc_id"), TextOps.stripHtml(html).as("text_out"))
        .withColumn("n_chars_out", length(col("text_out")))
        .orderBy("doc_id")
    },
    "text_dictionary_tag" -> { (s, dir) =>
      // gazetteer entity tagging: lowercase token n-grams (1..3 words) against a
      // broadcast alias table, longest-match-wins per start position — the
      // NER-lite / PII-tagging primitive; one corpus scan, full oracle
      import s.implicits._
      val aliases = Seq(
        ("join", "op_join"), ("hash join", "op_hash_join"),
        ("sort merge join", "op_smj"), ("hash", "fn_hash"),
        ("group", "op_agg"), ("scan", "op_scan"), ("the big table", "noise"))
        .toDF("alias", "entity")
      graft.textops.DictionaryTag.tag(docs(s, dir), "doc_id", col("text"), aliases)
        .select(col("id").as("doc_id"), col("entity"), col("n_mentions"), col("first_pos"))
        .orderBy("doc_id", "entity")
    },
    "text_fingerprint" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },
    "text_fingerprint_rolling" -> { (s, dir) =>
      // winnowing fingerprints (rolling k-gram hashes → window minima), exploded to
      // one row per selected fingerprint
      docs(s, dir).select(col("doc_id"),
          explode(graft.functions.rolling_fingerprints(col("text"), 8, 4)).as("fp"))
        .orderBy("doc_id", "fp")
    },
    "dedup_edit_distance" -> { (s, dir) =>
      // FastSS deletion-neighborhood fuzzy join (new r8): exact edit-distance-1
      // pairs over customer names via the deletion-variant equi-join — TPC-H
      // name pairs differing in one serial digit are the planted near-matches
      Dedup.editDistancePairs(
          s.read.parquet(s"$dir/customer.parquet"), "c_custkey", "c_name", 1)
        .orderBy("id_l", "id_r")
    },
    "dedup_exact" -> { (s, dir) =>
      Dedup.exact(plantedCorpus(s, dir), "doc_id", "text")
        .orderBy("content_hash")
    },
    "ep7_incremental_ingest" -> { (s, dir) =>
      // day-2 ingest pipeline: screen an incoming batch against the base corpus —
      // exact-overlap drop (hash anti), near-dup drop (incremental MinHash vs base
      // only; the corpus never self-joins), then the quality gate. Per-lang
      // manifest of what each stage removed and what survived.
      val base = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
      val incoming = plantedCorpus(s, dir).filter(col("doc_id") >= 100000)
        .select(col("doc_id"), col("text"), col("lang"))
      val bh = base.select(md5(col("text")).as("h")).distinct()
      val flagged = incoming.withColumn("h", md5(col("text")))
        .join(bh.withColumn("x", lit(1)), Seq("h"), "left")
        .withColumn("is_exact", col("x").isNotNull).drop("h", "x")
      val afterExact = flagged.filter(!col("is_exact"))
      // near-dup ids: batch docs verified >= 0.5 jaccard against a BASE partner
      // (id_l < 100000 keeps the base-batch pairs; batch-batch pairs are not drops)
      val near = Dedup.incrementalMinhashPairs(base,
          afterExact.select("doc_id", "text"), "doc_id", "text", 0.5,
          includeWithin = false) // batch-batch pairs are not drops — don't compute them
        .filter(col("id_l") < 100000 && col("id_r") >= 100000)
        .select(col("id_r").as("doc_id")).distinct().withColumn("nn", lit(1))
      flagged.join(near, Seq("doc_id"), "left")
        .withColumn("in_near", col("nn").isNotNull)
        .withColumn("q", round(TextOps.qualityScore(col("text")), 6))
        .withColumn("kept", !col("is_exact") && !col("in_near") && col("q") >= 0.5)
        .groupBy("lang").agg(
          count(lit(1)).as("n_incoming"),
          sum(when(col("is_exact"), 1L).otherwise(0L)).as("n_exact_dup"),
          sum(when(!col("is_exact") && col("in_near"), 1L).otherwise(0L)).as("n_near_dup"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), TextOps.tokenCount(col("text")).cast("long"))
            .otherwise(0L)).as("tokens_kept"))
        .orderBy("lang")
    },
    "dedup_corpus_overlap" -> { (s, dir) =>
      // incoming = the planted copies; exact copies (+100000) fully overlap the
      // base, near copies (+200000, one appended token) must not
      val incoming = plantedCorpus(s, dir).filter(col("doc_id") >= 100000)
      Dedup.corpusOverlap(docs(s, dir), incoming, "text", col("lang"))
        .orderBy("stratum")
    },
    "dedup_ngram_coverage" -> { (s, dir) =>
      // Lee et al. memorization signal: fraction of each doc's 5-grams that are
      // corpus-duplicated; planted exact copies must score 1.0
      Dedup.duplicatedNgramCoverage(plantedCorpus(s, dir), "doc_id", "text", 5)
        .orderBy("id")
    },
    "dedup_substring_spans" -> { (s, dir) =>
      // Lee et al. ExactSubstr: maximal repeated-token-run spans via hashed 8-gram
      // counts + per-doc interval merge; planted copies surface as full-doc spans
      Dedup.substringSpans(plantedCorpus(s, dir), "doc_id", "text", 8)
        .orderBy("id", "span_start")
    },
    "dedup_substring_apply" -> { (s, dir) =>
      // the remove-all apply step: duplicated spans cut from every document
      Dedup.substringApply(plantedCorpus(s, dir), "doc_id", "text", 8)
        .orderBy("id")
    },
    "dedup_token_jaccard" -> { (s, dir) =>
      Dedup.tokenJaccardPairs(plantedCorpus(s, dir), "doc_id", "text", blockCols, 0.9)
        .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_l", "id_r")
    },
    "dedup_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(plantedCorpus(s, dir), "doc_id", "text", 3, blockCols, 0.5)
        .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_l", "id_r")
    },
    "dedup_ngram_jaccard_prefix" -> { (s, dir) =>
      // PPJoin prefix filtering over 3-gram shingle sets, BLOCKLESS: only the
      // rarest sz−⌈t·sz⌉+1 shingles per doc enter the candidate join (shingle
      // vocabulary stays sparse even though this corpus has ~31 distinct words,
      // which saturates token-level prefixes — see the operator doc)
      Dedup.ngramJaccardPairsPrefix(plantedCorpus(s, dir), "doc_id", "text", 3,
          Seq.empty, 0.5)
        .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_l", "id_r")
    },
    "dedup_minhash_lsh" -> { (s, dir) =>
      Dedup.minhashLshPairs(plantedCorpus(s, dir), "doc_id", "text", 0.5)
        .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_l", "id_r")
    },
    "dedup_lsh_recall" -> { (s, dir) =>
      // measured banding quality: MinHash-LSH pairs (exact-verified, so precision
      // is 1 by construction) against the blockless exact-Jaccard ground truth —
      // ONE full outer join + one aggregation, the empirical check on the
      // dedup_lsh_tune S-curve. The 3-gram shingle pass is computed ONCE and
      // shared by the exact side's prefix join and the LSH side's verify join
      // (r12, guide §2.4) — same sets, same pairs, same jaccards as the two
      // independent pipelines it replaces.
      val corpus = plantedCorpus(s, dir)
      import graft.util.Caching.CacheSyntax
      val sets = corpus.select(col("doc_id").as("id"),
          graft.textops.TextOps.distinctShingles(col("text"), 3).as("toks"))
        .withColumn("sz", size(col("toks")))
        .scopedPersist()
      val exact = Dedup.prefixJaccardPairsFromSets(sets, Seq.empty, 0.5)
        .select(col("id_l"), col("id_r"), lit(1L).as("in_true"))
      val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5,
          verifySets = Some(sets))
        .select(col("id_l"), col("id_r"), lit(1L).as("in_lsh"))
      exact.join(lsh, Seq("id_l", "id_r"), "full")
        .agg(sum("in_true").as("n_true"), sum("in_lsh").as("n_lsh"),
          sum(col("in_true") * col("in_lsh")).as("n_hit"))
        .select(col("n_true"), col("n_lsh"), col("n_hit"),
          round(when(col("n_true") === 0, lit(0.0))
            .otherwise(col("n_hit").cast("double") / col("n_true")), 6).as("recall"),
          round(when(col("n_lsh") === 0, lit(0.0))
            .otherwise(col("n_hit").cast("double") / col("n_lsh")), 6).as("prec"))
    },
    "dedup_lsh_tune" -> { (s, _) =>
      // band-parameter selection from the closed-form collision S-curve: the
      // knob-picking step a 100 TB MinHash run cannot grid-search against the data
      Dedup.lshTuningTable(s, 32, 0.8)
    },
    "dedup_fingerprint_overlap" -> { (s, dir) =>
      // substring-containment detection: exact copies (%35) and near copies (%55)
      // planted into a %5 subcorpus must surface at containment >= 0.5
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val sub = d.filter(col("doc_id") % 5 === 0)
        .unionByName(d.filter(col("doc_id") % 35 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
        .unionByName(d.filter(col("doc_id") % 55 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" xtradup token")).as("text")))
      Dedup.fingerprintOverlapPairs(sub, "doc_id", "text", k = 8, w = 4,
          minContainment = 0.5)
        .select(col("id_l"), col("id_r"), col("shared"),
          round(col("containment"), 6).as("containment"))
        .orderBy("id_l", "id_r")
    },
    "dedup_minhash_incremental" -> { (s, dir) =>
      // daily-ingest shape: originals are the corpus, planted copies/near-copies are
      // the incoming batch; the corpus side never self-joins (candidate work scales
      // with the batch). Same verified pairs as the full run restricted to
      // batch-touching pairs — the oracle states exactly that.
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val incoming = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" xtradup token")).as("text")))
      Dedup.incrementalMinhashPairs(d, incoming, "doc_id", "text", 0.5)
        .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_l", "id_r")
    },
    "dedup_minhash_index" -> { (s, dir) =>
      // same semantics as dedup_minhash_incremental, but the corpus side reads the
      // PERSISTED band index (signatures computed once at ingest, stored, reused) —
      // same oracle proves the stored index is equivalent to recomputation
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val incoming = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 200000).as("doc_id"),
            concat(col("text"), lit(" xtradup token")).as("text")))
      val path = graft.util.Scratch.deleteOnExit(
        s"${System.getProperty("java.io.tmpdir")}/graft_mhidx/${graft.util.Scratch.runToken}") +
        "/bands"
      Dedup.writeMinhashIndex(d, "doc_id", "text", path)
      Dedup.incrementalMinhashPairsFromIndex(path, d, incoming, "doc_id", "text", 0.5)
        .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_l", "id_r")
    },
    "dedup_apply" -> { (s, dir) =>
      // end-to-end: minhash pairs → transitive components → keeper per doc, checked
      // in full against a recursive-CTE closure oracle (cluster ids are string minima)
      val corpus = plantedCorpus(s, dir)
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5)
      Dedup.deduplicate(corpus, "doc_id", pairs)
        .select(col("doc_id"), col("cluster_id"), col("is_keeper"))
        .orderBy("doc_id")
    },
    "dedup_apply_best" -> { (s, dir) =>
      // quality-keeper variant: collapse each near-dup cluster to its HIGHEST-quality
      // member (ties → smallest id) — the production policy when a quality signal
      // exists; round-6 score so the keeper choice replays in DuckDB
      val corpus = plantedCorpus(s, dir)
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5)
      Dedup.deduplicateBest(corpus, "doc_id", pairs,
          round(TextOps.qualityScore(col("text")), 6))
        .select(col("doc_id"), col("cluster_id"), col("keeper_id"), col("is_keeper"))
        .orderBy("doc_id")
    },
    "dedup_simhash" -> { (s, dir) =>
      Dedup.simhash16(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    "dedup_embedding_cosine" -> { (s, dir) =>
      // scale path: hyperplane-LSH candidates + array_dot verify over a corpus with
      // planted near-dups (no all-pairs join; the DuckDB oracle is the brute force)
      Dedup.embeddingLshPairs(plantedEmb(s, dir), "vec_id", "embedding", 0.9)
        .select(col("id_l"), col("id_r"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_l", "id_r")
    },
    "dedup_semantic" -> { (s, dir) =>
      // SemDeDup, full oracle (new r6): Lloyd training is portable-md5-seeded, so
      // DuckDB replays fit + within-cell pairing + exact-cosine verify exactly
      Dedup.semanticPairs(plantedEmb(s, dir), "vec_id", "embedding", 0.9, k = 16)
        .select(col("id_l"), col("id_r"), round(col("cosine"), 6).as("cosine"))
        .orderBy("id_l", "id_r")
    },
    "ann_cosine_topk" -> { (s, dir) =>
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    "ann_sq_topk" -> { (s, dir) =>
      // int8 scalar-quantized ANN: closed-form encode + integer ADC shortlist +
      // exact re-rank — fully deterministic, hence the ANN family's full oracle
      val e = emb(s, dir)
      Similarity.sqTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    "text_bm25_topk" -> { (s, dir) =>
      // lexical retrieval: Okapi BM25 over the relational inverted index
      import s.implicits._
      val q = BM25Queries.toDF("query_id", "qtext")
      Similarity.bm25TopK(spread(docs(s, dir)), "doc_id", "text", q, 5)
        .orderBy("query_id", "rank")
    },
    "eval_retrieval_ndcg" -> { (s, dir) =>
      // offline retrieval evaluation: NDCG@10 / reciprocal rank / P@10 of the BM25
      // ranking against deterministic graded qrels (rel = how many distinct query
      // tokens a document contains — an equi-join on token, never a doc×query
      // cross join; docs sharing no token drop out as rel-0 naturally)
      import s.implicits._
      val q = BM25Queries.toDF("query_id", "qtext")
      val ranking = Similarity.bm25TopK(spread(docs(s, dir)), "doc_id", "text", q, 10)
        .select("query_id", "rank", "doc_id")
      Similarity.retrievalEval(ranking, tokenOverlapQrels(s, dir, q), k = 10,
          relThreshold = 2)
        .select(col("query_id"), round(col("ndcg"), 6).as("ndcg"),
          round(col("rr"), 6).as("rr"), round(col("p_at_k"), 6).as("p_at_k"))
        .orderBy("query_id")
    },
    "eval_annotator_agreement" -> { (s, dir) =>
      // label-quality gate: Cohen's kappa (r1 vs r2) + Fleiss' kappa (full panel)
      // over a deterministic 3-rater fixture — rater k flips the base category
      // (n_chars % 4) by +k on the ~20% of docs where (doc_id·p_k) % 5 = 0
      import graft.metrics.Agreement
      val d = docs(s, dir).select(col("doc_id"), (col("n_chars") % 4).as("base"))
      val labels = Seq((1, 3), (2, 7), (3, 11)).map { case (k, p) =>
        d.select(col("doc_id").as("item"), lit(s"r$k").as("rater"),
          when((col("doc_id") * p) % 5 === 0, (col("base") + k) % 4)
            .otherwise(col("base")).cast("string").as("cat"))
      }.reduce(_ unionByName _)
      val cohen = Agreement
        .cohensKappa(labels, col("item"), col("rater"), col("cat"), "r1", "r2")
        .withColumnRenamed("n_items", "n_pair_items")
      cohen.crossJoin(
        Agreement.fleissKappa(labels, col("item"), col("rater"), col("cat")))
    },
    "ep13_hard_negatives" -> { (s, dir) =>
      // hard-negative mining for bi-encoder training, the DPR/RocketQA recipe:
      // pseudo-positives are the BM25 top-3, hard negatives the NEXT top-ranked
      // candidates (BM25 top-k minus gold) — confusable-but-not-gold documents.
      // The token-overlap grade rides along so a consumer can re-filter when real
      // labels exist. Everything downstream of the bounded top-20 list is
      // queries×k-sized.
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val q = BM25Queries.toDF("query_id", "qtext")
      val cands = Similarity.bm25TopK(spread(docs(s, dir)), "doc_id", "text", q, 20)
      cands.filter(col("rank") > 3)
        .join(tokenOverlapQrels(s, dir, q), Seq("query_id", "doc_id"), "left")
        .withColumn("rel", coalesce(col("rel"), lit(0)))
        .withColumn("neg_rank",
          row_number().over(Window.partitionBy("query_id").orderBy("rank")))
        .filter(col("neg_rank") <= 5)
        .select("query_id", "neg_rank", "doc_id", "bm25", "rel")
        .orderBy("query_id", "neg_rank")
    },
    "ep6_retrieval" -> { (s, dir) =>
      // end-to-end RAG retrieval: chunk into overlapping passages, score with the
      // same BM25 operator over the passage index, return top-3 passages per query.
      // chunk_id packs (doc_id, chunk_index) into one long at a 2^32 radix — safe
      // for any chunk count a real document can produce (a collision would need
      // 2^32 chunks ≈ 10^11 tokens in ONE doc) and for doc_id < 2^31
      import s.implicits._
      val Radix = 4294967296L // 2^32
      val chunks = graft.textops.Curation.chunkPassages(spread(docs(s, dir)), "doc_id", "text",
          windowTokens = 32, strideTokens = 24)
        .select((col("doc_id") * Radix + col("chunk_index")).as("chunk_id"), col("chunk"))
      val q = BM25Queries.toDF("query_id", "qtext")
      Similarity.bm25TopK(chunks, "chunk_id", "chunk", q, 3)
        .select(col("query_id"), col("rank"),
          expr(s"doc_id div $Radix").as("doc_id"),
          (col("doc_id") % Radix).cast("int").as("chunk_index"),
          col("bm25"), col("n_terms"))
        .orderBy("query_id", "rank")
    },
    "ep9_hybrid_retrieval" -> { (s, dir) =>
      // hybrid similar-document search: a lexical BM25 ranking (the query is the
      // document's own text — "more like this") and an embedding cosine ranking are
      // combined by reciprocal-rank fusion over their bounded top-20 lists; the two
      // retrievers legitimately cover different candidate pools (all docs vs the
      // embedded subset) — fusing heterogeneous coverage is what RRF is for
      val d = spread(docs(s, dir))
      val lexQ = d.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("text").as("qtext"))
      val lex = Similarity.bm25TopK(d, "doc_id", "text", lexQ, 20)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val e = emb(s, dir)
      val sem = Similarity
        .bruteForceTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 20)
        .select(col("query_id"), col("id"), col("rank"))
      Similarity.rrfFuse(Seq(lex, sem), 5)
        .select(col("query_id"), col("rank"), col("id"),
          round(col("rrf"), 6).as("rrf"))
        .orderBy("query_id", "rank")
    },
    "sim_margin_bitext" -> { (s, dir) =>
      // margin-based bitext mining (LASER/CCMatrix recipe): even vec_ids play the
      // source language, odd the target; ratio margin ≥ 1 keeps pairs scoring
      // better than an average neighbor, one best target per source
      val e = emb(s, dir)
      Similarity.marginBitext(
          e.filter(col("vec_id") % 2 === 0), e.filter(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, threshold = 1.0)
        .orderBy("src_id")
    },
    "sim_mmr_rerank" -> { (s, dir) =>
      // MMR diversity re-rank — FULL oracle: the greedy selection runs a fixed
      // k=10 picks, so the generated 10-step argmax chain replays the whole loop
      // (TextOpsSpec also pins an independent reimplementation + planted dups)
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") % 101 === 0)
      val cands = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 30)
        .select(col("query_id"), col("id"), col("rank"), col("cosine").as("rel"))
      Similarity.mmrRerank(cands, e, "vec_id", "embedding", 0.7, 10)
        .orderBy("query_id", "mmr_rank")
    },
    "sim_mmr_two_step" -> { (s, dir) =>
      // the first TWO greedy MMR picks ARE SQL-expressible — pick 1 = argmax rel
      // (rank 1 by construction), pick 2 = argmax λ·rel − (1−λ)·max(0, cos to
      // pick 1) — so this runs the SAME MmrSelect expression as the rows-only
      // sim_mmr_rerank with k=2 and gets a FULL oracle (chained-oracle pattern)
      val e = emb(s, dir)
      val queries = e.filter(col("vec_id") % 101 === 0)
      val cands = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 30)
        .select(col("query_id"), col("id"), col("rank"), col("cosine").as("rel"))
      Similarity.mmrRerank(cands, e, "vec_id", "embedding", 0.7, 2)
        .orderBy("query_id", "mmr_rank")
    },
    "sim_pca_one_iter" -> { (s, dir) =>
      // one power-iteration step over the covariance from the all-ones start —
      // the closed-form slice of the PCA eigensolve, fully replayed by the
      // oracle on top of sim_covariance's already-pinned matrix
      Pca.powerIteration(emb(s, dir), "embedding", iters = 1)
        .select(col("i"), (round(col("v"), 6) + lit(0.0)).as("v"))
        .orderBy("i")
    },
    "ep12_diverse_retrieval" -> { (s, dir) =>
      // diversified retrieval capstone with a FULL oracle: BM25 top-20 over the
      // planted near-dup corpus, collapse each minhash cluster to its best hit
      // (near-dups would otherwise swamp the result list), top-5 per query —
      // cluster-based diversification, the SQL-expressible sibling of MMR
      import s.implicits._
      import graft.util.Caching.CacheSyntax
      // ONE spread + persisted corpus materialization feeds all three legs (BM25
      // terms, minhash signatures + verify, cluster attach) — the profile showed
      // the 3-task union synthesized per leg (r12, guide §2.4/§2.5); values are
      // per-row deterministic + count/rounded-sum aggregates, layout-proof
      val corpus = spread(plantedCorpus(s, dir)).scopedPersist()
      val q = BM25Queries.toDF("query_id", "qtext")
      val cands = Similarity.bm25TopK(corpus, "doc_id", "text", q, 20)
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5)
      val clusters = Dedup.deduplicate(corpus, "doc_id", pairs)
        .select(col("doc_id"), col("cluster_id"))
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id", "cluster_id").orderBy("rank")
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy("rank")
      cands.join(clusters, Seq("doc_id"))
        .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
        .withColumn("drank", row_number().over(w2)).filter(col("drank") <= 5)
        .select(col("query_id"), col("drank").as("rank"), col("doc_id"), col("bm25"))
        .orderBy("query_id", "rank")
    },
    "sim_mean_pool" -> { (s, dir) =>
      // embedding mean-pooling (chunk→doc) via the native ArrayAvgAgg buffer
      // aggregate — one (sum, count) buffer per group, never a position explode;
      // the pooled vectors explode to (group, pos, val) rows ONLY for the comparator
      val pooled = emb(s, dir)
        .groupBy((col("vec_id") % 50).as("group_id"))
        .agg(graft.functions.array_avg_agg(col("embedding").cast("array<double>")).as("v"))
      pooled.select(col("group_id"), posexplode(col("v")).as(Seq("pos", "val")))
        .select(col("group_id"), col("pos"), round(col("val"), 6).as("val"))
        .orderBy("group_id", "pos")
    },
    "sim_pca_subspace" -> { (s, dir) =>
      // top-4 eigenbasis by RELATIONAL subspace iteration (C·V + Gram-Schmidt,
      // all dim-bounded joins/aggregates, no driver eigensolve) at a fixed 6
      // iterations — the closed-form, fully-oracled sibling of the rows-only
      // Jacobi sim_pca_project (generated chain, the graph-kernel pattern)
      Pca.subspaceIteration(emb(s, dir), "embedding", r = 4, iters = 6)
        .select(col("i"), col("k"), (round(col("v"), 6) + lit(0.0)).as("v"))
        .orderBy("i", "k")
    },
    "sim_pca_project" -> { (s, dir) =>
      // distributed PCA + projection — FULL oracle (new r9): the eigenbasis comes
      // from CONVERGED subspace iteration (tol-frozen driver loop over the
      // distributed covariance, the j5_em_train freeze-chain pattern) instead of
      // the driver Jacobi, so the whole fit→project path replays in SQL; tol
      // 0.01 / cap 40 — the synthetic corpus' top-4 eigengap is tiny, so full
      // double-precision convergence would need hundreds of rounds for identical
      // rounded output (both engines replay the same frozen chain either way).
      // Jacobi fit() remains the library default, pinned by ScalaTest.
      val e = emb(s, dir)
      val model = Pca.fitSubspace(e, "embedding", r = 4, tol = 0.01, maxIter = 40)
      Pca.project(e, "embedding", model)
        .select(col("vec_id"), (round(col("pc_0"), 6) + lit(0.0)).as("pc_0"),
          (round(col("pc_1"), 6) + lit(0.0)).as("pc_1"),
          (round(col("pc_2"), 6) + lit(0.0)).as("pc_2"),
          (round(col("pc_3"), 6) + lit(0.0)).as("pc_3"))
        .orderBy("vec_id")
    },
    "sim_covariance" -> { (s, dir) =>
      // the distributed core of PCA (the ONE mean + outer-product aggregation that
      // fit() runs) made oracle-checkable: population covariance of the embedding
      // corpus, upper triangle — only the eigensolve stays driver-side/rows-only
      // + 0.0 collapses IEEE -0.0 to 0.0 (ROUND can yield signed zero on either
      // engine and the driver compares string renderings)
      Pca.covariance(emb(s, dir), "embedding")
        .select(col("i"), col("j"), (round(col("cov"), 6) + lit(0.0)).as("cov"))
        .orderBy("i", "j")
    },
    "sim_kmeans_assign" -> { (s, dir) =>
      // the assignment step of SemDeDup/IVF (codegen'd NearestCentroid argmax-dot
      // over normalized vectors) with FIXED centroids (vec_id < 8), so the full
      // assignment is deterministic and DuckDB-checkable; centroids are a bounded
      // k×dim driver collect, the same convention as IVF/PQ training
      import s.implicits._
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8).orderBy("vec_id")
        .select(graft.functions.array_normalize(col("embedding").cast("array<double>")))
        .as[Array[Double]].collect()
      val v = graft.functions.array_normalize(col("embedding").cast("array<double>"))
      // per-centroid cosine via sequential-fold HOF (same accumulation order as the
      // oracle's list_inner_product); the emitted cosine is element_at of the chosen
      // index so it is bit-identical to what the argmax saw
      def cosTo(c: Array[Double]): Column = aggregate(
        zip_with(v, typedLit(c.toSeq), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      e.select(col("vec_id"),
          graft.functions.nearest_centroid(v, cents).as("centroid_id"),
          array(cents.map(cosTo).toIndexedSeq: _*).as("_cos"))
        .select(col("vec_id"), col("centroid_id"),
          round(element_at(col("_cos"), col("centroid_id") + 1), 6).as("cosine"))
        .orderBy("vec_id")
    },
    "sim_silhouette" -> { (s, dir) =>
      // cluster-quality check for the kmeans/SemDeDup cell structure: simplified
      // silhouette (vs centroids, the O(N·k) scale form) over the SAME fixed
      // deterministic centroids as sim_kmeans_assign — one corpus pass, one
      // k-row aggregate
      import s.implicits._
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8).orderBy("vec_id")
        .select(graft.functions.array_normalize(col("embedding").cast("array<double>")))
        .as[Array[Double]].collect()
      graft.textops.Similarity.silhouette(e, "vec_id", "embedding", cents)
        .orderBy("centroid_id")
    },
    "sim_cluster_sample" -> { (s, dir) =>
      // cluster-balanced diversity sampling: nearest-centroid cells (same fixed
      // deterministic centroids as sim_kmeans_assign) + at most 12 rows per cell
      // in md5(id) order — the topic-skew-flattening curation draw
      import s.implicits._
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < 8).orderBy("vec_id")
        .select(graft.functions.array_normalize(col("embedding").cast("array<double>")))
        .as[Array[Double]].collect()
      graft.textops.Similarity.clusterBalancedSample(e, "vec_id", "embedding", cents, 12)
        .orderBy("centroid_id", "cell_rank")
    },
    "ann_lsh_topk" -> { (s, dir) =>
      // full oracle (new r6): the hyperplanes are seed-deterministic, so the DuckDB
      // side regenerates them as literals and replays bucket-join + exact re-rank
      val e = emb(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    "ann_ivf_topk" -> { (s, dir) =>
      // full oracle (new r6): Lloyd training is 2 deterministic rounds from a
      // portable md5-hash seeding, so the DuckDB oracle replays fit AND serve —
      // seed pick, both assign/recenter rounds, probe selection, exact re-rank
      val e = emb(s, dir)
      val model = Ivf.fit(e, "vec_id", "embedding", k = 16)
      Ivf.topK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5, model)
        .orderBy("query_id", "rank")
    },
    "ann_ivf_scalable_topk" -> { (s, dir) =>
      // k-means|| seeding (full oracle): md5-fraction distance-proportional
      // candidate rounds + deterministic weighted farthest-point reduction are
      // all portable, so DuckDB replays the ENTIRE fit (seeding chain + both
      // Lloyd rounds) and the serve path
      val e = emb(s, dir)
      val model = Ivf.fitScalable(e, "vec_id", "embedding", k = 16)
      Ivf.topK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5, model)
        .orderBy("query_id", "rank")
    },
    "ann_ivf_incremental" -> { (s, dir) =>
      // day-2 index growth: fit on the BASE corpus only, write its index, APPEND
      // the new batch under the same model (no refit), then serve from the grown
      // index. Full oracle: DuckDB replays base-only training and serves over
      // base ∪ batch — which is exactly what the appended index must equal.
      val e = emb(s, dir)
      val base = e.filter(col("vec_id") % 4 =!= 3)
      val batch = e.filter(col("vec_id") % 4 === 3)
      val model = Ivf.fit(base, "vec_id", "embedding", k = 16)
      val path = graft.util.Scratch.deleteOnExit(
        s"${System.getProperty("java.io.tmpdir")}/graft_ivf_inc/" +
          s"${graft.util.Scratch.runToken}_${System.nanoTime()}")
      Ivf.writeIndex(base, "vec_id", "embedding", model, path)
      Ivf.appendToIndex(batch, "vec_id", "embedding", model, path)
      Ivf.topKFromIndex(s, path, e.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5, model)
        .orderBy("query_id", "rank")
    },
    "ann_pq_topk" -> { (s, dir) =>
      // full oracle (new r6): portable md5 seeding makes the per-subspace Lloyd
      // training replayable, so DuckDB replays codebook fit, ADC shortlist, re-rank
      val e = emb(s, dir)
      val ivf = Ivf.fit(e, "vec_id", "embedding", k = 16)
      val pq = Pq.fit(e, "vec_id", "embedding", dim = 64)
      Pq.topK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5, ivf, pq)
        .orderBy("query_id", "rank")
    },
    "mm_cdc_dedup" -> { (s, dir) =>
      // blob-level dedup over opaque binary payloads: gear-hash content-defined
      // chunks resynchronize after the planted near-copies' appended-token edit,
      // so orig and copy share almost all chunk hashes via a plain equi-join —
      // the multimodal sibling of minhash dedup (no per-pair comparison, the
      // chunk-hash join IS the candidate generator) — FULL oracle: the 5-bit
      // boundary test is a sliding window and the size-constrained boundary
      // recurrence closes under binary lifting (see mmCdcDedupSql).
      // payload = text ×4 so each blob spans many chunks; the copy's appended
      // token then recurs as FOUR interior edits, and CDC resyncs after each
      val corpus = plantedCorpus(s, dir)
        .withColumn("payload", repeat(col("text"), 4).cast("binary"))
      val chunks = corpus.select(col("doc_id"),
          explode(graft.functions.cdc_chunks(col("payload"), 8, 5, 128)).as("c"))
        .select(col("doc_id"), col("c.hash").as("hash"))
        .distinct()
      val orig = chunks.filter(col("doc_id") < 100000 && col("doc_id") % 11 === 0)
      val copy = chunks.filter(col("doc_id") >= 200000)
        .withColumn("doc_id", col("doc_id") - 200000)
      val no = orig.groupBy("doc_id").agg(count(lit(1)).as("n_orig"))
      val nc = copy.groupBy("doc_id").agg(count(lit(1)).as("n_copy"))
      val shared = orig.join(copy, Seq("doc_id", "hash"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      no.join(nc, "doc_id").join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_orig"), col("n_copy"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          round(coalesce(col("n_shared"), lit(0L)) /
            (col("n_orig") + col("n_copy") - coalesce(col("n_shared"), lit(0L))), 6)
            .as("chunk_jaccard"))
        .orderBy("doc_id")
    },
    "mm_cdc_chunks_fixed" -> { (s, dir) =>
      // the frozen-payload sibling of mm_cdc_dedup: constant payloads → constant
      // gear-hash chunk tables, replayed verbatim by the oracle (incl. the
      // resync after the 3-byte insert at offset 300 — identical hashes after it)
      import s.implicits._
      val fixtures = Seq((0L, MmCdcBaseHex), (1L, MmCdcEditHex)).toDF("fid", "hex")
      fixtures.select(col("fid"),
          explode(graft.functions.cdc_chunks(unhex(col("hex")), 8, 5, 128)).as("c"))
      // offset/length are reserved words in the oracle engine — emit SQL-neutral names
        .select(col("fid"), col("c.offset").as("chunk_offset"),
          col("c.length").as("chunk_length"), col("c.hash").as("hash"))
        .orderBy("fid", "chunk_offset")
    },
    "mm_binary_meta" -> { (s, dir) =>
      Multimodal.extractMeta(
          docs(s, dir).withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload")
        .toDF().orderBy("id")
    },
    "mm_resize" -> { (s, dir) =>
      // binary→binary batch transform; compare by length+md5 (payload is deterministic)
      Multimodal.resize(
          docs(s, dir).withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", targetWidth = 16, targetHeight = 16)
        .toDF()
        .select(col("id"), col("width"), col("height"),
          length(col("payload")).as("out_len"), md5(col("payload")).as("payload_md5"))
        .orderBy("id")
    },
    "mm_resize_real" -> { (s, dir) =>
      // REAL bilinear pixel math pinned end-to-end: the constant 5×3 PNG and 7×2
      // BMP resize to 3×2 packed RGB24 (pure raster function, no encoder in the
      // output), the text payload takes the stub fallback; the oracle carries the
      // frozen dims + md5 as constants (mm_png_meta pattern)
      import s.implicits._
      val fixtures = Seq((0L, MmPngHex), (1L, MmBmpHex), (2L, MmTextHex))
        .toDF("fid", "hex")
      Multimodal.resize(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")),
          "fid", "payload", targetWidth = 3, targetHeight = 2)
        .toDF()
        .select(col("id"), col("width"), col("height"),
          length(col("payload")).as("out_len"), md5(col("payload")).as("payload_md5"))
        .orderBy("id")
    },
    "mm_audio_meta" -> { (s, dir) =>
      // REAL WAV header parse via javax.sound (rate/channels/bits/frames), stub
      // closed form for the text payload — frozen fixture truths on the oracle side
      import s.implicits._
      val fixtures = Seq((0L, MmWavMonoHex), (1L, MmWavStereoHex), (2L, MmAudioTextHex))
        .toDF("fid", "hex")
      Multimodal.audioMeta(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")), "fid", "payload")
        .toDF()
        .select(col("id"), col("byte_len"), col("sample_rate"), col("channels"),
          col("bits"), col("n_frames"), round(col("duration_ms"), 6).as("duration_ms"))
        .orderBy("id")
    },
    "mm_type_sniff" -> { (s, dir) =>
      // intake audit over a mixed multimodal dump: magic-byte classification of
      // every constant fixture payload (image/audio/video/unknown) — the gate a
      // 100 TB binary column passes before type-specific extraction
      import s.implicits._
      val fixtures = Seq(
        (0L, MmPngHex), (1L, MmBmpHex), (2L, MmGifHex),
        (3L, MmWavMonoHex), (4L, MmWavStereoHex),
        (5L, MmMp4OneTrackHex), (6L, MmMp4TwoTrackHex),
        (7L, MmTextHex), (8L, MmCdcBaseHex),
        (9L, MmWebmHex), (10L, MmMkvHex)).toDF("fid", "hex")
      Multimodal.sniffTypes(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")), "fid", "payload")
        .toDF()
        .orderBy("id")
    },
    "mm_audio_silence" -> { (s, dir) =>
      // silence-trim map: sub-threshold RMS windows merged into spans
      // (gaps-and-islands) — real decode for the WAVs, stub path for the text
      // payload (its centered-byte windows are quiet too)
      import s.implicits._
      val fixtures = Seq((0L, MmWavMonoHex), (1L, MmWavStereoHex),
        (2L, MmAudioTextHex), (3L, MmWavLoudQuietLoudHex), (4L, MmWavAllQuietHex))
        .toDF("fid", "hex")
      Multimodal.silenceSpans(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")),
          "fid", "payload", windowSamples = 16, rmsThreshold = 100.0)
        .orderBy("id", "span_start")
    },
    "mm_video_meta" -> { (s, dir) =>
      // REAL ISO-BMFF box walk (ftyp brand, mvhd timescale/duration, trak count,
      // tkhd 16.16 dims), stub closed form for the text payload — frozen truths
      // on the oracle side (the mm_audio_meta pattern)
      import s.implicits._
      val fixtures =
        Seq((0L, MmMp4OneTrackHex), (1L, MmMp4TwoTrackHex), (2L, MmVideoTextHex))
          .toDF("fid", "hex")
      Multimodal.videoMeta(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")), "fid", "payload")
        .toDF()
        .select(col("id"), col("byte_len"), col("major_brand"), col("timescale"),
          round(col("duration_ms"), 6).as("duration_ms"), col("n_tracks"),
          col("width"), col("height"))
        .orderBy("id")
    },
    "mm_webm_meta" -> { (s, dir) =>
      // REAL EBML header walk (DocType, Info TimestampScale/Duration, TrackEntry
      // count, Video pixel dims) over the frozen webm + streamed-matroska
      // fixtures, stub closed form for the text payload — the mm_video_meta
      // pattern for the other big crawled-video container family
      import s.implicits._
      val fixtures = Seq((0L, MmWebmHex), (1L, MmMkvHex), (2L, MmVideoTextHex))
        .toDF("fid", "hex")
      Multimodal.videoMeta(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")), "fid", "payload")
        .toDF()
        .select(col("id"), col("byte_len"), col("major_brand").as("doc_type"),
          col("timescale").as("timescale_ns"),
          round(col("duration_ms"), 6).as("duration_ms"), col("n_tracks"),
          col("width"), col("height"))
        .orderBy("id")
    },
    "text_char_entropy" -> { (s, dir) =>
      // compression-proxy junk gate: per-doc Shannon character entropy (bits/char)
      // with a planted low-entropy filler suffix every 4th doc — the sorted-order
      // accumulation makes the float replay bit-exact
      val planted = concat(col("text"),
        when(col("doc_id") % 4 === 0, lit(" aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))
          .otherwise(lit("")))
      docs(s, dir).select(col("doc_id"), planted.as("t"))
        .select(col("doc_id"), length(col("t")).as("n_chars"),
          round(TextOps.charEntropy(col("t")), 6).as("entropy_bits"))
        .orderBy("doc_id")
    },
    "text_nfc_normalize" -> { (s, dir) =>
      // NFC canonical composition before hash keying: every 3rd doc gets a
      // decomposed 'e'+U+0301 suffix that must collapse to the composed form
      val planted = concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" café")).otherwise(lit("")))
      docs(s, dir).select(col("doc_id"), planted.as("t"))
        .select(col("doc_id"),
          (TextOps.nfcNormalize(col("t")) =!= col("t")).as("changed"),
          length(col("t")).as("n_before"),
          length(TextOps.nfcNormalize(col("t"))).as("n_after"),
          md5(TextOps.nfcNormalize(col("t")).cast("binary")).as("h"))
        .orderBy("doc_id")
    },
    "mm_srt_cues" -> { (s, dir) =>
      // SRT caption parse + per-cue CPS quality stats over a deterministic
      // fixture: two valid cues per doc (the second zero-length every 9th doc →
      // NULL cps) plus a malformed block the header gate must drop
      val sec1 = lpad((col("doc_id") % 50).cast("string"), 2, "0")
      val sec2 = lpad((col("doc_id") % 50 + 1).cast("string"), 2, "0")
      val cue1 = concat(lit("1\n00:00:"), sec1, lit(",000 --> 00:00:"), sec2,
        lit(",500\n"), substring(col("text"), 1, 40))
      val end2 = when(col("doc_id") % 9 === 0, lit("00:01:00,000"))
        .otherwise(lit("00:01:02,000"))
      // cue2 is deliberately CRLF-terminated: parseSrt must normalize it to parse
      // identically to the oracle's LF-built equivalent (real-world SRT is CRLF)
      val cue2 = concat(lit("2\r\n00:01:00,000 --> "), end2, lit("\r\n"),
        substring(col("text"), 41, 30), lit("\r\nsecond line"))
      val bad = lit("3\nnot a timestamp\noops")
      val srt = concat_ws("\n\n", cue1, cue2, bad)
      graft.textops.Captions.parseSrt(
          docs(s, dir).select(col("doc_id"), srt.as("srt")), col("doc_id"), col("srt"))
        .select(col("id"), col("cue_index"), col("start_ms"), col("end_ms"),
          col("duration_ms"), col("cue_text"), col("n_chars"),
          round(col("cps"), 6).as("cps"))
        .orderBy("id", "cue_index")
    },
    "mm_audio_energy" -> { (s, dir) =>
      // REAL first-channel PCM windowed RMS/peak (window 16; mono 48 frames → 3
      // windows, stereo 20 → 2, stub text bytes 20 → 2) — frozen on the oracle side
      import s.implicits._
      val fixtures = Seq((0L, MmWavMonoHex), (1L, MmWavStereoHex), (2L, MmAudioTextHex))
        .toDF("fid", "hex")
      Multimodal.audioEnergy(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")),
          "fid", "payload", windowSamples = 16)
        .toDF()
        .select(col("id"), col("window_index"), col("n_samples"),
          round(col("rms"), 6).as("rms"), col("peak"))
        .orderBy("id", "window_index")
    },
    "mm_phash" -> { (s, dir) =>
      // perceptual dHash of the constant image fixtures (new r8): real decode +
      // 9×8 bilinear + integer luma + difference bits — frozen as constants on
      // the oracle side; the text payload must hash to NULL (not decodable)
      import s.implicits._
      val fixtures = Seq((0L, MmPngHex), (1L, MmBmpHex), (2L, MmTextHex))
        .toDF("fid", "hex")
      Multimodal.perceptualHashes(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")),
          "fid", "payload")
        .orderBy("id")
    },
    "mm_png_meta" -> { (s, dir) =>
      // REAL JDK header decode pinned end-to-end: constant PNG/BMP payloads with
      // known true dimensions, plus a text payload exercising the stub fallback;
      // the oracle carries the same hex literals with the dims as constants
      import s.implicits._
      val fixtures = Seq((0L, MmPngHex), (1L, MmBmpHex), (2L, MmTextHex))
        .toDF("fid", "hex")
      Multimodal.extractMeta(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")),
          "fid", "payload")
        .toDF().orderBy("id")
    },
    "mm_frame_sample" -> { (s, dir) =>
      // flatMap batch shape: one row per sampled frame (every 2nd of the stub header's
      // frame count), fingerprinted
      Multimodal.sampleFrames(
          docs(s, dir).withColumn("payload", col("text").cast("binary")),
          "doc_id", "payload", stride = 2)
        .toDF().orderBy("id", "frame_index")
    },
    "mm_frame_sample_real" -> { (s, dir) =>
      // REAL frame decode pinned end-to-end: the constant 5-frame animated GIF
      // yields its true frames (stride 2 -> 0,2,4, each fingerprinting its
      // packed-RGB24 raster), the single-frame PNG yields frame 0, and the text
      // payload takes the stub byte-range path — all frozen as oracle constants
      import s.implicits._
      val fixtures = Seq((0L, MmGifHex), (1L, MmPngHex), (2L, MmTextHex))
        .toDF("fid", "hex")
      Multimodal.sampleFrames(
          fixtures.select(col("fid"), unhex(col("hex")).as("payload")),
          "fid", "payload", stride = 2)
        .toDF().orderBy("id", "frame_index")
    },
    "stream_window_agg" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      StreamOps.windowedEventCounts(s, s"$dir/events.parquet")
        .orderBy("window_start", "event_type")
    },
    "stream_stateful_totals" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      StreamOps.statefulUserTotals(s, s"$dir/events.parquet")
        .orderBy("user_id")
    },
    "stream_tws_totals" -> { (s, dir) =>
      // the SAME running totals on Spark 4's transformWithState arbitrary-state
      // API (StatefulProcessor + named ValueState + RocksDB store) — the two
      // state APIs share one oracle, so they pin each other
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      StreamOps.statefulUserTotalsTws(s, s"$dir/events.parquet")
        .orderBy("user_id")
    },
    "ev_json_extract" -> { (s, dir) =>
      events(s, dir)
        .select(get_json_object(col("props"), "$.k").as("k_val"))
        .groupBy("k_val").agg(count(lit(1)).as("cnt"))
        .orderBy("k_val")
    },
    "stream_sessionize" -> { (s, dir) =>
      // flatMapGroupsWithState + event-time timeout: emits every session whose close
      // is proven by the final watermark; oracle = batch sessions with end+gap < max ts
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      StreamOps.streamingSessionize(s, s"$dir/events.parquet", gapSeconds = 1800L)
        .orderBy("user_id", "session_start_us")
    },
    "ev_transitions" -> { (s, dir) =>
      // event transition matrix: consecutive-event-type counts per user (the Markov
      // view of the event stream); (ts, event_id) ordering makes ties deterministic
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("from_type", "to_type")
    },
    "ev_paths" -> { (s, dir) =>
      // top-10 3-step event paths (path-mining staple): two lags over the same
      // (ts, event_id)-ordered user window, hash agg on the path string, bounded
      // top-k — the rank window runs over the 10 survivors only
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val top = events(s, dir)
        .withColumn("p1", lag(col("event_type"), 2).over(w))
        .withColumn("p2", lag(col("event_type"), 1).over(w))
        .filter(col("p1").isNotNull)
        .select(concat_ws(">", col("p1"), col("p2"), col("event_type")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("path")).limit(10)
      top.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(desc("n"), asc("path"))))
        .select("rank", "path", "n")
        .orderBy("rank")
    },
    "ev_funnel" -> { (s, dir) =>
      // first-touch ordered funnel over the event stream: view → click → purchase
      graft.events.Analytics.funnelCounts(events(s, dir),
          col("user_id"), col("ts"), col("event_type"),
          Seq("view", "click", "purchase"))
        .orderBy("stage_index")
    },
    "ev_anomaly" -> { (s, dir) =>
      // per-event-type daily volume z-scores (closed-form variance over exact
      // integer sums — bit-identical across engines); |z| >= 2 flagged
      graft.events.Analytics.dailyAnomalies(events(s, dir),
          col("event_type"), col("ts"), threshold = 2.0)
        .select(col("key"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n"), col("z"), col("is_anomaly"))
        .orderBy("key", "day")
    },
    "prof_key_skew" -> { (s, dir) =>
      // heavy-hitter / skew diagnostic on the events join key: top-10 users by
      // volume with share and skew-vs-uniform factor
      graft.metrics.Profile.keySkew(events(s, dir), col("user_id"), 10)
        .orderBy("rank")
    },
    "ev_retention" -> { (s, dir) =>
      // calendar-day cohorts by first event; distinct active users per day offset
      graft.events.Analytics.cohortRetention(events(s, dir),
          col("user_id"), col("ts"), maxOffsetDays = 7)
        .orderBy("cohort_date", "day_offset")
    },
    "stream_enrich" -> { (s, dir) =>
      // stream-static broadcast join: events enriched with the customer dimension
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      StreamOps.streamStaticEnrich(s, s"$dir/events.parquet",
          s.read.parquet(s"$dir/customer.parquet"))
        .orderBy("c_mktsegment", "event_type")
    },
    "stream_stream_join" -> { (s, dir) =>
      // stream-stream interval join: views × same-user purchases within 30 min
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      StreamOps.streamStreamIntervalJoin(s, s"$dir/events.parquet", 30)
        .orderBy("user_id")
    },
    "stream_left_join" -> { (s, dir) =>
      // left-outer variant: proven-unmatched views emit with nulls at eviction
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      StreamOps.streamStreamLeftJoin(s, s"$dir/events.parquet", 30)
        .orderBy("user_id")
    },
    "stream_sharded_sink" -> { (s, dir) =>
      // streaming ingest into the sharded training layout: two micro-batches
      // (doc_id parity split) append into the same deterministic shard dirs;
      // the manifest over the read-back MUST equal the batch sink's manifest
      val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
      // unique per CALL (not just per JVM): a second run in the same JVM would
      // otherwise append into the first run's shard dirs and double the manifest
      val out = graft.util.Scratch.deleteOnExit(
        s"${System.getProperty("java.io.tmpdir")}/graft_stream_shards/" +
          s"${graft.util.Scratch.runToken}_${System.nanoTime()}") + "/documents"
      stagedStream(Seq(d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1)))(
        src => StreamOps.streamingShardedSink(s, src, "doc_id", 8, out, "shard1")
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextOps.tokenCount(col("text"))).as("n_tokens")))
        .orderBy("shard")
    },
    "stream_dedup" -> { (s, dir) =>
      // streaming exact dedup across micro-batches: batch 1 = the documents, batch 2 =
      // planted exact copies (doc_id%7) — every copy must be dropped by the stateful
      // dropDuplicates even though it arrives in a later batch
      val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
      val copies = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("lang"))
      stagedStream(Seq(d, copies))(
        src => StreamOps.streamingExactDedup(s, src)).orderBy("lang")
    },
    "stream_dedup_watermark" -> { (s, dir) =>
      // bounded-state streaming dedup: batch 1 = the events (ts as long nanos),
      // batch 2 = exact re-emits of user_id%5 events — dropDuplicatesWithinWatermark
      // must drop every re-emit from state (delay covers the whole ts range)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = s.read.parquet(s"$dir/events.parquet") // ts as long nanos
      stagedStream(Seq(raw, raw.filter(col("user_id") % 5 === 0)))(
        src => StreamOps.streamingDedupWithinWatermark(s, src))
        .groupBy("event_type").agg(count(lit(1)).as("n_unique"))
        .orderBy("event_type")
    },
    "stream_simhash_dedup" -> { (s, dir) =>
      // streaming NEAR-dup dedup: batch 2 plants exact copies (same token set ⇒ same
      // simhash64) — the (lang, signature) state must drop them across batches
      val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
      val copies = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"), col("lang"))
      stagedStream(Seq(d, copies))(
        src => StreamOps.streamingSimhashDedup(s, src)).orderBy("lang")
    },
    "stream_sharded_sink_versioned" -> { (s, dir) =>
      // exactly-once sink: every micro-batch owns a batch=<id> partition it can
      // overwrite on replay; the manifest must STILL equal the batch sink's
      val d = docs(s, dir).select(col("doc_id"), col("text"), col("lang"))
      val out = graft.util.Scratch.deleteOnExit(
        s"${System.getProperty("java.io.tmpdir")}/graft_stream_shards_v/" +
          s"${graft.util.Scratch.runToken}_${System.nanoTime()}") + "/documents"
      stagedStream(Seq(d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1)))(
        src => StreamOps.streamingShardedSinkVersioned(s, src, "doc_id", 8, out, "shard1")
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum(TextOps.tokenCount(col("text"))).as("n_tokens")))
        .orderBy("shard")
    },
    "stream_minhash_dedup" -> { (s, dir) =>
      // ingest-time minhash near-dup detection against the growing persistent band
      // index: batch 1 = exact copies, batch 2 = near-copies; the union of
      // per-batch outputs must equal the batch-mode incremental run (same oracle)
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val b1 = d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val b2 = d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" xtradup token")).as("text"))
      stagedStream(Seq(b1, b2))(src =>
          StreamOps.streamingMinhashDedup(s, d, src, "doc_id", "text", 0.5))
        .select(col("id_l"), col("id_r"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_l", "id_r")
    },
    "stream_quality_filter" -> { (s, dir) =>
      // the curation expressions on the streaming code path: stateless score+filter,
      // then a tiny keyed aggregate
      StreamOps.streamingQualityFilter(s, s"$dir/documents.parquet")
        .orderBy("pred_lang")
    },
    "stream_dsir_gate" -> { (s, dir) =>
      // data selection at ingest time: the DSIR log-ratio table trains once on the
      // static corpus (bounded k-row map), then gates the stream with a row-local
      // map-probe expression — no join, no per-doc shuffle on the streaming path
      val raw = s.read.parquet(s"$dir/documents.parquet")
      val lr = Curation.dsirLogRatios(raw, raw.filter(col("lang") === "en"), "text")
      StreamOps.streamingDsirGate(s, s"$dir/documents.parquet", lr, 256, 0.0)
        .orderBy("lang")
    },
    "ev_interval_join" -> { (s, dir) =>
      // point-in-interval join via time binning + hash equi-join (never a range
      // nested loop): every 199th event opens a 10-minute incident window; count
      // and sum the events that fall inside each window
      val ev = events(s, dir)
      val incidents = ev.filter(col("event_id") % 199 === 0)
        .select(col("event_id").as("incident_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 10 MINUTES")).as("w_end"))
      graft.events.IntervalJoin.pointInInterval(
          ev.select(col("event_id"), col("ts"), col("value")),
          incidents, "ts", "w_start", "w_end", binWidthSeconds = 600)
        .groupBy("incident_id")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("value_sum"))
        .orderBy("incident_id")
    },
    "ev_asof_join" -> { (s, dir) =>
      // point-in-time join: each view event gets the user's latest purchase at or
      // before it (leakage-safe) — one union + window pass, never a range join
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value"))
      graft.events.AsofJoin.leftAsof(views, purchases, "user_id", "ts",
          Seq("purchase_id", "value"), rightTie = "purchase_id")
        .select(col("event_id"), col("user_id"), col("purchase_id_asof"),
          round(col("value_asof"), 6).as("value_asof"))
        .orderBy("event_id")
    },
    "ev_asof_forward" -> { (s, dir) =>
      // label attachment: each view gets the user's NEXT purchase at or after it —
      // the forward (future-looking) as-of, same union + window pass
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_id"), col("value"))
      graft.events.AsofJoin.leftAsofForward(views, purchases, "user_id", "ts",
          Seq("purchase_id", "value"), rightTie = "purchase_id")
        .select(col("event_id"), col("user_id"), col("purchase_id_asof"),
          round(col("value_asof"), 6).as("value_asof"))
        .orderBy("event_id")
    },
    "ev_sessionize" -> { (s, dir) =>
      // event-log sessionization (30-minute gap): per user, session and event counts
      // plus the largest session — one window pass, shuffled once on user_id
      val sessions = graft.events.Sessionize.assign(
        events(s, dir), col("user_id"), col("ts"), gapSeconds = 1800L)
      sessions.groupBy("user_id", "session_index")
        .agg(count(lit(1)).as("n"))
        .groupBy("user_id")
        .agg(sum("n").as("n_events"), count(lit(1)).as("n_sessions"),
          max("n").as("max_session_events"))
        .orderBy("user_id")
    },
    "curation_leakage_safe_split" -> { (s, dir) =>
      // leakage-safe train/val split: near-duplicate documents must land in the SAME
      // split, so the deterministic draw is keyed on the near-dup CLUSTER id, not the
      // doc id — the recipe behind honest eval sets (dedup → CC → split by cluster)
      // shared spread+persisted corpus for the signature, verify and attach legs
      // (the ep12 pattern, r12); per-row deterministic values → layout-proof
      import graft.util.Caching.CacheSyntax
      val corpus = spread(plantedCorpus(s, dir)).scopedPersist()
      val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5)
      val clustered = Dedup.deduplicate(corpus, "doc_id", pairs)
      graft.textops.Curation.assignSplit(
          clustered.select(col("doc_id"), col("cluster_id")),
          col("cluster_id"), 0.8, "lsplit")
        .orderBy("doc_id")
    },
    "ep4_training_corpus" -> { (s, dir) =>
      // the full training-data pipeline, one plan, fully oracle-checked:
      // score → filter → accent/case-fold dedup (keeper = min id) → Bloom
      // decontamination vs benchmark → vocab build+encode → sharded manifest
      // spread before the quality/langid projection (the ep3 pattern — heavy
      // per-row scan work, layout-proof aggregates downstream)
      val corpus = plantedCorpus(s, dir).filter(col("doc_id") % 13 =!= 0)
        .repartition(s.sparkContext.defaultParallelism)
      val bench = docs(s, dir).filter(col("doc_id") % 13 === 0)
      val kept = corpus.select(col("doc_id"), col("text"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          round(TextOps.qualityScore(col("text")), 6).as("quality"),
          TextOps.langId(col("text")).as("pred_lang"))
        .filter(col("pred_lang") =!= "und" && col("n_tokens") >= 5 &&
          col("quality") >= 0.3)
      val deduped = kept
        .groupBy(md5(TextOps.foldText(col("text"))).as("fold_key"))
        .agg(min(struct(col("doc_id"), col("text"), col("n_tokens"))).as("k"))
        .select(col("k.doc_id").as("doc_id"), col("k.text").as("text"),
          col("k.n_tokens").as("n_tokens"))
        .scopedPersist() // feeds the bloom probe AND the decontamination anti-join
      val clean = graft.textops.Curation.bloomDecontaminate(
          deduped, bench, "doc_id", "text", 3)
        .scopedPersist() // feeds vocab build, encoding, and the manifest join
      val vocab = graft.textops.Curation.buildVocab(clean, col("text"), 50)
      val oov = graft.textops.Curation.encodeTokens(clean, "doc_id", "text", vocab)
        .select(col("doc_id"),
          size(filter(col("token_ids"), _ === 0)).cast("long").as("n_oov"))
      clean.join(oov, "doc_id")
        .withColumn("shard", graft.textops.Curation.shardId(col("doc_id"), 4, "ep4"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          sum("n_oov").as("n_oov"))
        .orderBy("shard")
    },
    "ep2_corpus_curation" -> { (s, dir) =>
      // the LLM-pipeline composition end-to-end: score (quality, langid, tokens) →
      // filter → exact-dedup → keeper corpus, fully DuckDB-oracle-checked
      val scored = plantedCorpus(s, dir).select(col("doc_id"), col("text"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        round(TextOps.qualityScore(col("text")), 6).as("quality"),
        TextOps.langId(col("text")).as("pred_lang"))
      scored
        .filter(col("pred_lang") =!= "und" && col("n_tokens") >= 5 && col("quality") >= 0.3)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"),
          min(col("quality")).as("quality"), count(lit(1)).as("n_copies"))
        .select("doc_id", "n_tokens", "quality", "n_copies")
        .orderBy("doc_id")
    })

  // ---- oracle SQL ----------------------------------------------------------

  /** Winnowing CTEs `h` (rolling k-gram hashes) and `m` (window minima) over
    * `source(doc_id, text)` — identical arithmetic to
    * [[graft.expressions.RollingFingerprints]]: per-position polynomial hash (sum of
    * code·131^j fits BIGINT before the mod), sliding-window list_min.
    */
  private def winnowCtes(source: String): String = {
    val k = 8
    val w = 4
    val pows = Seq(662062621900811L, 5053913144281L, 38579489651L, 294499921L,
      2248091L, 17161L, 131L, 1L)
    val terms = pows.zipWithIndex
      .map { case (p, j) => s"ascii(substr(text, (i + $j)::INT, 1))::BIGINT * $p" }
      .mkString(" + ")
    s"""h AS (
       |  SELECT doc_id,
       |    list_transform(range(1, length(text) - $k + 2), i -> ($terms) % 1000000007)
       |      AS hs
       |  FROM $source
       |), m AS (
       |  SELECT doc_id,
       |    CASE WHEN len(hs) = 0 THEN []
       |         WHEN len(hs) < $w THEN [list_min(hs)]
       |         ELSE list_transform(range(1, len(hs) - $w + 2),
       |                             j -> list_min(hs[j:(j + $w - 1)::INT]))
       |    END AS mins
       |  FROM h
       |)""".stripMargin
  }

  private[queries] def toksSql(textExpr: String) =
    s"list_filter(string_split_regex(trim($textExpr), '\\s+'), t -> length(t) > 0)"

  private[queries] def inList(words: Seq[String]) = words.map(w => s"'$w'").mkString("(", ", ", ")")

  private val stopList = inList(TextOps.EnglishStopwords)

  /** DuckDB quality-score expression over a `text` column (round-6, matches
    * [[TextOps.qualityScore]] term for term).
    */
  private[queries] val qualityExprSql = {
    val toks = toksSql("text")
    s"""ROUND(0.4 * LEAST(1.0, len($toks)::DOUBLE / 100.0)
       |      + 0.3 * (1.0 - CASE WHEN length(text) = 0 THEN 0.0
       |          ELSE length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length(text) END)
       |      + 0.3 * CASE WHEN len($toks) = 0 THEN 0.0
       |          ELSE len(list_filter($toks, t -> t IN $stopList))::DOUBLE / len($toks) END, 6)""".stripMargin
  }

  private[queries] val langScoresSql = {
    val toks = toksSql("text")
    TextOps.LangMarkers.map { case (lang, ms) =>
      s"len(list_filter($toks, t -> t IN ${inList(ms)})) AS s_$lang"
    }.mkString(", ")
  }
  private[queries] val langMaxSql =
    s"GREATEST(${TextOps.LangMarkers.map(l => s"s_${l._1}").mkString(", ")})"
  private[queries] val langCaseSql =
    "CASE " + TextOps.LangMarkers.map(l => s"WHEN s_${l._1} = mx AND mx > 0 THEN '${l._1}'")
      .mkString(" ") + " ELSE 'und' END"

  private val qualitySql = {
    val toks = toksSql("text")
    s"""SELECT doc_id, length(text) AS len_chars, len($toks) AS n_tokens,
       |  ROUND(CASE WHEN length(text) = 0 THEN 0.0
       |    ELSE length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE / length(text) END, 6) AS punct_ratio,
       |  ROUND(CASE WHEN len($toks) = 0 THEN 0.0
       |    ELSE len(list_filter($toks, t -> t IN $stopList))::DOUBLE / len($toks) END, 6) AS stop_ratio,
       |  $qualityExprSql AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  private val langidSql =
    s"""WITH sc AS (SELECT doc_id, $langScoresSql FROM documents),
       |m AS (SELECT *, $langMaxSql AS mx FROM sc)
       |SELECT doc_id, $langCaseSql AS pred_lang
       |FROM m ORDER BY doc_id""".stripMargin

  private def jaccardPairSql(setExpr: String, threshold: Double, extraCte: String) =
    s"""WITH $extraCte,
       |prep AS (SELECT doc_id AS id, $setExpr AS toks, lang AS blk0,
       |                FLOOR(n_chars / 25) AS blk1 FROM corpus)
       |SELECT l.id AS id_l, r.id AS id_r,
       |  ROUND(CASE WHEN len(list_distinct(list_concat(l.toks, r.toks))) = 0 THEN 0.0
       |    ELSE len(list_intersect(l.toks, r.toks))::DOUBLE /
       |         len(list_distinct(list_concat(l.toks, r.toks))) END, 6) AS jaccard
       |FROM prep l JOIN prep r ON l.blk0 = r.blk0 AND l.blk1 = r.blk1 AND l.id < r.id
       |WHERE CASE WHEN len(list_distinct(list_concat(l.toks, r.toks))) = 0 THEN 0.0
       |    ELSE len(list_intersect(l.toks, r.toks))::DOUBLE /
       |         len(list_distinct(list_concat(l.toks, r.toks))) END >= $threshold
       |ORDER BY id_l, id_r""".stripMargin

  private[queries] def shinglesSql(textExpr: String) = shinglesSqlN(textExpr, 3)

  /** Okapi BM25 oracle over an arbitrary corpus CTE — shared by the document-level
    * and passage-level retrieval oracles so the scoring SQL cannot drift between
    * them. `pre` must define `bmcorpus(bid, btext)`; `idSelect` renders the output
    * id column(s) from `bid` (rank already tie-breaks on `bid`, so ordering by
    * (query_id, rank) is total).
    * Constants mirror [[graft.textops.Similarity.bm25TopK]] defaults
    * (k1 = 1.2, b = 0.75 → k1+1 = 2.2, 1−b = 0.25).
    */
  /** The BM25 CTE chain up to the ranked table `rk` — shared by the standalone
    * retrieval oracles and the hybrid-fusion oracle. `qcte` supplies the query
    * table `q(query_id, qtext)` (defaults to the BM25Queries fixture).
    */
  private def bm25Ctes(pre: String, qcte: Option[String] = None): String = {
    val qvals = BM25Queries.map { case (qid, qt) => s"($qid, '$qt')" }.mkString(", ")
    val q = qcte.getOrElse(s"q(query_id, qtext) AS (VALUES $qvals)")
    s"""$pre,
       |t AS (SELECT bid, unnest(${toksSql("btext")}) AS token FROM bmcorpus),
       |tf AS (SELECT bid, token, COUNT(*) AS tf FROM t GROUP BY 1, 2),
       |dl AS (SELECT bid, SUM(tf) AS dl FROM tf GROUP BY 1),
       |dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
       |st AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
       |$q,
       |qt AS (SELECT query_id, unnest(list_distinct(${toksSql("qtext")})) AS token FROM q),
       |qi AS (SELECT query_id, qt.token,
       |         LN(1.0 + (st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5)) AS idf
       |       FROM qt JOIN dfq USING (token) CROSS JOIN st),
       |co AS (SELECT qi.query_id, tf.bid,
       |         ROUND(qi.idf * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)), 6) AS c
       |       FROM tf JOIN qi USING (token) JOIN dl USING (bid) CROSS JOIN st),
       |sc AS (SELECT query_id, bid, ROUND(SUM(c), 6) AS bm25, COUNT(*) AS n_terms
       |       FROM co GROUP BY 1, 2),
       |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |         ORDER BY bm25 DESC, bid) AS INT) AS rank FROM sc)""".stripMargin
  }

  private def bm25Sql(pre: String, k: Int, idSelect: String): String =
    s"""WITH ${bm25Ctes(pre)}
       |SELECT query_id, rank, $idSelect, bm25, n_terms FROM rk
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** `shinglesSql` for arbitrary n — one rendered expression per call site. */
  private[queries] def shinglesSqlN(textExpr: String, n: Int) = {
    val w = toksSql(textExpr)
    val terms = (0 until n)
      .map(j => if (j == 0) s"$w[i]" else s"$w[i+$j]").mkString(" || ' ' || ")
    s"(CASE WHEN len($w) < $n THEN [] ELSE list_transform(range(1, len($w) - ${n - 2}), i -> $terms) END)"
  }

  /** DuckDB replay of [[graft.expressions.Md5PrefixLong]]: first 16 hex chars of the
    * md5 as a SIGNED big-endian 64-bit value — the unsigned parse wrapped into two's
    * complement explicitly, because a plain `::BIGINT` cast range-errors on digests
    * with the high bit set.
    */
  private def md5PrefixLongSql(e: String): String = {
    val u = s"('0x' || substr(md5($e), 1, 16))::UBIGINT"
    s"(CASE WHEN $u >= 9223372036854775808::UBIGINT " +
      s"THEN ($u - 9223372036854775808::UBIGINT)::BIGINT - 9223372036854775807 - 1 " +
      s"ELSE $u::BIGINT END)"
  }

  /** CTE chain `t → shp → hh → mark → spans` replaying [[Dedup.substringSpans]] over
    * `corpus(doc_id, text)`: positional k-gram shingles, md5-prefix hash counts,
    * duplicated-position marking, per-doc interval merge (same gap-≤-k rule).
    */
  private def substringSpanCtes(k: Int): String = {
    val toks = toksSql("text")
    s"""t AS (SELECT doc_id AS id, $toks AS toks FROM corpus),
       |shp AS (
       |  SELECT id, u.pos AS pos, u.sh AS sh FROM (
       |    SELECT id, unnest(CASE WHEN len(toks) < $k THEN []
       |      ELSE list_transform(range(1, len(toks) - $k + 2),
       |        i -> struct_pack(pos := i - 1,
       |               sh := array_to_string(toks[i:(i + $k - 1)::INT], ' '))) END) AS u
       |    FROM t) s
       |),
       |hh AS (SELECT id, pos, ${md5PrefixLongSql("sh")} AS h FROM shp),
       |mark AS (SELECT id, pos FROM hh
       |         WHERE h IN (SELECT h FROM hh GROUP BY h HAVING COUNT(*) >= 2)),
       |brk AS (SELECT id, pos,
       |          CASE WHEN pos - lag(pos) OVER (PARTITION BY id ORDER BY pos) <= $k
       |               THEN 0 ELSE 1 END AS b
       |        FROM mark),
       |sp AS (SELECT id, pos, SUM(b) OVER (PARTITION BY id ORDER BY pos) AS sid FROM brk),
       |spans AS (SELECT id, MIN(pos) AS span_start, MAX(pos) + $k - 1 AS span_end,
       |            MAX(pos) + $k - MIN(pos) AS span_tokens
       |          FROM sp GROUP BY id, sid)""".stripMargin
  }

  /** CTE chain ending in `mh_pairs(id_l, id_r)` — the MinHash-LSH near-dup pairs at
    * jaccard ≥ 0.5 over the planted corpus; shared by the pair query and the
    * dedup-apply closure oracle.
    */
  private val minhashPairsCtes = {
    val k = 8
    val mins = (0 until k).map(j => s"min(md5('$j:' || s)) AS mh$j").mkString(", ")
    val bands = (0 until 4).map(b =>
      s"SELECT id, $b AS band, mh${2 * b} || mh${2 * b + 1} AS key FROM sig").mkString(" UNION ALL ")
    s"""$corpusCte,
       |prep AS (SELECT doc_id AS id, list_distinct(${shinglesSql("text")}) AS toks FROM corpus),
       |sh AS (SELECT id, unnest(toks) AS s FROM prep),
       |sig AS (SELECT id, $mins FROM sh GROUP BY id),
       |bands AS ($bands),
       |cand AS (SELECT DISTINCT l.id AS id_l, r.id AS id_r
       |         FROM bands l JOIN bands r
       |           ON l.band = r.band AND l.key = r.key AND l.id < r.id),
       |mh_pairs AS (
       |  SELECT c.id_l, c.id_r,
       |    len(list_intersect(a.toks, b.toks))::DOUBLE /
       |    len(list_distinct(list_concat(a.toks, b.toks))) AS jac
       |  FROM cand c JOIN prep a ON c.id_l = a.id JOIN prep b ON c.id_r = b.id
       |  WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
       |        len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5)""".stripMargin
  }

  private val minhashSql =
    s"""WITH $minhashPairsCtes
       |SELECT id_l, id_r, ROUND(jac, 6) AS jaccard
       |FROM mh_pairs ORDER BY id_l, id_r""".stripMargin

  /** dedup-apply oracle: transitive closure of the MinHash pairs by recursive
    * min-label propagation; cluster ids are LEXICOGRAPHIC string minima (the CC
    * implementation orders string node ids), keeper = the representative.
    */
  private val dedupApplySql =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT id_l::VARCHAR AS src, id_r::VARCHAR AS dst FROM mh_pairs
       |  UNION ALL
       |  SELECT id_r::VARCHAR, id_l::VARCHAR FROM mh_pairs),
       |reach(node, root) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
       |clusters AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node)
       |SELECT c.doc_id,
       |  COALESCE(cl.cluster_id, c.doc_id::VARCHAR) AS cluster_id,
       |  COALESCE(cl.cluster_id, c.doc_id::VARCHAR) = c.doc_id::VARCHAR AS is_keeper
       |FROM corpus c LEFT JOIN clusters cl ON c.doc_id::VARCHAR = cl.node
       |ORDER BY c.doc_id""".stripMargin

  /** dedup-apply-best oracle: the same recursive closure, then one argmax per
    * cluster on the round-6 quality score (ties → smallest doc_id).
    */
  private val dedupApplyBestSql =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT id_l::VARCHAR AS src, id_r::VARCHAR AS dst FROM mh_pairs
       |  UNION ALL
       |  SELECT id_r::VARCHAR, id_l::VARCHAR FROM mh_pairs),
       |reach(node, root) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
       |clusters AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
       |asg AS (SELECT c.doc_id,
       |          COALESCE(cl.cluster_id, c.doc_id::VARCHAR) AS cluster_id,
       |          $qualityExprSql AS q
       |        FROM corpus c LEFT JOIN clusters cl ON c.doc_id::VARCHAR = cl.node),
       |k AS (SELECT cluster_id, doc_id AS keeper_id FROM (
       |        SELECT cluster_id, doc_id,
       |          ROW_NUMBER() OVER (PARTITION BY cluster_id
       |                             ORDER BY q DESC, doc_id) AS rn
       |        FROM asg) WHERE rn = 1)
       |SELECT a.doc_id, a.cluster_id, k.keeper_id,
       |  a.doc_id = k.keeper_id AS is_keeper
       |FROM asg a JOIN k USING (cluster_id)
       |ORDER BY a.doc_id""".stripMargin

  private val leakageSafeSplitSql =
    s"""WITH RECURSIVE $minhashPairsCtes,
       |edges AS (
       |  SELECT id_l::VARCHAR AS src, id_r::VARCHAR AS dst FROM mh_pairs
       |  UNION ALL
       |  SELECT id_r::VARCHAR, id_l::VARCHAR FROM mh_pairs),
       |reach(node, root) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
       |clusters AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
       |asg AS (SELECT c.doc_id,
       |          COALESCE(cl.cluster_id, c.doc_id::VARCHAR) AS cluster_id
       |        FROM corpus c LEFT JOIN clusters cl ON c.doc_id::VARCHAR = cl.node)
       |SELECT doc_id, cluster_id,
       |  CASE WHEN substr(md5('lsplit:' || cluster_id), 1, 8)
       |         < '${graft.textops.Curation.rateThreshold(0.8)}'
       |       THEN 'train' ELSE 'val' END AS split
       |FROM asg ORDER BY doc_id""".stripMargin

  private val simhashSql = {
    val nibs = (0 until 4).map(j =>
      s"strpos('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1 AS n$j").mkString(", ")
    val sums = (0 until 16).map { p =>
      s"SUM(CASE WHEN (n${p / 4} >> ${p % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS s$p"
    }.mkString(", ")
    val sig = (0 until 16).map(p =>
      s"(CASE WHEN s$p >= 0 THEN ${1 << p} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_distinct(${toksSql("text")})) AS t FROM documents
       |), h AS (SELECT doc_id, md5(t) AS h FROM tok),
       |nib AS (SELECT doc_id, $nibs FROM h),
       |sums AS (SELECT doc_id, $sums FROM nib GROUP BY doc_id)
       |SELECT doc_id, $sig AS simhash FROM sums ORDER BY doc_id""".stripMargin
  }

  /** Full DuckDB replay of [[Similarity.lshTopK]] at the default parameters: the
    * 16×5 hyperplanes are SEED-deterministic (`randomPlanes(5, 64, 42 + t)` per
    * table), so the oracle regenerates the exact same doubles and renders them as
    * literals — signature bits (`dot > 0`, bit `p % 5` of sig `p / 5`), any-table
    * bucket match, exact cosine re-rank with ROUND 6 and id tie-break, all mirror
    * the Spark plan. Embedding dim is pinned at 64 by the testdata (all SFs); the
    * schema canary in SourcesSpec guards the assumption.
    */
  private val annLshSql: String = {
    val (nTables, planesPerTable, dim, seed) = (16, 5, 64, 42L)
    def d(x: Double): String = graft.util.Render.sqlDouble(x)
    val planeRows = (0 until nTables).flatMap { t =>
      Similarity.randomPlanes(planesPerTable, dim, seed + t).zipWithIndex.map {
        case (p, j) => s"($t, $j, [${p.map(d).mkString(",")}]::DOUBLE[])"
      }
    }.mkString(",\n    ")
    s"""WITH planes AS (
       |  SELECT * FROM (VALUES
       |    $planeRows) AS p(tbl, bit, plane)
       |), e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings
       |), n AS (
       |  SELECT vec_id,
       |    list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
       |  FROM e
       |), sig AS (
       |  SELECT vec_id, tbl,
       |    SUM(CASE WHEN list_inner_product(v, plane) > 0 THEN 1 << bit ELSE 0 END) AS s
       |  FROM n CROSS JOIN planes GROUP BY vec_id, tbl
       |), q AS (
       |  SELECT vec_id AS query_id, tbl, s FROM sig WHERE vec_id < 10
       |), cand AS (
       |  SELECT DISTINCT c.vec_id AS id, q.query_id
       |  FROM sig c JOIN q ON c.tbl = q.tbl AND c.s = q.s
       |  WHERE c.vec_id <> q.query_id
       |), scored AS (
       |  SELECT cand.query_id, cand.id,
       |    ROUND(list_inner_product(cv.v, qv.v), 6) AS cosine
       |  FROM cand JOIN n cv ON cv.vec_id = cand.id
       |            JOIN n qv ON qv.vec_id = cand.query_id
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, id, cosine FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Full DuckDB replay of [[Ivf.fit]] + [[Ivf.topK]] at the query's parameters
    * (k=16, iters=2, seed=42, nprobe=4, top-5). Training is deterministic end to
    * end: seed centroids are the 16 rows with smallest `md5(id:42)` (cell id =
    * hash rank), then two Lloyd rounds of (argmax-dot assign, tie → lowest cell;
    * per-dimension mean, re-normalized; empty cells keep their previous centroid).
    * Serving probes each query's 4 closest final centroids and re-ranks candidates
    * by exact cosine (ROUND 6, id tie-break). Mean/normalize FP drift between
    * engines is ~1e-16 relative — an assignment could only flip if two centroid
    * dots tie within that, and the final ROUND(…,6) absorbs everything else.
    */
  /** Shared WITH-body: IVF training (md5-rank seeding, 2 Lloyd rounds) ending in
    * final centroids `c2`, the cell-assigned `corpus`, and per-query `probes`
    * (nprobe=4 closest cells, queries = vec_id < 10). Both the IVF and IVF-PQ
    * oracles open with this chain.
    *
    * REPLAY BOUND: `Ivf.fit`/`Pq.fit` train on a seeded Bernoulli SAMPLE once the
    * corpus exceeds 2·trainSampleRows (400k rows) — Spark's sampler is not
    * replayable in SQL, so these full-training oracles are valid only below that
    * bound. Driver-checked SFs hold ≤ 2k embedding rows (SourcesSpec pins the
    * table's shape); if the testdata ever grows past the bound, these three
    * queries must switch to rows-only with a recall pin, not keep a silently
    * diverging oracle.
    */
  /** One DuckDB Lloyd round over a CTE `n(vec_id, v)`: assignment against `prev`
    * centroids (argmax dot, ties → lowest cell) → per-dim means → normalized next
    * centroids, empty cells carrying `prev` forward — the [[Ivf.fit]] iteration.
    */
  private def lloydRoundCtes(prev: String, a: String, m: String, next: String,
      src: String = "n"): String =
    s"""$a AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT $src.vec_id, $src.v, $prev.cell,
       |      ROW_NUMBER() OVER (PARTITION BY $src.vec_id
       |        ORDER BY list_inner_product($src.v, $prev.v) DESC, $prev.cell) AS rn
       |    FROM $src CROSS JOIN $prev) WHERE rn = 1
       |), $m AS (
       |  SELECT cell, list(m ORDER BY i) AS mv FROM (
       |    SELECT cell, i, AVG(x) AS m FROM (
       |      SELECT cell, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM $a)
       |    GROUP BY cell, i)
       |  GROUP BY cell
       |), $next AS (
       |  SELECT $prev.cell,
       |    COALESCE(
       |      list_transform($m.mv, x -> x / sqrt(list_inner_product($m.mv, $m.mv))),
       |      $prev.v) AS v
       |  FROM $prev LEFT JOIN $m ON $prev.cell = $m.cell
       |)""".stripMargin

  /** md5-rank seed pick over `n(vec_id, v)` — cell id = hash rank, the portable
    * [[Ivf.fit]] seeding.
    */
  private def ivfSeedCtes(k: Int, seed: Long, src: String = "n"): String =
    s"""s0 AS (
       |  SELECT v, md5(CAST(vec_id AS VARCHAR) || ':' || '$seed') AS h FROM $src
       |), seed AS (
       |  SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS cell, v
       |  FROM (SELECT * FROM s0 ORDER BY h LIMIT $k)
       |)""".stripMargin

  private val ivfTrainCtes: String = {
    val (k, nprobe, seed) = (16, 4, 42L)
    s"""e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings
       |), n AS (
       |  SELECT vec_id,
       |    list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
       |  FROM e
       |), ${ivfSeedCtes(k, seed)},
       |${lloydRoundCtes("seed", "a1", "m1", "c1")},
       |${lloydRoundCtes("c1", "a2", "m2", "c2")},
       |corpus AS (
       |  SELECT vec_id AS id, v, cell FROM (
       |    SELECT n.vec_id, n.v, c2.cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(n.v, c2.v) DESC, c2.cell) AS rn
       |    FROM n CROSS JOIN c2) WHERE rn = 1
       |), probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT n.vec_id AS query_id, n.v AS qv, c2.cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(n.v, c2.v) DESC, c2.cell) AS rn
       |    FROM n CROSS JOIN c2 WHERE n.vec_id < 10) WHERE rn <= $nprobe
       |)""".stripMargin
  }

  /** Oracle for the grown index: training restricted to the base corpus (`ntrain`),
    * serving over everything — appending under a fixed model must equal this.
    */
  private val annIvfIncrementalSql: String = {
    val (k, nprobe, seed) = (16, 4, 42L)
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings
       |), n AS (
       |  SELECT vec_id,
       |    list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
       |  FROM e
       |), ntrain AS (
       |  SELECT * FROM n WHERE vec_id % 4 <> 3
       |), ${ivfSeedCtes(k, seed, src = "ntrain")},
       |${lloydRoundCtes("seed", "a1", "m1", "c1", src = "ntrain")},
       |${lloydRoundCtes("c1", "a2", "m2", "c2", src = "ntrain")},
       |corpus AS (
       |  SELECT vec_id AS id, v, cell FROM (
       |    SELECT n.vec_id, n.v, c2.cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(n.v, c2.v) DESC, c2.cell) AS rn
       |    FROM n CROSS JOIN c2) WHERE rn = 1
       |), probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT n.vec_id AS query_id, n.v AS qv, c2.cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(n.v, c2.v) DESC, c2.cell) AS rn
       |    FROM n CROSS JOIN c2 WHERE n.vec_id < 10) WHERE rn <= $nprobe
       |), scored AS (
       |  SELECT p.query_id, c.id,
       |    ROUND(list_inner_product(c.v, p.qv), 6) AS cosine
       |  FROM corpus c JOIN probes p ON c.cell = p.cell
       |  WHERE c.id <> p.query_id
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, id, cosine FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Full DuckDB replay of [[Ivf.fitScalable]] + serve (k=16, 3 k-means|| rounds,
    * oversample 2 → l=32, 2 Lloyd rounds, nprobe=4): candidate 0 = smallest-md5
    * row; each round draws rows with md5-fraction < l·d²/ΣD² against the current
    * candidate set; candidates are weighted by Voronoi population and reduced to
    * k by the deterministic weighted farthest-point chain (ties → lowest ordinal,
    * chosen order = cell id); then the shared Lloyd + probe + re-rank tail.
    */
  private val annIvfScalableSql: String = {
    val (k, nprobe, seed, rounds) = (16, 4, 42L, 3)
    val l = 2.0 * k
    val roundCtes = (1 to rounds).map { r =>
      s"""md$r AS (
         |  SELECT n.vec_id, MAX(list_inner_product(n.v, c.v)) AS mdot
         |  FROM n CROSS JOIN c${r - 1} c GROUP BY n.vec_id
         |), sd$r AS (SELECT SUM(GREATEST(0.0, 2.0 - 2.0 * mdot)) AS sd FROM md$r),
         |pick$r AS (
         |  SELECT $r AS rnd, CAST(n.vec_id AS VARCHAR) AS id, n.v
         |  FROM n JOIN md$r USING (vec_id) CROSS JOIN sd$r
         |  WHERE ('0x' || substr(md5(CAST(n.vec_id AS VARCHAR) || ':$seed:$r'), 1, 8))::UBIGINT
         |      / 4294967296.0
         |    < $l * GREATEST(0.0, 2.0 - 2.0 * mdot) / sd$r.sd
         |), c$r AS MATERIALIZED (
         |  SELECT * FROM c${r - 1} UNION ALL
         |  SELECT p.rnd, p.id, p.v FROM pick$r p
         |  WHERE p.id NOT IN (SELECT id FROM c${r - 1}))""".stripMargin
    }.mkString(",\n")
    val fp = (1 until k).map { t =>
      s"""fsc$t AS (
         |  SELECT c.ci,
         |    c.w * MIN(GREATEST(0.0, 2.0 - 2.0 * list_inner_product(c.v, h.v))) AS score
         |  FROM cw c CROSS JOIN fch${t - 1} h
         |  WHERE c.ci NOT IN (SELECT ci FROM fch${t - 1})
         |  GROUP BY c.ci, c.w
         |), fpk$t AS (SELECT ci FROM fsc$t ORDER BY score DESC, ci LIMIT 1),
         |fch$t AS MATERIALIZED (
         |  SELECT * FROM fch${t - 1} UNION ALL
         |  SELECT cw.ci, cw.v, $t AS ord FROM cw JOIN fpk$t USING (ci))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings
       |), n AS (
       |  SELECT vec_id,
       |    list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
       |  FROM e
       |), c0 AS (
       |  SELECT 0 AS rnd, CAST(vec_id AS VARCHAR) AS id, v
       |  FROM (SELECT * FROM n ORDER BY md5(CAST(vec_id AS VARCHAR) || ':$seed') LIMIT 1)
       |),
       |$roundCtes,
       |candi AS MATERIALIZED (
       |  SELECT ROW_NUMBER() OVER (ORDER BY rnd, id) - 1 AS ci, v FROM c$rounds),
       |wa AS (
       |  SELECT ci, COUNT(*)::DOUBLE AS w FROM (
       |    SELECT vec_id, ci FROM (
       |      SELECT n.vec_id, candi.ci,
       |        ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |          ORDER BY list_inner_product(n.v, candi.v) DESC, candi.ci) AS rn
       |      FROM n CROSS JOIN candi) WHERE rn = 1)
       |  GROUP BY ci),
       |cw AS MATERIALIZED (
       |  SELECT candi.ci, candi.v, COALESCE(wa.w, 0.0) AS w
       |  FROM candi LEFT JOIN wa USING (ci)),
       |fch0 AS MATERIALIZED (
       |  SELECT ci, v, 0 AS ord FROM (SELECT * FROM cw ORDER BY w DESC, ci LIMIT 1)),
       |$fp,
       |seedk AS MATERIALIZED (SELECT ord AS cell, v FROM fch${k - 1}),
       |${lloydRoundCtes("seedk", "la1", "lm1", "lc1")},
       |${lloydRoundCtes("lc1", "la2", "lm2", "lc2")},
       |corpus AS (
       |  SELECT vec_id AS id, v, cell FROM (
       |    SELECT n.vec_id, n.v, lc2.cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(n.v, lc2.v) DESC, lc2.cell) AS rn
       |    FROM n CROSS JOIN lc2) WHERE rn = 1
       |), probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT n.vec_id AS query_id, n.v AS qv, lc2.cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(n.v, lc2.v) DESC, lc2.cell) AS rn
       |    FROM n CROSS JOIN lc2 WHERE n.vec_id < 10) WHERE rn <= $nprobe
       |), scored AS (
       |  SELECT p.query_id, c.id,
       |    ROUND(list_inner_product(c.v, p.qv), 6) AS cosine
       |  FROM corpus c JOIN probes p ON c.cell = p.cell
       |  WHERE c.id <> p.query_id
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, id, cosine FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  private val annIvfSql: String =
    s"""WITH $ivfTrainCtes,
       |scored AS (
       |  SELECT p.query_id, c.id,
       |    ROUND(list_inner_product(c.v, p.qv), 6) AS cosine
       |  FROM corpus c JOIN probes p ON c.cell = p.cell
       |  WHERE c.id <> p.query_id
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, id, cosine FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** Full DuckDB replay of IVF-PQ ([[Pq.fit]] + [[Pq.topK]] defaults: m=8 subspaces
    * of 8 dims, ksub=16 codes, 3 Lloyd rounds, nprobe=4, refine·k=80). On top of the
    * shared IVF chain: PQ seeds are the SAME md5-rank rows (both fits use seed=42),
    * codebook 0 = their subspace slices; each round re-encodes (argmin L2 via the
    * `dot − ½‖c‖²` score, strict ties → lowest code) and recenters per (sub, code)
    * with empty cells carrying forward — NO re-normalization, matching the Scala
    * recenter. ADC scoring reconstructs each candidate (concat of its chosen
    * centroids, flat sequential dot ≡ the subspace-looped accumulate), shortlists 80
    * per query by (adc DESC, id), and re-ranks the shortlist by exact cosine.
    */
  private val annPqSql: String = {
    val (m, subDim, iters) = (8, 8, 3)
    def encode(cb: String, out: String): String =
      s"""$out AS (
         |  SELECT vec_id, sub, code FROM (
         |    SELECT n.vec_id, cb.sub, cb.code,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id, cb.sub
         |        ORDER BY list_inner_product(
         |            list_slice(n.v, cb.sub * $subDim + 1, cb.sub * $subDim + $subDim), cb.cv)
         |          - 0.5 * list_inner_product(cb.cv, cb.cv) DESC, cb.code) AS rn
         |    FROM n CROSS JOIN $cb cb) WHERE rn = 1
         |)""".stripMargin
    def recenter(enc: String, prev: String, mean: String, next: String): String =
      s"""$mean AS (
         |  SELECT sub, code, list(mm ORDER BY i) AS mv FROM (
         |    SELECT sub, code, i, AVG(x) AS mm FROM (
         |      SELECT enc.sub, enc.code,
         |        unnest(list_slice(n.v, enc.sub * $subDim + 1, enc.sub * $subDim + $subDim)) AS x,
         |        generate_subscripts(
         |          list_slice(n.v, enc.sub * $subDim + 1, enc.sub * $subDim + $subDim), 1) AS i
         |      FROM $enc enc JOIN n ON n.vec_id = enc.vec_id)
         |    GROUP BY sub, code, i)
         |  GROUP BY sub, code
         |), $next AS (
         |  SELECT p.sub, p.code, COALESCE(mn.mv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN $mean mn ON p.sub = mn.sub AND p.code = mn.code
         |)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"${encode(s"cb${r - 1}", s"enc$r")},\n${recenter(s"enc$r", s"cb${r - 1}", s"pm$r", s"cb$r")}"
    }.mkString(",\n")
    s"""WITH $ivfTrainCtes,
       |subs AS (SELECT * FROM range($m) AS t(sub)),
       |cb0 AS (
       |  SELECT subs.sub, seed.cell AS code,
       |    list_slice(seed.v, subs.sub * $subDim + 1, subs.sub * $subDim + $subDim) AS cv
       |  FROM seed CROSS JOIN subs
       |),
       |$rounds,
       |${encode(s"cb$iters", "encf")},
       |recon AS (
       |  SELECT vec_id, flatten(list(cv ORDER BY sub)) AS rv FROM (
       |    SELECT e2.vec_id, e2.sub, cb.cv
       |    FROM encf e2 JOIN cb$iters cb ON cb.sub = e2.sub AND cb.code = e2.code)
       |  GROUP BY vec_id
       |), adc AS (
       |  SELECT p.query_id, p.qv, c.id, c.v,
       |    list_inner_product(p.qv, r.rv) AS score
       |  FROM corpus c JOIN probes p ON c.cell = p.cell
       |                JOIN recon r ON r.vec_id = c.id
       |  WHERE c.id <> p.query_id
       |), short AS (
       |  SELECT query_id, qv, id, v FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS arank
       |    FROM adc) WHERE arank <= 80
       |), scored AS (
       |  SELECT query_id, id, ROUND(list_inner_product(v, qv), 6) AS cosine FROM short
       |), ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
       |  FROM scored
       |)
       |SELECT query_id, rank, id, cosine FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin
  }

  /** Full DuckDB replay of SemDeDup ([[Dedup.semanticPairs]] at k=16, iters=2,
    * seed=42, threshold 0.9) over the PLANTED embedding corpus: normalize, the
    * shared md5-seeded 2-round Lloyd fit, argmax-dot cell assignment, within-cell
    * `id_l < id_r` pairs, exact cosine ≥ 0.9 on the UNROUNDED dot (output rounds 6).
    */
  private val dedupSemanticSql: String = {
    val (k, seed) = (16, 42L)
    s"""WITH $embCorpusCte,
       |n AS (
       |  SELECT vec_id,
       |    list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS v
       |  FROM ecorpus
       |), ${ivfSeedCtes(k, seed)},
       |${lloydRoundCtes("seed", "a1", "m1", "c1")},
       |${lloydRoundCtes("c1", "a2", "m2", "c2")},
       |asn AS (
       |  SELECT vec_id, v, cell FROM (
       |    SELECT n.vec_id, n.v, c2.cell,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |        ORDER BY list_inner_product(n.v, c2.v) DESC, c2.cell) AS rn
       |    FROM n CROSS JOIN c2) WHERE rn = 1
       |)
       |SELECT l.vec_id AS id_l, r.vec_id AS id_r,
       |  ROUND(list_inner_product(l.v, r.v), 6) AS cosine
       |FROM asn l JOIN asn r ON l.cell = r.cell AND l.vec_id < r.vec_id
       |WHERE list_inner_product(l.v, r.v) >= 0.9
       |ORDER BY id_l, id_r""".stripMargin
  }

  /** GENERATED chained-CTE replay of the FULL greedy MMR selection — the exact
    * loop of [[graft.expressions.MmrSelect]] unrolled to its fixed `k`: pick 1 is
    * the rank-1 candidate (argmax λ·rel, input-order ties); every later pick s
    * maximizes λ·rel − (1−λ)·max(0, max cosine to the s−1 already-picked), raw
    * embeddings, ties to the lowest retrieval rank. Fixed k makes the sequential
    * greedy loop a closed form, the graph-kernel chain pattern.
    */
  private def mmrChainSql(k: Int): String = {
    val steps = (2 to k).map { i =>
      s"""pen$i AS (
         |  SELECT c.query_id, c.id, c.rank, c.rel,
         |    GREATEST(0, MAX(list_inner_product(ec.v0, ep.v0) /
         |      (sqrt(list_inner_product(ec.v0, ec.v0)) *
         |       sqrt(list_inner_product(ep.v0, ep.v0))))) AS mx
         |  FROM cand c
         |  JOIN pk${i - 1} p ON p.query_id = c.query_id
         |  LEFT JOIN pk${i - 1} x ON x.query_id = c.query_id AND x.id = c.id
         |  JOIN e ec ON ec.vec_id = c.id
         |  JOIN e ep ON ep.vec_id = p.id
         |  WHERE x.id IS NULL
         |  GROUP BY c.query_id, c.id, c.rank, c.rel),
         |s$i AS (SELECT query_id, id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id
         |           ORDER BY 0.7 * rel - (1 - 0.7) * mx DESC, rank) AS rn
         |       FROM pen$i),
         |p$i AS MATERIALIZED (SELECT query_id, id FROM s$i WHERE rn = 1),
         |pk$i AS MATERIALIZED (SELECT * FROM pk${i - 1}
         |       UNION ALL SELECT query_id, id FROM p$i)""".stripMargin
    }.mkString(",\n")
    val emit = (1 to k).map(i =>
      s"SELECT query_id, CAST($i AS INT) AS mmr_rank, id FROM p$i")
      .mkString("\nUNION ALL\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
       |n AS (SELECT vec_id,
       |        list_transform(v0, x -> x / sqrt(list_inner_product(v0, v0))) AS v
       |      FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM n WHERE vec_id % 101 = 0),
       |sc AS (SELECT q.query_id, n.vec_id AS id,
       |         ROUND(list_inner_product(n.v, q.qv), 6) AS rel
       |       FROM n, q WHERE n.vec_id <> q.query_id),
       |rk AS (SELECT query_id, id, rel,
       |         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, id) AS rank
       |       FROM sc),
       |cand AS MATERIALIZED (SELECT * FROM rk WHERE rank <= 30),
       |p1 AS (SELECT query_id, id FROM cand WHERE rank = 1),
       |pk1 AS MATERIALIZED (SELECT query_id, id FROM p1),
       |$steps
       |$emit
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** FULL gear-hash CDC dedup oracle — the "rolling-hash scans have no SQL
    * form" claim turned out to be beatable with two observations: (1) the
    * boundary test reads only the LOW avgBits=5 bits of h=(h<<1)+gear(b), so at
    * any tested position (chunk length >= minSize=8 > 5) the test value is a
    * pure 5-byte sliding window, independent of the chunk start — a window
    * function, not a scan; (2) the min/max-size boundary recurrence is an
    * iterated per-position jump f(p) = next-chunk-start, closed under BINARY
    * LIFTING (10 doublings cover 2^10 chunks >= the 284 max at sf0.01's 2.3 KB
    * payloads), so no recursive CTE is needed — which matters because DuckDB
    * 1.0.0 recursive terms race against upstream CTE materialization and
    * silently read them empty. Chunk FNV-1a hashes fold with list_reduce in
    * HUGEINT mod-2^64 arithmetic; gear/FNV constants replay via the same
    * portable-md5 seeding the Spark expression uses.
    */
  private val mmCdcDedupSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' xtradup token' FROM documents WHERE doc_id % 11 = 0
      |),
      |sel AS (SELECT doc_id, text FROM corpus
      |        WHERE (doc_id < 100000 AND doc_id % 11 = 0) OR doc_id >= 200000),
      |pay AS (SELECT doc_id, hex(CAST(repeat(text, 4) AS BLOB)) AS hx FROM sel),
      |blen AS MATERIALIZED (SELECT doc_id, length(hx) // 2 AS n FROM pay),
      |bytes AS MATERIALIZED (
      |  SELECT doc_id, t.i, ('0x' || substr(hx, (2 * t.i + 1)::INT, 2))::BIGINT AS b
      |  FROM pay, unnest(range(0, length(hx) // 2)) AS t(i)),
      |gear AS MATERIALIZED (
      |  SELECT b, ('0x' || substr(md5(b::VARCHAR), 1, 16))::UBIGINT::HUGEINT AS g
      |  FROM (SELECT unnest(range(0, 256)) AS b)),
      |gb AS MATERIALIZED (
      |  SELECT bytes.doc_id, bytes.i, bytes.b, (gear.g % 32)::BIGINT AS gl
      |  FROM bytes JOIN gear USING (b)),
      |hl AS MATERIALIZED (
      |  SELECT doc_id, i,
      |    (gl + 2 * LAG(gl, 1, 0) OVER w + 4 * LAG(gl, 2, 0) OVER w
      |        + 8 * LAG(gl, 3, 0) OVER w + 16 * LAG(gl, 4, 0) OVER w) % 32 AS h5
      |  FROM gb WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
      |nxtc AS MATERIALIZED (
      |  SELECT doc_id, i AS p,
      |    MIN(CASE WHEN h5 = 0 THEN i END) OVER
      |      (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc
      |  FROM hl),
      |jump0 AS MATERIALIZED (
      |  SELECT b.doc_id, b.i AS p,
      |    LEAST(COALESCE(x.nc, 9223372036854775807), b.i + 127, blen.n - 1) + 1 AS q
      |  FROM bytes b
      |  JOIN blen ON blen.doc_id = b.doc_id
      |  LEFT JOIN nxtc x ON x.doc_id = b.doc_id AND x.p = b.i + 7
      |  UNION ALL
      |  SELECT doc_id, n AS p, n AS q FROM blen),
      |jump1 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump0 a
      |  JOIN jump0 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump2 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump1 a
      |  JOIN jump1 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump3 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump2 a
      |  JOIN jump2 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump4 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump3 a
      |  JOIN jump3 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump5 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump4 a
      |  JOIN jump4 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump6 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump5 a
      |  JOIN jump5 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump7 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump6 a
      |  JOIN jump6 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump8 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump7 a
      |  JOIN jump7 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump9 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump8 a
      |  JOIN jump8 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |jump10 AS MATERIALIZED (
      |  SELECT a.doc_id, a.p, b.q FROM jump9 a
      |  JOIN jump9 b ON b.doc_id = a.doc_id AND b.p = a.q),
      |r0 AS (SELECT doc_id, 0::BIGINT AS p FROM blen),
      |r1 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r0
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r0 a
      |  JOIN jump0 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r2 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r1
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r1 a
      |  JOIN jump1 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r3 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r2
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r2 a
      |  JOIN jump2 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r4 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r3
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r3 a
      |  JOIN jump3 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r5 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r4
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r4 a
      |  JOIN jump4 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r6 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r5
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r5 a
      |  JOIN jump5 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r7 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r6
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r6 a
      |  JOIN jump6 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r8 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r7
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r7 a
      |  JOIN jump7 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r9 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r8
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r8 a
      |  JOIN jump8 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r10 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r9
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r9 a
      |  JOIN jump9 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |r11 AS MATERIALIZED (
      |  SELECT doc_id, p FROM r10
      |  UNION
      |  SELECT a.doc_id, j.q AS p FROM r10 a
      |  JOIN jump10 j ON j.doc_id = a.doc_id AND j.p = a.p),
      |chk AS (
      |  SELECT s.doc_id, s.p AS cs, j.q - 1 AS ce
      |  FROM r11 s JOIN blen ON blen.doc_id = s.doc_id
      |  JOIN jump0 j ON j.doc_id = s.doc_id AND j.p = s.p
      |  WHERE s.p < blen.n),
      |bl AS MATERIALIZED (SELECT doc_id, list(b::HUGEINT ORDER BY i) AS bs FROM bytes GROUP BY doc_id),
      |ch AS (
      |  SELECT c.doc_id,
      |    list_reduce(list_prepend(14695981039346656037::UBIGINT::HUGEINT,
      |                list_slice(bl.bs, (c.cs + 1)::INT, (c.ce + 1)::INT)),
      |      (acc, x) -> ((acc - (acc % 256) + xor((acc % 256)::BIGINT, x::BIGINT)::HUGEINT)
      |                   * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS f
      |  FROM chk c JOIN bl ON bl.doc_id = c.doc_id
      |  WHERE c.ce >= 0),
      |hashes AS (SELECT DISTINCT doc_id,
      |    CASE WHEN f >= 9223372036854775808::HUGEINT
      |         THEN (f - 18446744073709551616::HUGEINT)::BIGINT ELSE f::BIGINT END AS hash
      |  FROM ch),
      |orig AS (SELECT doc_id, hash FROM hashes WHERE doc_id < 100000),
      |copy AS (SELECT doc_id - 200000 AS doc_id, hash FROM hashes WHERE doc_id >= 200000),
      |no AS (SELECT doc_id, COUNT(*) AS n_orig FROM orig GROUP BY 1),
      |nc AS (SELECT doc_id, COUNT(*) AS n_copy FROM copy GROUP BY 1),
      |sh AS (SELECT o.doc_id, COUNT(*) AS n_shared FROM orig o JOIN copy c USING (doc_id, hash) GROUP BY 1)
      |SELECT no.doc_id, n_orig, n_copy, COALESCE(n_shared, 0) AS n_shared,
      |  ROUND(COALESCE(n_shared, 0) / (n_orig + n_copy - COALESCE(n_shared, 0)), 6) AS chunk_jaccard
      |FROM no JOIN nc USING (doc_id) LEFT JOIN sh ON sh.doc_id = no.doc_id
      |ORDER BY no.doc_id""".stripMargin

  /** GENERATED relational subspace-iteration oracle: `iters` chained rounds of
    * w = C·V then classical Gram-Schmidt over the r columns (ascending), from
    * the indicator start — replaying [[graft.textops.Pca.subspaceIteration]]'s
    * fixed-iteration loop over the corpus covariance. All tables are
    * dim-bounded; only the emitted basis rounds.
    */
  /** CONVERGED subspace-iteration PCA + projection: the [[pcaSubspaceChainSql]]
    * rounds wrapped in a `j5_em_train`-style freeze — each round computes the
    * candidate basis `vc\$t` from the frozen iterate `vf\${t-1}`, the done flag
    * latches once MAX|Δ| ≤ tol, and frozen rounds pass the basis through — then
    * projects every vector onto the final basis (dot minus the mean dot, exactly
    * `Pca.project`).
    */
  private def pcaProjectChainSql(r: Int, maxIter: Int, tol: Double): String = {
    def round(t: Int): String = {
      val prev = s"vf${t - 1}"
      val cols = (0 until r).map { k =>
        val base =
          if (k == 0) s"u${t}_0 AS (SELECT i, w FROM w$t WHERE k = 0)"
          else {
            val dn = (0 until k).map(kk => s"SELECT i, k, vjk FROM vk${t}_$kk")
              .mkString(" UNION ALL ")
            s"""dn${t}_$k AS ($dn),
               |dots${t}_$k AS (
               |  SELECT d.k AS kp, SUM(d.vjk * wk.w) AS dot
               |  FROM dn${t}_$k d JOIN (SELECT i, w FROM w$t WHERE k = $k) wk USING (i)
               |  GROUP BY d.k),
               |sub${t}_$k AS (
               |  SELECT d.i, SUM(dots.dot * d.vjk) AS sub
               |  FROM dn${t}_$k d JOIN dots${t}_$k dots ON dots.kp = d.k GROUP BY d.i),
               |u${t}_$k AS (
               |  SELECT wk.i, wk.w - COALESCE(s.sub, 0.0) AS w
               |  FROM (SELECT i, w FROM w$t WHERE k = $k) wk
               |  LEFT JOIN sub${t}_$k s USING (i))""".stripMargin
          }
        s"""$base,
           |n${t}_$k AS (SELECT SQRT(SUM(w * w)) AS nrm FROM u${t}_$k),
           |vk${t}_$k AS MATERIALIZED (
           |  SELECT i, $k AS k, w / n${t}_$k.nrm AS vjk FROM u${t}_$k, n${t}_$k)""".stripMargin
      }.mkString(",\n")
      val uni = (0 until r).map(k => s"SELECT i, k, vjk FROM vk${t}_$k")
        .mkString(" UNION ALL ")
      s"""w$t AS MATERIALIZED (
         |  SELECT c.i, v.k, SUM(c.cov * v.vjk) AS w
         |  FROM c JOIN $prev v ON v.j = c.j GROUP BY c.i, v.k),
         |$cols,
         |vc$t AS (SELECT i AS j, k, vjk FROM ($uni)),
         |dl$t AS (
         |  SELECT MAX(ABS(n.vjk - p.vjk)) AS delta
         |  FROM vc$t n JOIN $prev p USING (j, k)),
         |fz$t AS MATERIALIZED (
         |  SELECT (f.done OR dl$t.delta <= ${graft.util.Render.sqlDouble(tol)}) AS done
         |  FROM fz${t - 1} f, dl$t),
         |vf$t AS MATERIALIZED (
         |  SELECT p.j, p.k, CASE WHEN f.done THEN p.vjk ELSE n.vjk END AS vjk
         |  FROM $prev p JOIN vc$t n USING (j, k), fz${t - 1} f)""".stripMargin
    }
    val pcs = (0 until r).map(k =>
      s"ROUND(MAX(CASE WHEN pr.k = $k THEN pr.dot - md.mdot END), 6) + 0.0 AS pc_$k")
      .mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |x AS MATERIALIZED (
       |  SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS xi FROM e),
       |m AS MATERIALIZED (SELECT i, AVG(xi) AS mu FROM x GROUP BY i),
       |p AS (SELECT a.i AS i, b.i AS j, AVG(a.xi * b.xi) AS m2
       |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
       |c AS MATERIALIZED (SELECT p.i, p.j, p.m2 - mi.mu * mj.mu AS cov
       |     FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j),
       |dims AS (SELECT DISTINCT i FROM c),
       |vf0 AS MATERIALIZED (
       |  SELECT dims.i AS j, ks.k,
       |    CASE WHEN dims.i = ks.k + 1 THEN 1.0 ELSE 0.0 END AS vjk
       |  FROM dims CROSS JOIN (SELECT unnest(range(0, $r)) AS k) ks),
       |fz0 AS (SELECT FALSE AS done),
       |${(1 to maxIter).map(round).mkString(",\n")},
       |md AS (
       |  SELECT v.k, SUM(m.mu * v.vjk) AS mdot
       |  FROM vf$maxIter v JOIN m ON m.i = v.j GROUP BY v.k),
       |pr AS (
       |  SELECT x.vec_id, v.k, SUM(x.xi * v.vjk) AS dot
       |  FROM x JOIN vf$maxIter v ON v.j = x.i GROUP BY x.vec_id, v.k)
       |SELECT pr.vec_id,
       |  $pcs
       |FROM pr JOIN md USING (k)
       |GROUP BY pr.vec_id ORDER BY pr.vec_id""".stripMargin
  }

  private def pcaSubspaceChainSql(r: Int, iters: Int): String = {
    def round(t: Int): String = {
      val prev = if (t == 1) "v0" else s"v${t - 1}"
      val cols = (0 until r).map { k =>
        val base =
          if (k == 0) s"u${t}_0 AS (SELECT i, w FROM w$t WHERE k = 0)"
          else {
            val dn = (0 until k).map(kk => s"SELECT i, k, vjk FROM vk${t}_$kk")
              .mkString(" UNION ALL ")
            s"""dn${t}_$k AS ($dn),
               |dots${t}_$k AS (
               |  SELECT d.k AS kp, SUM(d.vjk * wk.w) AS dot
               |  FROM dn${t}_$k d JOIN (SELECT i, w FROM w$t WHERE k = $k) wk USING (i)
               |  GROUP BY d.k),
               |sub${t}_$k AS (
               |  SELECT d.i, SUM(dots.dot * d.vjk) AS sub
               |  FROM dn${t}_$k d JOIN dots${t}_$k dots ON dots.kp = d.k GROUP BY d.i),
               |u${t}_$k AS (
               |  SELECT wk.i, wk.w - COALESCE(s.sub, 0.0) AS w
               |  FROM (SELECT i, w FROM w$t WHERE k = $k) wk
               |  LEFT JOIN sub${t}_$k s USING (i))""".stripMargin
          }
        s"""$base,
           |n${t}_$k AS (SELECT SQRT(SUM(w * w)) AS nrm FROM u${t}_$k),
           |vk${t}_$k AS MATERIALIZED (
           |  SELECT i, $k AS k, w / n${t}_$k.nrm AS vjk FROM u${t}_$k, n${t}_$k)""".stripMargin
      }.mkString(",\n")
      val uni = (0 until r).map(k => s"SELECT i, k, vjk FROM vk${t}_$k")
        .mkString(" UNION ALL ")
      s"""w$t AS MATERIALIZED (
         |  SELECT c.i, v.k, SUM(c.cov * v.vjk) AS w
         |  FROM c JOIN $prev v ON v.j = c.j GROUP BY c.i, v.k),
         |$cols,
         |v$t AS MATERIALIZED (SELECT i AS j, k, vjk FROM ($uni))""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |x AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS xi FROM e),
       |m AS (SELECT i, AVG(xi) AS mu FROM x GROUP BY i),
       |p AS (SELECT a.i AS i, b.i AS j, AVG(a.xi * b.xi) AS m2
       |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
       |c AS MATERIALIZED (SELECT p.i, p.j, p.m2 - mi.mu * mj.mu AS cov
       |     FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j),
       |dims AS (SELECT DISTINCT i FROM c),
       |v0 AS MATERIALIZED (
       |  SELECT dims.i AS j, ks.k,
       |    CASE WHEN dims.i = ks.k + 1 THEN 1.0 ELSE 0.0 END AS vjk
       |  FROM dims CROSS JOIN (SELECT unnest(range(0, $r)) AS k) ks),
       |${(1 to iters).map(round).mkString(",\n")}
       |SELECT CAST(j - 1 AS INT) AS i, CAST(k AS INT) AS k,
       |  ROUND(vjk, 6) + 0.0 AS v
       |FROM v$iters ORDER BY i, k""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "sim_pca_subspace" -> pcaSubspaceChainSql(4, 6),
    "sim_pca_project" -> pcaProjectChainSql(4, 40, 0.01),
    "text_dictionary_tag" -> {
      val toks = toksSql("lower(text)")
      s"""WITH al(gram, entity) AS (VALUES
         |  ('join', 'op_join'), ('hash join', 'op_hash_join'),
         |  ('sort merge join', 'op_smj'), ('hash', 'fn_hash'),
         |  ('group', 'op_agg'), ('scan', 'op_scan'), ('the big table', 'noise')),
         |t AS (SELECT doc_id, $toks AS toks FROM documents),
         |g AS (
         |  SELECT doc_id, p.pos, l.len,
         |    array_to_string(list_slice(toks, p.pos + 1, p.pos + l.len), ' ') AS gram
         |  FROM t,
         |       unnest(range(0, len(toks))) AS p(pos),
         |       (SELECT unnest([1, 2, 3]) AS len) l
         |  WHERE p.pos + l.len <= len(toks)),
         |m AS (
         |  SELECT g.doc_id, g.pos, g.len, g.gram, al.entity
         |  FROM g JOIN al USING (gram)
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY g.doc_id, g.pos
         |    ORDER BY g.len DESC, g.gram) = 1)
         |SELECT doc_id, entity, COUNT(*) AS n_mentions,
         |  CAST(MIN(pos) AS INT) AS first_pos
         |FROM m GROUP BY doc_id, entity
         |ORDER BY doc_id, entity""".stripMargin
    },
    "mm_cdc_dedup" -> mmCdcDedupSql,
    "ann_lsh_topk" -> annLshSql,
    "ann_ivf_topk" -> annIvfSql,
    "ann_ivf_scalable_topk" -> annIvfScalableSql,
    "ann_ivf_incremental" -> annIvfIncrementalSql,
    "ann_pq_topk" -> annPqSql,
    "dedup_semantic" -> dedupSemanticSql,
    "text_token_count" ->
      s"SELECT doc_id, len(${toksSql("text")}) AS n_tokens FROM documents ORDER BY doc_id",
    "text_fingerprint_rolling" ->
      s"""WITH ${winnowCtes("documents")}
         |SELECT doc_id, unnest(list_sort(list_distinct(mins))) AS fp
         |FROM m ORDER BY doc_id, fp""".stripMargin,
    "dedup_fingerprint_overlap" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 35 = 0
         |  UNION ALL
         |  SELECT doc_id + 200000, text || ' xtradup token' FROM documents
         |  WHERE doc_id % 55 = 0
         |),
         |${winnowCtes("planted")},
         |fp AS (SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM m),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM fp GROUP BY doc_id),
         |pair AS (SELECT l.doc_id AS id_l, r.doc_id AS id_r,
         |           CAST(COUNT(*) AS BIGINT) AS shared
         |         FROM fp l JOIN fp r ON l.fp = r.fp AND l.doc_id < r.doc_id
         |         GROUP BY 1, 2),
         |sc AS (SELECT id_l, id_r, shared,
         |         shared::DOUBLE / LEAST(sa.n, sb.n) AS containment
         |       FROM pair JOIN sz sa ON id_l = sa.doc_id
         |       JOIN sz sb ON id_r = sb.doc_id)
         |SELECT id_l, id_r, shared, ROUND(containment, 6) AS containment
         |FROM sc WHERE containment >= 0.5 ORDER BY id_l, id_r""".stripMargin,
    "text_token_count_bpe" -> {
      // same lookahead-free pattern; '' escapes the leading quote in the SQL literal
      val pat = "''" + TextOps.BpeishPattern.drop(1)
      s"""SELECT doc_id, CAST(len(regexp_extract_all(text, '$pat')) AS INT) AS n_subwords
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "text_quality" -> qualitySql,
    "text_langid" -> langidSql,
    "text_mojibake" -> {
      val pat = TextOps.MojibakePattern
      s"""WITH p AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' b' || chr(65533) || 'd' || chr(7)
         |         ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_bad,
         |  ROUND(CASE WHEN length(text) = 0 THEN 0.0
         |        ELSE len(regexp_extract_all(text, '$pat'))::DOUBLE / length(text) END, 6)
         |    AS bad_ratio
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "text_url_density" -> {
      val pat = TextOps.UrlPattern.replace("'", "''")
      val toks = toksSql("text")
      s"""WITH p AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0
         |         THEN ' see https://ex' || (doc_id % 7) || '.com/a?b=1 and http://t.co/x'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 9 = 0
         |         THEN ' ftp ignored http://only.this/counts' ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$pat')) AS INT) AS n_urls,
         |  ROUND(CASE WHEN len($toks) = 0 THEN 0.0
         |    ELSE len(regexp_extract_all(text, '$pat'))::DOUBLE / len($toks) END, 6)
         |    AS url_density
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "text_url_canonical" -> {
      val pat = TextOps.UrlPattern.replace("'", "''")
      // the SAME backref-free canonicalization chain as TextOps.canonicalizeUrl;
      // only the &utm step can match twice per URL, so only it takes the 'g' flag
      // (Spark's regexp_replace is always-global — the other steps match at most
      // once per URL, so the engines agree)
      def canon(ref: String): String = {
        val noFrag = s"regexp_replace($ref, '#.*', '')"
        val noAmp = s"regexp_replace($noFrag, '&utm_[A-Za-z_]+=[^&#]*', '', 'g')"
        val noMid = s"regexp_replace($noAmp, '\\?utm_[A-Za-z_]+=[^&#]*&', '?')"
        val noUtm = s"regexp_replace($noMid, '\\?utm_[A-Za-z_]+=[^&#]*$$', '')"
        val pre = s"regexp_extract($noUtm, '^(https?://[^/?#]*)', 1)"
        val low = s"lower($pre) || substr($noUtm, length($pre) + 1)"
        s"regexp_replace(regexp_replace($low, '[.,;:!?]+$$', ''), '/$$', '')"
      }
      s"""WITH p AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 3 = 0
         |         THEN ' see https://Ex' || (doc_id % 7)
         |              || '.COM/Path/?utm_source=feed&id=' || (doc_id % 5) || '#frag'
         |         ELSE '' END ||
         |    CASE WHEN doc_id % 9 = 0
         |         THEN ' and http://T.co/abc?utm_campaign=x, done' ELSE '' END AS text
         |  FROM documents),
         |u AS (
         |  SELECT doc_id, unnest(list_transform(regexp_extract_all(text, '$pat'),
         |    w -> ${canon("w")})) AS url
         |  FROM p)
         |SELECT regexp_extract(url, '^https?://([^/?#]*)', 1) AS host,
         |  COUNT(*) AS n_urls,
         |  COUNT(DISTINCT doc_id) AS n_docs,
         |  COUNT(DISTINCT url) AS n_unique_urls
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "text_html_strip" -> {
      // replay TextOps.stripHtml's regex chain verbatim (RE2 both sides; the
      // 'g' flag is DuckDB's global-replace, which Spark does implicitly)
      val steps = Seq(
        ("""(?is)<script[^>]*>.*?</script>""", "''"),
        ("""(?is)<style[^>]*>.*?</style>""", "''"),
        ("""(?i)<(br|/p|/div|/li|/h[1-6]|/tr)[^>]*>""", "chr(10)"),
        ("""<[^>]*>""", "''"),
        ("""&lt;""", "'<'"), ("""&gt;""", "'>'"), ("""&quot;""", "'\"'"),
        ("""&#39;""", "''''"), ("""&nbsp;""", "' '"), ("""&amp;""", "'&'"),
        ("""[ \t]+""", "' '"),
        (""" ?\n ?""", "chr(10)"),
        ("""\n+""", "chr(10)"),
        ("""^\n+|\n+$""", "''"))
      val chain = steps.foldLeft("html") { case (acc, (pat, rep)) =>
        s"regexp_replace($acc, '$pat', $rep, 'g')"
      }
      s"""WITH d AS (
         |  SELECT doc_id,
         |    '<html><head><style type="text/css">p { color: red; }</style></head><body><h1>'
         |    || source ||
         |    '</h1><p>x &amp;amp; y &lt;tag&gt; &quot;q&quot; z&nbsp;w</p><div>'
         |    || substr(text, 1, 120) ||
         |    '</div><script>if (x < 2 && y > 1) { alert("hi"); }</script></body></html>'
         |    AS html
         |  FROM documents)
         |SELECT doc_id, trim($chain) AS text_out, length(trim($chain)) AS n_chars_out
         |FROM d ORDER BY doc_id""".stripMargin
    },
    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct(${toksSql("text")})), ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      s"""WITH $corpusCte
         |SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
         |FROM corpus GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "dedup_edit_distance" ->
      // deletion-neighborhood candidates + exact verify, replayed end-to-end:
      // candidates = pairs sharing a (string ∪ one-char-deleted) variant key
      """WITH w AS (SELECT c_custkey AS id, c_name AS s FROM customer
        |           WHERE c_name IS NOT NULL),
        |v0 AS (SELECT id, s,
        |         CASE WHEN len(s) > 0 THEN list_distinct(list_prepend(s,
        |           list_transform(range(1, len(s) + 1),
        |             i -> substr(s, 1, i - 1) || substr(s, i + 1, len(s)))))
        |         ELSE [s] END AS ks
        |       FROM w),
        |v AS (SELECT id, s, unnest(ks) AS k FROM v0),
        |cand AS (SELECT DISTINCT a.id AS id_l, b.id AS id_r, a.s AS s_l, b.s AS s_r
        |         FROM v a JOIN v b ON a.k = b.k WHERE a.id < b.id)
        |SELECT id_l, id_r, CAST(levenshtein(s_l, s_r) AS INT) AS dist
        |FROM cand WHERE levenshtein(s_l, s_r) <= 1
        |ORDER BY id_l, id_r""".stripMargin,
    "ep7_incremental_ingest" -> {
      val toks = toksSql("text")
      s"""WITH $minhashPairsCtes,
         |near_ids AS (SELECT DISTINCT id_r FROM mh_pairs
         |             WHERE id_l < 100000 AND id_r >= 100000),
         |inc AS (SELECT doc_id, text, lang FROM corpus WHERE doc_id >= 100000),
         |f AS (SELECT doc_id, lang, text,
         |        md5(text) IN (SELECT md5(text) FROM documents) AS is_exact,
         |        doc_id IN (SELECT id_r FROM near_ids) AS in_near,
         |        $qualityExprSql AS q
         |      FROM inc)
         |SELECT lang, COUNT(*) AS n_incoming,
         |  CAST(SUM(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
         |  CAST(SUM(CASE WHEN NOT is_exact AND in_near THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_near_dup,
         |  CAST(SUM(CASE WHEN NOT is_exact AND NOT in_near AND q >= 0.5
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(SUM(CASE WHEN NOT is_exact AND NOT in_near AND q >= 0.5
         |           THEN len($toks) ELSE 0 END) AS BIGINT) AS tokens_kept
         |FROM f GROUP BY lang ORDER BY lang""".stripMargin
    },
    "dedup_corpus_overlap" ->
      s"""WITH $corpusCte,
         |inc AS (SELECT lang AS stratum, md5(text) AS h FROM corpus WHERE doc_id >= 100000),
         |bh AS (SELECT DISTINCT md5(text) AS h FROM documents)
         |SELECT stratum, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN bh.h IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_overlap,
         |  ROUND(SUM(CASE WHEN bh.h IS NULL THEN 0 ELSE 1 END)::DOUBLE / COUNT(*), 6)
         |    AS overlap_frac
         |FROM inc LEFT JOIN bh USING (h)
         |GROUP BY stratum ORDER BY stratum""".stripMargin,
    "dedup_ngram_coverage" -> {
      val sh = shinglesSqlN("text", 5)
      s"""WITH $corpusCte,
         |s AS (SELECT doc_id, unnest($sh) AS ngram FROM corpus),
         |d AS (SELECT ngram FROM (SELECT ngram, COUNT(DISTINCT doc_id) AS nd
         |        FROM s GROUP BY 1) WHERE nd >= 2),
         |per AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM s GROUP BY 1),
         |hit AS (SELECT doc_id, COUNT(*) AS n_dup FROM s
         |        WHERE ngram IN (SELECT ngram FROM d) GROUP BY 1)
         |SELECT c.doc_id AS id, COALESCE(per.n_ngrams, 0) AS n_ngrams,
         |  COALESCE(hit.n_dup, 0) AS n_dup,
         |  CASE WHEN COALESCE(per.n_ngrams, 0) = 0 THEN 0.0
         |       ELSE ROUND(COALESCE(hit.n_dup, 0)::DOUBLE / per.n_ngrams, 6)
         |  END AS dup_fraction
         |FROM corpus c LEFT JOIN per USING (doc_id) LEFT JOIN hit USING (doc_id)
         |ORDER BY id""".stripMargin
    },
    "dedup_substring_spans" ->
      s"""WITH $corpusCte,
         |${substringSpanCtes(8)}
         |SELECT id, span_start, span_end, span_tokens
         |FROM spans ORDER BY id, span_start""".stripMargin,
    "dedup_substring_apply" ->
      s"""WITH $corpusCte,
         |${substringSpanCtes(8)},
         |spx AS (SELECT id, list(struct_pack(s := span_start, e := span_end)) AS ss,
         |          CAST(SUM(span_tokens) AS BIGINT) AS nrem FROM spans GROUP BY id),
         |cov AS (SELECT id, flatten(list_transform(ss, s -> range(s.s, s.e + 1))) AS cps,
         |          nrem FROM spx)
         |SELECT t.id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
         |  COALESCE(c.nrem, 0) AS n_removed,
         |  COALESCE(array_to_string(
         |    list_filter(t.toks, (x, i) -> c.cps IS NULL OR NOT list_contains(c.cps, i - 1)),
         |    ' '), '') AS cleaned_text
         |FROM t LEFT JOIN cov c USING (id) ORDER BY id""".stripMargin,
    "dedup_token_jaccard" ->
      jaccardPairSql(s"list_distinct(${toksSql("text")})", 0.9, corpusCte),
    "dedup_ngram_jaccard_prefix" ->
      // blockless: the prefix filter is candidate generation only, so the oracle is
      // the plain all-pairs threshold join over the shingle sets
      s"""WITH $corpusCte,
         |prep AS (SELECT doc_id AS id, list_distinct(${shinglesSql("text")}) AS toks FROM corpus)
         |SELECT l.id AS id_l, r.id AS id_r,
         |  ROUND(CASE WHEN len(list_distinct(list_concat(l.toks, r.toks))) = 0 THEN 0.0
         |    ELSE len(list_intersect(l.toks, r.toks))::DOUBLE /
         |         len(list_distinct(list_concat(l.toks, r.toks))) END, 6) AS jaccard
         |FROM prep l JOIN prep r ON l.id < r.id
         |WHERE CASE WHEN len(list_distinct(list_concat(l.toks, r.toks))) = 0 THEN 0.0
         |    ELSE len(list_intersect(l.toks, r.toks))::DOUBLE /
         |         len(list_distinct(list_concat(l.toks, r.toks))) END >= 0.5
         |ORDER BY id_l, id_r""".stripMargin,
    "dedup_ngram_jaccard" ->
      jaccardPairSql(s"list_distinct(${shinglesSql("text")})", 0.5, corpusCte),
    "dedup_minhash_lsh" -> minhashSql,
    "dedup_lsh_recall" ->
      s"""WITH $corpusCte,
         |prep AS (SELECT doc_id AS id, list_distinct(${shinglesSql("text")}) AS toks FROM corpus),
         |e AS (SELECT l.id AS id_l, r.id AS id_r, 1 AS it
         |      FROM prep l JOIN prep r ON l.id < r.id
         |      WHERE CASE WHEN len(list_distinct(list_concat(l.toks, r.toks))) = 0 THEN 0.0
         |        ELSE len(list_intersect(l.toks, r.toks))::DOUBLE /
         |             len(list_distinct(list_concat(l.toks, r.toks))) END >= 0.5),
         |ls AS (SELECT id_l, id_r, 1 AS il FROM ($minhashSql) q),
         |j AS (SELECT CAST(SUM(it) AS BIGINT) AS n_true, CAST(SUM(il) AS BIGINT) AS n_lsh,
         |        CAST(SUM(it * il) AS BIGINT) AS n_hit
         |      FROM e FULL JOIN ls USING (id_l, id_r))
         |SELECT n_true, n_lsh, n_hit,
         |  ROUND(CASE WHEN n_true = 0 THEN 0.0 ELSE n_hit::DOUBLE / n_true END, 6) AS recall,
         |  ROUND(CASE WHEN n_lsh = 0 THEN 0.0 ELSE n_hit::DOUBLE / n_lsh END, 6) AS prec
         |FROM j""".stripMargin,
    // same midpoint Riemann sum over the same S-curve; POWER/ROUND chains match the
    // Spark plan, so the table replays cell-exactly
    "dedup_lsh_tune" -> {
      val cands = (1 to 32).filter(32 % _ == 0)
        .map(r => s"($r, ${32 / r})").mkString(", ")
      s"""WITH cand(band_size, n_bands) AS (VALUES $cands),
         |g AS (SELECT (CAST(s AS DOUBLE) - 0.5) / 1000.0 AS x
         |      FROM generate_series(1, 1000) t(s)),
         |e AS (SELECT band_size, n_bands,
         |        ROUND(SUM(CASE WHEN x < 0.8
         |                       THEN 1 - POWER(1 - POWER(x, band_size), n_bands)
         |                       ELSE POWER(1 - POWER(x, band_size), n_bands) END)
         |              / 1000.0, 6) AS err
         |      FROM cand, g GROUP BY 1, 2)
         |SELECT band_size, n_bands, err,
         |  ROUND(1 - POWER(1 - POWER(0.8, band_size), n_bands), 6) AS p_at_t,
         |  (ROW_NUMBER() OVER (ORDER BY err, band_size) = 1) AS chosen
         |FROM e ORDER BY band_size""".stripMargin
    },
    "dedup_minhash_incremental" ->
      s"""WITH $minhashPairsCtes
         |SELECT id_l, id_r, ROUND(jac, 6) AS jaccard
         |FROM mh_pairs WHERE id_r >= 100000 ORDER BY id_l, id_r""".stripMargin,
    // identical semantics to the incremental run: each pair resolves exactly once,
    // in the later document's micro-batch, so the streamed union equals the batch run
    "stream_minhash_dedup" ->
      s"""WITH $minhashPairsCtes
         |SELECT id_l, id_r, ROUND(jac, 6) AS jaccard
         |FROM mh_pairs WHERE id_r >= 100000 ORDER BY id_l, id_r""".stripMargin,
    // identical semantics to the incremental run — the stored band index must be
    // indistinguishable from recomputing signatures
    "dedup_minhash_index" ->
      s"""WITH $minhashPairsCtes
         |SELECT id_l, id_r, ROUND(jac, 6) AS jaccard
         |FROM mh_pairs WHERE id_r >= 100000 ORDER BY id_l, id_r""".stripMargin,
    "dedup_apply" -> dedupApplySql,
    "dedup_apply_best" -> dedupApplyBestSql,
    "curation_leakage_safe_split" -> leakageSafeSplitSql,
    "dedup_simhash" -> simhashSql,
    "dedup_embedding_cosine" ->
      s"""WITH $embCorpusCte
         |SELECT l.vec_id AS id_l, r.vec_id AS id_r,
         |  ROUND(list_cosine_similarity(l.v, r.v), 6) AS cosine
         |FROM ecorpus l JOIN ecorpus r ON l.vec_id < r.vec_id
         |WHERE list_cosine_similarity(l.v, r.v) >= 0.9
         |ORDER BY id_l, id_r""".stripMargin,
    "text_bm25_topk" ->
      bm25Sql("bmcorpus AS (SELECT doc_id AS bid, text AS btext FROM documents)", 5,
        "bid AS doc_id"),
    "eval_annotator_agreement" ->
      """WITH lab AS (
        |  SELECT doc_id AS item, 'r1' AS rater,
        |    CAST(CASE WHEN (doc_id * 3) % 5 = 0 THEN (n_chars % 4 + 1) % 4
        |         ELSE n_chars % 4 END AS VARCHAR) AS cat FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'r2',
        |    CAST(CASE WHEN (doc_id * 7) % 5 = 0 THEN (n_chars % 4 + 2) % 4
        |         ELSE n_chars % 4 END AS VARCHAR) FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'r3',
        |    CAST(CASE WHEN (doc_id * 11) % 5 = 0 THEN (n_chars % 4 + 3) % 4
        |         ELSE n_chars % 4 END AS VARCHAR) FROM documents),
        |ab AS (SELECT a.item, a.cat AS ca, b.cat AS cb
        |       FROM lab a JOIN lab b USING (item)
        |       WHERE a.rater = 'r1' AND b.rater = 'r2'),
        |obs AS (SELECT COUNT(*) AS n,
        |         SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END)::BIGINT AS agree FROM ab),
        |marg AS (SELECT COALESCE(SUM(na * nb), 0)::BIGINT AS prod_sum FROM
        |  (SELECT ca, COUNT(*) AS na FROM ab GROUP BY 1) x
        |  FULL JOIN (SELECT cb, COUNT(*) AS nb FROM ab GROUP BY 1) y ON x.ca = y.cb),
        |cell AS (SELECT item, cat, COUNT(*) AS nij FROM lab GROUP BY 1, 2),
        |pb AS (SELECT COUNT(*) AS n_items, AVG((sq - 3.0) / 6.0) AS p_bar FROM
        |  (SELECT item, SUM(nij * nij) AS sq FROM cell GROUP BY 1)),
        |pej AS (SELECT SUM(nj)::DOUBLE AS total, SUM(nj * nj)::DOUBLE AS sq_sum FROM
        |  (SELECT cat, SUM(nij) AS nj FROM cell GROUP BY 1))
        |SELECT obs.n AS n_pair_items,
        |  ROUND(agree / obs.n, 6) AS percent_agreement,
        |  ROUND((agree / obs.n - prod_sum / (obs.n * obs.n)) /
        |        (1.0 - prod_sum / (obs.n * obs.n)), 6) AS cohens_kappa,
        |  pb.n_items, 3::BIGINT AS n_raters,
        |  ROUND(pb.p_bar, 6) AS p_bar,
        |  ROUND(pej.sq_sum / (pej.total * pej.total), 6) AS p_e,
        |  ROUND((pb.p_bar - pej.sq_sum / (pej.total * pej.total)) /
        |        (1.0 - pej.sq_sum / (pej.total * pej.total)), 6) AS fleiss_kappa
        |FROM obs, marg, pb, pej""".stripMargin,
    "eval_retrieval_ndcg" -> {
      s"""WITH ${bm25Ctes("bmcorpus AS (SELECT doc_id AS bid, text AS btext FROM documents)")},
         |$qrelsCtes,
         |rkk AS (SELECT rk.query_id, rk.rank, rk.bid AS doc_id, COALESCE(rel.rel, 0) AS rel
         |        FROM rk LEFT JOIN rel ON rel.query_id = rk.query_id AND rel.doc_id = rk.bid
         |        WHERE rk.rank <= 10),
         |perq AS (SELECT query_id,
         |           SUM((POWER(2.0, rel) - 1.0) / (LN(rank + 1.0) / LN(2.0))) AS dcg,
         |           MIN(CASE WHEN rel >= 2 THEN rank END) AS first_rel,
         |           SUM(CASE WHEN rel >= 2 THEN 1 ELSE 0 END) / 10.0 AS p_at_k
         |         FROM rkk GROUP BY 1),
         |ide AS (SELECT query_id,
         |          SUM((POWER(2.0, rel) - 1.0) / (LN(irank + 1.0) / LN(2.0))) AS idcg
         |        FROM (SELECT query_id, rel, ROW_NUMBER() OVER (
         |                PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irank
         |              FROM rel)
         |        WHERE irank <= 10 GROUP BY 1)
         |SELECT p.query_id,
         |  ROUND(CASE WHEN i.idcg IS NULL OR i.idcg = 0 THEN 0.0
         |             ELSE p.dcg / i.idcg END, 6) AS ndcg,
         |  ROUND(COALESCE(1.0 / p.first_rel, 0.0), 6) AS rr,
         |  ROUND(p.p_at_k, 6) AS p_at_k
         |FROM perq p LEFT JOIN ide i USING (query_id) ORDER BY query_id""".stripMargin
    },
    "ep13_hard_negatives" ->
      s"""WITH ${bm25Ctes("bmcorpus AS (SELECT doc_id AS bid, text AS btext FROM documents)")},
         |$qrelsCtes,
         |hard AS (
         |  SELECT rk.query_id, rk.rank, rk.bid AS doc_id, rk.bm25,
         |    COALESCE(rel.rel, 0) AS rel
         |  FROM rk LEFT JOIN rel ON rel.query_id = rk.query_id AND rel.doc_id = rk.bid
         |  WHERE rk.rank <= 20 AND rk.rank > 3
         |), nn AS (
         |  SELECT query_id, doc_id, bm25, rel, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY query_id ORDER BY rank) AS INT) AS neg_rank
         |  FROM hard
         |)
         |SELECT query_id, neg_rank, doc_id, bm25, rel FROM nn
         |WHERE neg_rank <= 5 ORDER BY query_id, neg_rank""".stripMargin,
    "ep12_diverse_retrieval" -> {
      // BM25 over the planted corpus + the shared minhash-closure clusters; keep
      // the best hit per (query, cluster), then top-5 — replayed end-to-end
      val pre =
        s"""$minhashPairsCtes,
           |edges AS (
           |  SELECT id_l::VARCHAR AS src, id_r::VARCHAR AS dst FROM mh_pairs
           |  UNION ALL
           |  SELECT id_r::VARCHAR, id_l::VARCHAR FROM mh_pairs),
           |reach(node, root) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node),
           |ccl AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
           |cl AS (SELECT c.doc_id, COALESCE(k.cluster_id, c.doc_id::VARCHAR) AS cluster_id
           |       FROM corpus c LEFT JOIN ccl k ON k.node = c.doc_id::VARCHAR),
           |bmcorpus AS (SELECT doc_id AS bid, text AS btext FROM corpus)""".stripMargin
      s"""WITH RECURSIVE ${bm25Ctes(pre)},
         |cands AS (SELECT query_id, bid, bm25, rank FROM rk WHERE rank <= 20),
         |dd AS (SELECT cands.*, cl.cluster_id,
         |         ROW_NUMBER() OVER (PARTITION BY query_id, cl.cluster_id
         |                            ORDER BY rank) AS rn
         |       FROM cands JOIN cl ON cl.doc_id = cands.bid),
         |fin AS (SELECT query_id, bid, bm25,
         |          CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rank) AS INT)
         |            AS drank
         |        FROM dd WHERE rn = 1)
         |SELECT query_id, drank AS rank, bid AS doc_id, bm25
         |FROM fin WHERE drank <= 5 ORDER BY query_id, rank""".stripMargin
    },
    "ep6_retrieval" -> {
      // passage index = the curation_chunk CTE keyed as doc_id*2^32 + chunk_index
      // (matches the Spark fixture's collision-safe radix)
      val toks = toksSql("text")
      bm25Sql(
        s"""ct AS (SELECT doc_id, $toks AS toks FROM documents),
           |cn AS (SELECT doc_id, toks, len(toks) AS n FROM ct WHERE len(toks) > 0),
           |cc AS (SELECT doc_id, toks,
           |         unnest(range(0, 1 + CAST(CEIL(GREATEST(n - 32, 0) / 24.0) AS BIGINT)))
           |           AS chunk_index
           |       FROM cn),
           |bmcorpus AS (SELECT doc_id * 4294967296 + chunk_index AS bid,
           |         array_to_string(toks[(chunk_index*24 + 1)::INT : (chunk_index*24 + 32)::INT], ' ')
           |           AS btext
           |       FROM cc)""".stripMargin, 3,
        "bid // 4294967296 AS doc_id, CAST(bid % 4294967296 AS INT) AS chunk_index")
    },
    "sim_mean_pool" ->
      """WITH e AS (SELECT vec_id % 50 AS group_id, embedding::DOUBLE[] AS v FROM embeddings),
        |u AS (SELECT group_id, unnest(range(len(v))) AS pos, unnest(v) AS x FROM e)
        |SELECT group_id, CAST(pos AS INT) AS pos, ROUND(AVG(x), 6) AS val
        |FROM u GROUP BY 1, 2 ORDER BY group_id, pos""".stripMargin,
    "ep9_hybrid_retrieval" -> {
      val lexCtes = bm25Ctes(
        "bmcorpus AS (SELECT doc_id AS bid, text AS btext FROM documents)",
        Some("q AS (SELECT doc_id AS query_id, text AS qtext FROM documents WHERE doc_id < 10)"))
      s"""WITH $lexCtes,
         |eq AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
         |ssc AS (SELECT eq.query_id, e.vec_id AS id,
         |          ROUND(list_cosine_similarity(e.embedding::DOUBLE[], eq.qv::DOUBLE[]), 6) AS cosine
         |        FROM embeddings e, eq WHERE e.vec_id <> eq.query_id),
         |srk AS (SELECT query_id, id, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |          ORDER BY cosine DESC, id) AS INT) AS rank FROM ssc),
         |u AS (SELECT query_id, bid AS id, rank FROM rk WHERE rank <= 20
         |      UNION ALL
         |      SELECT query_id, id, rank FROM srk WHERE rank <= 20),
         |f AS (SELECT query_id, id, SUM(1.0 / (60 + rank)) AS rrf FROM u GROUP BY 1, 2),
         |fr AS (SELECT query_id, id, rrf, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
         |         ORDER BY rrf DESC, id) AS INT) AS rank FROM f)
         |SELECT query_id, rank, id, ROUND(rrf, 6) AS rrf FROM fr
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },
    "sim_mmr_two_step" -> mmrChainSql(2),
    "sim_mmr_rerank" -> mmrChainSql(10),
    "sim_pca_one_iter" ->
      // covariance (full matrix — the symmetrized form powerIteration builds),
      // then w = C·1 and the unit-normalized result, rounded at the very end
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS xi FROM e),
        |m AS (SELECT i, AVG(xi) AS mu FROM x GROUP BY i),
        |p AS (SELECT a.i AS i, b.i AS j, AVG(a.xi * b.xi) AS m2
        |      FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
        |c AS (SELECT p.i, p.j, p.m2 - mi.mu * mj.mu AS cov
        |      FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j),
        |w AS (SELECT i, SUM(cov) AS w FROM c GROUP BY i),
        |nm AS (SELECT sqrt(SUM(w * w)) AS nrm FROM w)
        |SELECT CAST(w.i - 1 AS INT) AS i, ROUND(w.w / nm.nrm, 6) + 0.0 AS v
        |FROM w, nm ORDER BY i""".stripMargin,
    "sim_covariance" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |x AS (SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS xi FROM e),
        |m AS (SELECT i, AVG(xi) AS mu FROM x GROUP BY i),
        |p AS (SELECT a.i AS i, b.i AS j, AVG(a.xi * b.xi) AS m2
        |      FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i GROUP BY a.i, b.i)
        |SELECT CAST(p.i - 1 AS INT) AS i, CAST(p.j - 1 AS INT) AS j,
        |  ROUND(m2 - mi.mu * mj.mu, 6) + 0.0 AS cov
        |FROM p JOIN m mi ON mi.i = p.i JOIN m mj ON mj.i = p.j
        |ORDER BY i, j""".stripMargin,
    "sim_kmeans_assign" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
        |n AS (SELECT vec_id,
        |        list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
        |      FROM e),
        |c AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id < 8),
        |d AS (SELECT n.vec_id, c.cid, list_inner_product(n.v, c.cv) AS cos FROM n, c),
        |r AS (SELECT vec_id, cid, cos,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        |      FROM d)
        |SELECT vec_id, CAST(cid AS INT) AS centroid_id, ROUND(cos, 6) AS cosine
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "sim_silhouette" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
        |n AS (SELECT vec_id,
        |        list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
        |      FROM e),
        |c AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id < 8),
        |d AS (SELECT n.vec_id, c.cid, list_inner_product(n.v, c.cv) AS cos FROM n, c),
        |r AS (SELECT vec_id, cid, cos,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        |      FROM d),
        |s AS (SELECT r1.vec_id, r1.cid,
        |        1.0 - r1.cos AS a, 1.0 - r2.cos AS b
        |      FROM r r1 JOIN r r2 ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2)
        |SELECT CAST(cid AS INT) AS centroid_id, COUNT(*) AS n,
        |  ROUND(AVG(CASE WHEN GREATEST(a, b) = 0 THEN 0.0
        |                 ELSE (b - a) / GREATEST(a, b) END), 6) + 0.0 AS mean_silhouette
        |FROM s GROUP BY cid ORDER BY centroid_id""".stripMargin,
    "sim_cluster_sample" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
        |n AS (SELECT vec_id,
        |        list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
        |      FROM e),
        |c AS (SELECT vec_id AS cid, v AS cv FROM n WHERE vec_id < 8),
        |d AS (SELECT n.vec_id, c.cid, list_inner_product(n.v, c.cv) AS cos FROM n, c),
        |r AS (SELECT vec_id, cid,
        |        ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        |      FROM d),
        |a AS (SELECT vec_id, cid FROM r WHERE rn = 1),
        |k AS (SELECT vec_id, cid,
        |        ROW_NUMBER() OVER (PARTITION BY cid
        |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell_rank
        |      FROM a)
        |SELECT vec_id, CAST(cid AS INT) AS centroid_id, CAST(cell_rank AS INT) AS cell_rank
        |FROM k WHERE cell_rank <= 12 ORDER BY centroid_id, cell_rank""".stripMargin,
    "sim_margin_bitext" ->
      // ratio margin replayed end-to-end: per-pair cosine ROUNDED to 6 before
      // ranking/summing (mirrors bruteForceTopK), denominators = sum of each
      // side's top-4 rounded cosines / 2k, final margin rounded before the
      // threshold and the per-source (margin DESC, tgt ASC) pick
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings),
        |n AS (SELECT vec_id,
        |        list_transform(v0, x -> x / sqrt(list_inner_product(v0, v0))) AS v
        |      FROM e),
        |s AS (SELECT * FROM n WHERE vec_id % 2 = 0),
        |t AS (SELECT * FROM n WHERE vec_id % 2 = 1),
        |cm AS (SELECT s.vec_id AS x, t.vec_id AS y,
        |         ROUND(list_inner_product(s.v, t.v), 6) AS c
        |       FROM s, t),
        |fwd AS (SELECT x, y, c,
        |          ROW_NUMBER() OVER (PARTITION BY x ORDER BY c DESC, y) AS r FROM cm),
        |bwd AS (SELECT x, y, c,
        |          ROW_NUMBER() OVER (PARTITION BY y ORDER BY c DESC, x) AS r FROM cm),
        |dx AS (SELECT x, SUM(c) / 8.0 AS dx FROM fwd WHERE r <= 4 GROUP BY x),
        |dy AS (SELECT y, SUM(c) / 8.0 AS dy FROM bwd WHERE r <= 4 GROUP BY y),
        |cand AS (SELECT x, y, MAX(c) AS c FROM (
        |  SELECT x, y, c FROM fwd WHERE r <= 4
        |  UNION ALL SELECT x, y, c FROM bwd WHERE r <= 4) GROUP BY x, y),
        |m AS (SELECT cand.x, cand.y, cand.c,
        |        ROUND(cand.c / (dx.dx + dy.dy), 6) AS margin
        |      FROM cand JOIN dx USING (x) JOIN dy USING (y)
        |      WHERE ROUND(cand.c / (dx.dx + dy.dy), 6) >= 1.0),
        |best AS (SELECT x, y, c, margin,
        |           ROW_NUMBER() OVER (PARTITION BY x ORDER BY margin DESC, y) AS r
        |         FROM m)
        |SELECT x AS src_id, y AS tgt_id, c AS cosine, margin
        |FROM best WHERE r = 1 ORDER BY src_id""".stripMargin,
    "ann_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS cosine
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, rank, id, cosine FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "ann_sq_topk" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS raw FROM embeddings),
        |n AS (SELECT vec_id,
        |        list_transform(raw, x -> x / sqrt(list_inner_product(raw, raw))) AS v
        |      FROM e),
        |s AS (SELECT greatest(max(list_max(list_transform(v, x -> abs(x)))), 1e-12) AS scale
        |      FROM n),
        |c AS (SELECT vec_id, v,
        |        list_transform(v, x -> round(x / s.scale * 127)) AS codes
        |      FROM n, s),
        |q AS (SELECT vec_id AS query_id, v AS qv, codes AS qcodes FROM c WHERE vec_id < 10),
        |approx AS (
        |  SELECT q.query_id, c.vec_id AS id, q.qv, c.v,
        |    list_inner_product(c.codes, q.qcodes) AS adc
        |  FROM c, q WHERE c.vec_id <> q.query_id
        |), short AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc DESC, id) AS ar
        |  FROM approx
        |), rer AS (
        |  SELECT query_id, id, ROUND(list_inner_product(v, qv), 6) AS cosine
        |  FROM short WHERE ar <= 20
        |), ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, id) AS rank
        |  FROM rer
        |)
        |SELECT query_id, rank, id, cosine FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "mm_phash" ->
      // frozen dHashes of the constant fixtures; NULL = not decodable
      """SELECT CAST(fid AS BIGINT) AS id, CAST(h AS BIGINT) AS dhash FROM (VALUES
        |  (0, 808464432),
        |  (1, 578721456004993811),
        |  (2, NULL)) AS t(fid, h)
        |ORDER BY id""".stripMargin,
    "mm_resize_real" ->
      // frozen output of the real bilinear path on the constant fixtures: 18
      // packed-RGB24 bytes for each 3×2 image, stub subsample for the text row
      """SELECT CAST(fid AS BIGINT) AS id, CAST(w AS INT) AS width,
        |  CAST(h AS INT) AS height, CAST(n AS INT) AS out_len, m AS payload_md5
        |FROM (VALUES
        |  (0, 3, 2, 18, 'a143643a47874036a346e4cf4c7beb8b'),
        |  (1, 3, 2, 18, '61d5ccb457e9c96b0de35cacaeccea94'),
        |  (2, 3, 2, 7, '9bab37f01a2ef03256d7c0784f24e46f')) AS t(fid, w, h, n, m)
        |ORDER BY id""".stripMargin,
    "mm_cdc_chunks_fixed" ->
      // the frozen chunk table of the two constant payloads, computed once from
      // the committed hex fixtures and pinned: 18 chunks each; the edit at offset
      // 300 changes exactly ONE chunk (length 49->52, new hash), every later
      // chunk shifts +3 bytes with an IDENTICAL hash -- the resync property
      """SELECT CAST(fid AS BIGINT) AS fid, CAST(o AS INT) AS chunk_offset,
        |  CAST(l AS INT) AS chunk_length, CAST(h AS BIGINT) AS hash
        |FROM (VALUES
        |  (0, 0, 33, -530043031735138692),
        |  (0, 33, 43, -6194059483455214538),
        |  (0, 76, 51, 7436772048667962180),
        |  (0, 127, 28, 2372308054713509506),
        |  (0, 155, 33, 3128115680860848200),
        |  (0, 188, 53, -4091250725425989987),
        |  (0, 241, 10, -114093699090784954),
        |  (0, 251, 16, 1191475399906369607),
        |  (0, 267, 9, 7709397730201166455),
        |  (0, 276, 49, 5528906896633440802),
        |  (0, 325, 15, 3494507887854167802),
        |  (0, 340, 71, 7149685593009984484),
        |  (0, 411, 93, -6943319637761019119),
        |  (0, 504, 11, 3760719506472033817),
        |  (0, 515, 9, -8189949876893146868),
        |  (0, 524, 18, 668907831159908479),
        |  (0, 542, 84, -2934747760293355038),
        |  (0, 626, 14, 2756299591543597691),
        |  (1, 0, 33, -530043031735138692),
        |  (1, 33, 43, -6194059483455214538),
        |  (1, 76, 51, 7436772048667962180),
        |  (1, 127, 28, 2372308054713509506),
        |  (1, 155, 33, 3128115680860848200),
        |  (1, 188, 53, -4091250725425989987),
        |  (1, 241, 10, -114093699090784954),
        |  (1, 251, 16, 1191475399906369607),
        |  (1, 267, 9, 7709397730201166455),
        |  (1, 276, 52, -8006092958407545879),
        |  (1, 328, 15, 3494507887854167802),
        |  (1, 343, 71, 7149685593009984484),
        |  (1, 414, 93, -6943319637761019119),
        |  (1, 507, 11, 3760719506472033817),
        |  (1, 518, 9, -8189949876893146868),
        |  (1, 527, 18, 668907831159908479),
        |  (1, 545, 84, -2934747760293355038),
        |  (1, 629, 14, 2756299591543597691)) AS t(fid, o, l, h)
        |ORDER BY fid, chunk_offset""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id AS id, octet_length(encode(text)) AS byte_len, md5(text) AS content_md5,
        |  CAST(32 + octet_length(encode(text)) % 97 AS INT) AS width,
        |  CAST(32 + (octet_length(encode(text)) * 7) % 89 AS INT) AS height,
        |  CAST(1 + ascii(substr(text, 1, 1)) % 4 AS INT) AS frames
        |FROM documents ORDER BY id""".stripMargin,
    "mm_resize" ->
      """WITH base AS (
        |  SELECT doc_id AS id, text, octet_length(encode(text)) AS blen FROM documents
        |), dims AS (
        |  SELECT id, text, blen,
        |    LEAST(16, (32 + blen % 97)) AS width,
        |    LEAST(16, (32 + (blen * 7) % 89)) AS height
        |  FROM base
        |), keepd AS (
        |  SELECT *, GREATEST(1, blen // (width * height)) AS keep FROM dims
        |)
        |SELECT id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |  CAST(len(range(1, blen + 1, keep::INT)) AS INT) AS out_len,
        |  md5(array_to_string(
        |    list_transform(range(1, blen + 1, keep::INT), i -> substr(text, i::INT, 1)),
        |    '')) AS payload_md5
        |FROM keepd ORDER BY id""".stripMargin,
    "mm_audio_meta" ->
      // frozen truths of the two real WAV headers (140/124 bytes, 8k mono / 16k
      // stereo PCM-16) + the stub closed form for the text payload (len 20,
      // first 'n' → 24 kHz mono, frames len/2)
      """SELECT CAST(id AS BIGINT) AS id, CAST(bl AS BIGINT) AS byte_len,
        |  CAST(sr AS INT) AS sample_rate, CAST(ch AS INT) AS channels,
        |  CAST(bi AS INT) AS bits, CAST(fr AS BIGINT) AS n_frames, CAST(dm AS DOUBLE) AS duration_ms
        |FROM (VALUES
        |  (0, 140, 8000, 1, 16, 48, 6.0),
        |  (1, 124, 16000, 2, 16, 20, 1.25),
        |  (2, 20, 24000, 1, 16, 10, 0.416667)) t(id, bl, sr, ch, bi, fr, dm)
        |ORDER BY id""".stripMargin,
    "text_char_entropy" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 4 = 0
        |      THEN ' aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa' ELSE '' END AS t
        |  FROM documents),
        |ch AS (SELECT doc_id, t, unnest(string_split(t, '')) AS c FROM f),
        |cnt AS (SELECT doc_id, c, COUNT(*)::DOUBLE AS k FROM ch GROUP BY 1, 2),
        |srt AS (SELECT doc_id, list(k ORDER BY c) AS ks, SUM(k) AS n FROM cnt GROUP BY 1)
        |SELECT f.doc_id, CAST(length(f.t) AS INT) AS n_chars,
        |  ROUND(COALESCE(list_sum(list_transform(srt.ks,
        |    k -> -(k / srt.n) * (LN(k / srt.n) / LN(2.0)))), 0.0), 6) AS entropy_bits
        |FROM f LEFT JOIN srt USING (doc_id) ORDER BY doc_id""".stripMargin,
    "text_nfc_normalize" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id, (nfc_normalize(t) <> t) AS changed,
        |  CAST(length(t) AS INT) AS n_before,
        |  CAST(length(nfc_normalize(t)) AS INT) AS n_after,
        |  md5(nfc_normalize(t)) AS h
        |FROM f ORDER BY doc_id""".stripMargin,
    "mm_srt_cues" -> {
      val head = """^(\d+)\n(\d{2}):(\d{2}):(\d{2})[,.](\d{3}) --> (\d{2}):(\d{2}):(\d{2})[,.](\d{3})"""
      def ms(b: Int) =
        s"""(regexp_extract(cue, '$head', ${b})::BIGINT * 3600000 +
           | regexp_extract(cue, '$head', ${b + 1})::BIGINT * 60000 +
           | regexp_extract(cue, '$head', ${b + 2})::BIGINT * 1000 +
           | regexp_extract(cue, '$head', ${b + 3})::BIGINT)""".stripMargin
      s"""WITH f AS (
         |  SELECT doc_id AS id,
         |    '1' || chr(10) || '00:00:' || lpad((doc_id % 50)::VARCHAR, 2, '0') ||
         |    ',000 --> 00:00:' || lpad((doc_id % 50 + 1)::VARCHAR, 2, '0') || ',500' ||
         |    chr(10) || substr(text, 1, 40) || chr(10) || chr(10) ||
         |    '2' || chr(10) || '00:01:00,000 --> ' ||
         |    CASE WHEN doc_id % 9 = 0 THEN '00:01:00,000' ELSE '00:01:02,000' END ||
         |    chr(10) || substr(text, 41, 30) || chr(10) || 'second line' ||
         |    chr(10) || chr(10) || '3' || chr(10) || 'not a timestamp' || chr(10) || 'oops'
         |      AS srt
         |  FROM documents),
         |c AS (SELECT id, unnest(string_split_regex(srt, '\\n[ \\t]*\\n+')) AS cue FROM f),
         |v AS (SELECT id, cue FROM c WHERE regexp_extract(cue, '$head', 1) <> ''),
         |p AS (SELECT id,
         |        regexp_extract(cue, '$head', 1)::INT AS cue_index,
         |        ${ms(2)} AS start_ms, ${ms(6)} AS end_ms,
         |        replace(regexp_replace(cue, '$head' || '\\n?', ''), chr(10), ' ')
         |          AS cue_text
         |      FROM v)
         |SELECT id, cue_index, start_ms, end_ms,
         |  end_ms - start_ms AS duration_ms, cue_text,
         |  CAST(length(cue_text) AS BIGINT) AS n_chars,
         |  CASE WHEN end_ms - start_ms <= 0 THEN NULL
         |       ELSE ROUND(length(cue_text)::DOUBLE * 1000.0 / (end_ms - start_ms), 6)
         |  END AS cps
         |FROM p ORDER BY id, cue_index""".stripMargin
    },
    "mm_type_sniff" ->
      // frozen truths: magic bytes of the constant fixtures (PNG/BMP/GIF image,
      // WAV audio, ISO-BMFF + EBML video, text + CDC-noise unknown)
      """SELECT CAST(id AS BIGINT) AS id, CAST(bl AS BIGINT) AS byte_len, kind
        |FROM (VALUES
        |  (0, 82, 'image'), (1, 102, 'image'), (2, 749, 'image'),
        |  (3, 140, 'audio'), (4, 124, 'audio'),
        |  (5, 232, 'video'), (6, 332, 'video'),
        |  (7, 20, 'unknown'), (8, 640, 'unknown'),
        |  (9, 71, 'video'), (10, 67, 'video')) t(id, bl, kind)
        |ORDER BY id""".stripMargin,
    "mm_webm_meta" ->
      // frozen truths of the two hand-built EBML fixtures (the builder wrote the
      // fields, the parser must read them back): webm 2 tracks 640x360, f32
      // duration 4250 ticks @ 1e6 ns; matroska (unknown-size Segment) 1 track
      // 320x240, f64 1234.5 ticks @ 2e6 ns; stub closed form for the text row
      // (len 20, first byte 'n' = 110 -> 48x48, 1 track, 600-tick timescale)
      """SELECT CAST(id AS BIGINT) AS id, CAST(bl AS BIGINT) AS byte_len,
        |  dt AS doc_type, CAST(ts AS INT) AS timescale_ns,
        |  CAST(dm AS DOUBLE) AS duration_ms, CAST(nt AS INT) AS n_tracks,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height
        |FROM (VALUES
        |  (0, 71, 'webm', 1000000, 4250.0, 2, 640, 360),
        |  (1, 67, 'matroska', 2000000, 2469.0, 1, 320, 240),
        |  (2, 20, 'stub', 600, 33.333333, 1, 48, 48)) t(id, bl, dt, ts, dm, nt, w, h)
        |ORDER BY id""".stripMargin,
    "mm_audio_silence" ->
      // frozen span truths: ids 0/1 are loud throughout; id 2 (stub, centered
      // bytes) is quiet in both windows; id 3 quiet only in window 1; id 4 quiet
      // in both windows (square-wave RMS = amplitude exactly)
      """SELECT CAST(id AS BIGINT) AS id, CAST(s AS INT) AS span_start,
        |  CAST(e AS INT) AS span_end, CAST(n AS BIGINT) AS n_windows
        |FROM (VALUES (2, 0, 1, 2), (3, 1, 1, 1), (4, 0, 1, 2)) t(id, s, e, n)
        |ORDER BY id, span_start""".stripMargin,
    "mm_video_meta" ->
      // frozen truths of the two hand-built ISO-BMFF fixtures (the builder wrote
      // the fields, the parser must read them back) + the stub closed form
      // (len 20, first byte 'n' = 110 → 48×48, 1 track, 600-tick timescale)
      """SELECT CAST(id AS BIGINT) AS id, CAST(bl AS BIGINT) AS byte_len,
        |  mb AS major_brand, CAST(ts AS INT) AS timescale,
        |  CAST(dm AS DOUBLE) AS duration_ms, CAST(nt AS INT) AS n_tracks,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height
        |FROM (VALUES
        |  (0, 232, 'isom', 1000, 5000.0, 1, 640, 360),
        |  (1, 332, 'mp42', 600, 2056.666667, 2, 320, 240),
        |  (2, 20, 'stub', 600, 33.333333, 1, 48, 48)) t(id, bl, mb, ts, dm, nt, w, h)
        |ORDER BY id""".stripMargin,
    "mm_audio_energy" ->
      // frozen window-16 first-channel RMS/peak of the constant fixtures (real
      // PCM decode for ids 0-1, centered unsigned-8 stub bytes for id 2)
      """SELECT CAST(id AS BIGINT) AS id, CAST(w AS INT) AS window_index,
        |  CAST(n AS INT) AS n_samples, CAST(r AS DOUBLE) AS rms, CAST(p AS INT) AS peak
        |FROM (VALUES
        |  (0, 0, 16, 19198.075672, 32768),
        |  (0, 1, 16, 19032.625817, 31621),
        |  (0, 2, 16, 19390.371154, 31832),
        |  (1, 0, 16, 19340.458048, 32768),
        |  (1, 1, 4, 19406.35472, 25456),
        |  (2, 0, 16, 45.853026, 96),
        |  (2, 1, 4, 24.667793, 31)) t(id, w, n, r, p)
        |ORDER BY id, window_index""".stripMargin,
    "mm_png_meta" -> {
      // DuckDB md5() only takes VARCHAR, so the digests of the three CONSTANT
      // payloads are frozen literals (computed from the same hex); the dims are the
      // known true PNG/BMP headers, row 2 the stub closed form (len 20, first 'n')
      s"""WITH f(id, b, w, h, fr, m) AS (VALUES
         |  (0, unhex('$MmPngHex'), 5, 3, 1, 'e79db52c2db12e3563e5d854b0f184f3'),
         |  (1, unhex('$MmBmpHex'), 7, 2, 1, '18b1928a4f427b90dc366379faca5d8f'),
         |  (2, unhex('$MmTextHex'), 52, 83, 3, 'a797617c52b610ca2ae047d24e27c183'))
         |SELECT CAST(id AS BIGINT) AS id, octet_length(b) AS byte_len,
         |  m AS content_md5, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         |  CAST(fr AS INT) AS frames
         |FROM f ORDER BY id""".stripMargin
    },
    "mm_frame_sample" ->
      """WITH base AS (
        |  SELECT doc_id AS id, text, octet_length(encode(text)) AS blen,
        |         1 + ascii(substr(text, 1, 1)) % 4 AS frames
        |  FROM documents
        |), fr AS (
        |  SELECT id, text, blen, frames, GREATEST(1, blen // frames) AS span,
        |         unnest(range(0, frames, 2)) AS f
        |  FROM base
        |), rng AS (
        |  SELECT id, CAST(f AS INT) AS frame_index, text,
        |    (f * span)::BIGINT AS lo,
        |    CASE WHEN f = frames - 1 THEN blen ELSE LEAST(blen, f * span + span) END AS hi
        |  FROM fr
        |)
        |SELECT id, frame_index,
        |  md5(substr(text, (LEAST(lo, hi) + 1)::INT, GREATEST(hi - lo, 0)::INT)) AS frame_md5
        |FROM rng ORDER BY id, frame_index""".stripMargin,
    "mm_frame_sample_real" ->
      // frozen output of the real frame-decode path: the 5-frame animated GIF's
      // frames 0/2/4 (packed-RGB24 raster md5s), the PNG's single frame 0, and
      // the text payload's stub byte-range fingerprints (frames 0/2 of 3)
      """SELECT CAST(fid AS BIGINT) AS id, CAST(f AS INT) AS frame_index, m AS frame_md5
        |FROM (VALUES
        |  (0, 0, 'b03689210d4e5b05f7cce32ab0037ec8'),
        |  (0, 2, '2b0d2b62e4814384e644f5da21f39b12'),
        |  (0, 4, '9170439260d3a6878612b6c3eeda5e60'),
        |  (1, 0, 'f7b158bfba45d1108817de12c6b9ec84'),
        |  (2, 0, 'be8545058f0d2d3ab0bd2f8c391785c1'),
        |  (2, 2, '07177a3a78cde5485fc44bad7c49b5eb')) AS t(fid, f, m)
        |ORDER BY id, frame_index""".stripMargin,
    "stream_window_agg" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  event_type, COUNT(*) AS cnt, ROUND(SUM(value), 4) AS value_sum
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_stateful_totals" ->
      """SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS value_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_tws_totals" ->
      """SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS value_sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_json_extract" ->
      """SELECT json_extract_string(props, '$.k') AS k_val, COUNT(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |  LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events)
        |SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
        |FROM o WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_paths" ->
      """WITH o AS (SELECT user_id, event_type,
        |  LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
        |  LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
        |FROM events),
        |c AS (SELECT p1 || '>' || p2 || '>' || event_type AS path, COUNT(*) AS n
        |      FROM o WHERE p1 IS NOT NULL GROUP BY 1
        |      ORDER BY n DESC, path LIMIT 10)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INT) AS rank, path, n
        |FROM c ORDER BY rank""".stripMargin,
    "ev_anomaly" ->
      """WITH d AS (SELECT event_type AS key, CAST(ts AS DATE) AS dd, COUNT(*) AS n
        |           FROM events GROUP BY 1, 2),
        |st AS (SELECT key, SUM(n) AS s1, SUM(n::DOUBLE * n) AS s2, COUNT(*) AS c
        |       FROM d GROUP BY 1),
        |z AS (SELECT d.key, dd, n,
        |        CASE WHEN c <= 1 OR (s2 - s1::DOUBLE * s1 / c) / (c - 1) <= 0 THEN 0.0
        |             ELSE ROUND((n - s1 / c) / SQRT((s2 - s1::DOUBLE * s1 / c) / (c - 1)), 4)
        |        END AS z
        |      FROM d JOIN st USING (key))
        |SELECT key, STRFTIME(dd, '%Y-%m-%d') AS day, n, z, ABS(z) >= 2.0 AS is_anomaly
        |FROM z ORDER BY key, day""".stripMargin,
    "prof_key_skew" ->
      """WITH c AS (SELECT user_id AS key, COUNT(*) AS n FROM events GROUP BY 1),
        |st AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM c),
        |rk AS (SELECT key, n,
        |         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, key) AS INT) AS rank FROM c)
        |SELECT rank, key, n, ROUND(n::DOUBLE / st.total, 6) AS share,
        |  ROUND(n::DOUBLE * st.n_keys / st.total, 6) AS skew
        |FROM rk CROSS JOIN st WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "ev_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, MIN(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e
        |       JOIN s1 ON e.user_id = s1.u AND e.ts > s1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, MIN(e.ts) AS t FROM events e
        |       JOIN s2 ON e.user_id = s2.u AND e.ts > s2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 1 AS stage_index, 'view' AS stage, COUNT(*) AS n_users FROM s1
        |  UNION ALL
        |  SELECT 2, 'view>click', COUNT(*) FROM s2
        |  UNION ALL
        |  SELECT 3, 'view>click>purchase', COUNT(*) FROM s3
        |) ORDER BY stage_index""".stripMargin,
    "ev_retention" ->
      """WITH c AS (SELECT user_id AS u, MIN(CAST(ts AS DATE)) AS cohort_date
        |           FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events)
        |SELECT cohort_date, CAST(date_diff('day', cohort_date, d) AS INT) AS day_offset,
        |  COUNT(DISTINCT a.u) AS n_users
        |FROM a JOIN c ON a.u = c.u
        |WHERE date_diff('day', cohort_date, d) <= 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_enrich" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n,
        |  ROUND(SUM(value), 4) AS value_sum
        |FROM events LEFT JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // identical to the batch curation_shard_manifest oracle — the streaming sink
    // must land the exact same deterministic layout the batch sink does
    // versioned sink: identical manifest — the batch=<id> layout only changes WHERE
    // rows land, never which rows exist
    "stream_sharded_sink_versioned" -> {
      val toks = toksSql("text")
      """WITH s AS (
        |  SELECT CAST(('0x' || substr(md5('shard1:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |           % 8 AS INT) AS shard, text
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(len(""".stripMargin + toks + """)) AS BIGINT) AS n_tokens
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin
    },
    "stream_sharded_sink" -> {
      val toks = toksSql("text")
      """WITH s AS (
        |  SELECT CAST(('0x' || substr(md5('shard1:' || doc_id::VARCHAR), 1, 8))::BIGINT
        |           % 8 AS INT) AS shard, text
        |  FROM documents)
        |SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(len(""".stripMargin + toks + """)) AS BIGINT) AS n_tokens
        |FROM s GROUP BY shard ORDER BY shard""".stripMargin
    },
    "stream_left_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us, value FROM events),
        |v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, us, value FROM e WHERE event_type = 'purchase'),
        |wm AS (SELECT LEAST((SELECT MAX(us) FROM v), (SELECT MAX(us) FROM p))
        |         - 3600000000 AS wm_us),
        |j AS (SELECT v.user_id, v.us AS v_us, p.us AS p_us, p.value
        |      FROM v LEFT JOIN p ON v.user_id = p.user_id
        |        AND p.us >= v.us AND p.us <= v.us + 1800000000),
        |keep AS (SELECT * FROM j, wm
        |         WHERE p_us IS NOT NULL OR v_us + 1800000000 < wm_us)
        |SELECT user_id, COUNT(p_us)::BIGINT AS n_pairs,
        |  SUM(CASE WHEN p_us IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unmatched,
        |  ROUND(SUM(COALESCE(value, 0.0)), 4) AS value_sum
        |FROM keep GROUP BY 1 ORDER BY 1""".stripMargin,
    "stream_stream_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us, value FROM events),
        |v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, us, value FROM e WHERE event_type = 'purchase')
        |SELECT v.user_id, COUNT(*) AS n_pairs, ROUND(SUM(p.value), 4) AS value_sum
        |FROM v JOIN p ON v.user_id = p.user_id
        |  AND p.us >= v.us AND p.us <= v.us + 1800000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Emission contract, mirroring Spark's mechanics exactly: every session closed
    // by a LATER EVENT of the same user emits (no timeout involved); a user's LAST
    // session emits via event-time timeout, which Spark tracks in MILLISECONDS —
    // timeout = floor(last_us/1000) + gap_ms fires when strictly below the watermark
    // floor(max_us/1000). The microsecond form (end+gap < max) would disagree when
    // the deadline and watermark land in the same millisecond.
    "stream_sessionize" ->
      """WITH e AS (SELECT CAST(user_id AS BIGINT) AS user_id,
        |             epoch_ns(ts) // 1000 AS us FROM events),
        |m AS (SELECT MAX(us) // 1000 AS wm_ms FROM e),
        |d AS (SELECT user_id, us,
        |        CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |             OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e),
        |s AS (SELECT user_id, us, SUM(brk) OVER (PARTITION BY user_id ORDER BY us
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM d),
        |g AS (SELECT user_id, sid, MIN(us) AS session_start_us,
        |        MAX(us) AS session_end_us, COUNT(*) AS n_events
        |      FROM s GROUP BY 1, 2),
        |lastsid AS (SELECT user_id, MAX(sid) AS last_sid FROM g GROUP BY user_id)
        |SELECT g.user_id, session_start_us, session_end_us, n_events
        |FROM g JOIN lastsid ON g.user_id = lastsid.user_id, m
        |WHERE g.sid < last_sid
        |   OR (session_end_us // 1000 + 1800000) < wm_ms
        |ORDER BY g.user_id, session_start_us""".stripMargin,
    "stream_dedup" ->
      """SELECT lang, COUNT(DISTINCT md5(text)) AS n_unique
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "stream_dedup_watermark" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id || '|' || event_type || '|' || epoch_ns(ts)) AS n_unique
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_quality_filter" -> {
      val toks = toksSql("text")
      s"""WITH sc AS (SELECT doc_id, text, len($toks) AS n_tokens,
         |              $qualityExprSql AS quality, $langScoresSql FROM documents),
         |m AS (SELECT *, $langMaxSql AS mx FROM sc),
         |f AS (SELECT n_tokens, quality, $langCaseSql AS pred_lang FROM m)
         |SELECT pred_lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens
         |FROM f
         |WHERE pred_lang <> 'und' AND n_tokens >= 5 AND quality >= 0.3
         |GROUP BY pred_lang ORDER BY pred_lang""".stripMargin
    },
    "stream_dsir_gate" ->
      s"""WITH ${CurationQueries.dsirCtes}
         |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  ROUND(SUM(ROUND(COALESCE(s.sc, 0.0), 6)), 6) AS sum_dsir
         |FROM documents d LEFT JOIN s USING (doc_id)
         |WHERE ROUND(COALESCE(s.sc, 0.0), 6) >= 0.0
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "ep4_training_corpus" -> {
      val toks = toksSql("text")
      s"""WITH $corpusCte,
         |sc AS (SELECT doc_id, text, len($toks) AS n_tokens,
         |         $qualityExprSql AS quality, $langScoresSql
         |       FROM corpus WHERE doc_id % 13 <> 0),
         |m AS (SELECT *, $langMaxSql AS mx FROM sc),
         |f AS (SELECT doc_id, text, n_tokens FROM m
         |      WHERE $langCaseSql <> 'und' AND n_tokens >= 5 AND quality >= 0.3),
         |d AS (SELECT MIN(doc_id) AS doc_id, arg_min(text, doc_id) AS text,
         |        arg_min(n_tokens, doc_id) AS n_tokens
         |      FROM f GROUP BY md5(lower(strip_accents(text)))),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(${shinglesSql("text")})) AS shingle
         |        FROM documents WHERE doc_id % 13 = 0),
         |dx AS (SELECT doc_id, unnest(list_distinct(${shinglesSql("text")})) AS shingle
         |       FROM d),
         |bad AS (SELECT DISTINCT doc_id FROM dx JOIN bsh USING (shingle)),
         |cl AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
         |tok AS (SELECT unnest($toks) AS token FROM cl),
         |c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token
         |      ORDER BY n DESC, token LIMIT 50),
         |v AS (SELECT token FROM c),
         |q AS (SELECT doc_id, unnest($toks) AS token FROM cl),
         |o AS (SELECT q.doc_id, COUNT(*) FILTER (WHERE v.token IS NULL) AS n_oov
         |      FROM q LEFT JOIN v USING (token) GROUP BY q.doc_id),
         |s AS (SELECT cl.doc_id, cl.n_tokens, COALESCE(o.n_oov, 0) AS n_oov,
         |        CAST(('0x' || substr(md5('ep4:' || cl.doc_id::VARCHAR), 1, 8))::BIGINT
         |          % 4 AS INT) AS shard
         |      FROM cl LEFT JOIN o ON cl.doc_id = o.doc_id)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(SUM(n_oov) AS BIGINT) AS n_oov
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin
    },
    "ev_interval_join" ->
      """WITH i AS (SELECT event_id AS incident_id, ts AS w_start,
        |                  ts + INTERVAL 10 MINUTE AS w_end
        |           FROM events WHERE event_id % 199 = 0)
        |SELECT i.incident_id, COUNT(*) AS n_events, ROUND(SUM(e.value), 6) AS value_sum
        |FROM events e JOIN i ON e.ts >= i.w_start AND e.ts <= i.w_end
        |GROUP BY i.incident_id ORDER BY i.incident_id""".stripMargin,
    "ev_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, ts, event_id AS purchase_id, value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id,
        |  (SELECT r.purchase_id FROM r WHERE r.user_id = l.user_id AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.purchase_id DESC LIMIT 1) AS purchase_id_asof,
        |  ROUND((SELECT r.value FROM r WHERE r.user_id = l.user_id AND r.ts <= l.ts
        |   ORDER BY r.ts DESC, r.purchase_id DESC LIMIT 1), 6) AS value_asof
        |FROM l ORDER BY l.event_id""".stripMargin,
    "ev_asof_forward" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
        |r AS (SELECT user_id, ts, event_id AS purchase_id, value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id,
        |  (SELECT r.purchase_id FROM r WHERE r.user_id = l.user_id AND r.ts >= l.ts
        |   ORDER BY r.ts ASC, r.purchase_id DESC LIMIT 1) AS purchase_id_asof,
        |  ROUND((SELECT r.value FROM r WHERE r.user_id = l.user_id AND r.ts >= l.ts
        |   ORDER BY r.ts ASC, r.purchase_id DESC LIMIT 1), 6) AS value_asof
        |FROM l ORDER BY l.event_id""".stripMargin,
    "stream_simhash_dedup" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text, lang FROM documents
         |  UNION ALL
         |  SELECT doc_id + 100000, text, lang FROM documents WHERE doc_id % 7 = 0
         |),
         |${LinkQueries.simhash64Cte("planted")},
         |j AS (SELECT p.lang, s.simhash FROM planted p JOIN sig s ON p.doc_id = s.id)
         |SELECT lang, CAST(COUNT(DISTINCT simhash) AS BIGINT) AS n_unique
         |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    "ev_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events
        |), s AS (
        |  SELECT user_id, us,
        |    CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 0
        |         WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM e
        |), x AS (
        |  SELECT user_id,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_index
        |  FROM s
        |), g AS (
        |  SELECT user_id, session_index, COUNT(*) AS n FROM x GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events, COUNT(*) AS n_sessions,
        |  CAST(MAX(n) AS BIGINT) AS max_session_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ep2_corpus_curation" -> {
      val toks = toksSql("text")
      s"""WITH $corpusCte,
         |sc AS (SELECT doc_id, text, len($toks) AS n_tokens,
         |              $qualityExprSql AS quality, $langScoresSql FROM corpus),
         |m AS (SELECT *, $langMaxSql AS mx FROM sc),
         |f AS (SELECT doc_id, text, n_tokens, quality, $langCaseSql AS pred_lang FROM m)
         |SELECT MIN(doc_id) AS doc_id, MIN(n_tokens) AS n_tokens,
         |       MIN(quality) AS quality, COUNT(*) AS n_copies
         |FROM f
         |WHERE pred_lang <> 'und' AND n_tokens >= 5 AND quality >= 0.3
         |GROUP BY md5(text)
         |ORDER BY doc_id""".stripMargin
    })
}
