package graft.textops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcasted query set — one scan of the corpus,
  * no shuffle until the per-query top-k). Scale path: random-hyperplane LSH bucketing
  * with multiprobe, so each query only scores its bucket neighborhood.
  */
object Similarity {

  /** Cosine similarity between two `array<double>` columns, via the primitive-loop
    * [[graft.functions.array_dot]] expression (the HOF zip_with form allocates per
    * element and dominates all-pairs scans).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.array_dot(a, b) / (vecNorm(a) * vecNorm(b))

  def vecNorm(x: Column): Column = sqrt(graft.functions.array_dot(x, x))

  /** Unit-normalized copy of an `array<double>` column (compute once per row, then
    * cosine between normalized vectors is a single dot product). Native expression:
    * the `transform` HOF form re-evaluates the norm per element (no CSE across lambda
    * boundaries), i.e. O(d²) per row.
    */
  def normalized(x: Column): Column = graft.functions.array_normalize(x)

  /** Brute-force top-k: every query row against the whole corpus. The query set is
    * broadcast (it is small by construction); ranking uses `round(sim, 6)` then id so
    * results are reproducible across engines and float summation orders.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // normalize each side ONCE so the per-pair work is a single dot product — the
    // cosine() form re-derives both norms per pair (3 dots instead of 1)
    val c = corpus.select(col(idCol).as("id"),
      normalized(col(vecCol).cast("array<double>")).as("v"))
    val q = queries.select(col(idCol).as("query_id"),
      normalized(col(vecCol).cast("array<double>")).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", round(graft.functions.array_dot(col("v"), col("qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** Stable function value of [[bruteForceTopK]] — the `topK` default. Being a
    * single object (not a per-call eta-expansion) lets marginBitext recognize
    * the exact-baseline path by reference and share one cosine matrix.
    */
  val BruteForceTopKFn: (DataFrame, DataFrame, String, String, Int) => DataFrame =
    bruteForceTopK(_, _, _, _, _)


  /** Deterministic random hyperplanes: `nPlanes × dim` from a seeded RNG (driver-side
    * literals, serialized with the plan — no shuffle, no state).
    */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection signature: bit i = (v · plane_i) > 0, packed into an int.
    * One codegen'd pass over the vector ([[graft.functions.hyperplane_signatures]]) —
    * the HOF `zip_with`+`aggregate` form allocates per element per plane and dominated
    * the corpus-wide signature scan.
    */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column =
    element_at(graft.functions.hyperplane_signatures(vec, planes, planes.length), 1)

  /** Multi-table LSH top-k: `nTables` independent signatures of `planesPerTable` bits
    * each; a corpus row is a candidate for a query when ANY table's signature matches,
    * then exact cosine top-k over the candidates.
    *
    * Recall/cost tradeoff is data-dependent: for weakly-clustered embeddings (top
    * neighbors at cosine ≈ 0.5) each extra table adds recall roughly geometrically
    * while candidates grow linearly. Defaults target ≥0.7 recall on near-random
    * vectors; tighten `planesPerTable` upward for clustered corpora. Recall is pinned
    * against [[bruteForceTopK]] in the spec.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nTables: Int = 16,
      planesPerTable: Int = 5,
      seed: Long = 42L): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    // all tables' planes in one flat matrix: signature t of the result array is
    // table t's `planesPerTable`-bit signature, computed in a single vector pass
    val allPlanes: Array[Array[Double]] = (0 until nTables).toArray
      .flatMap(t => randomPlanes(planesPerTable, dim, seed + t))
    def sigs(vec: Column): Column =
      graft.functions.hyperplane_signatures(vec, allPlanes, planesPerTable)

    // normalized once per side: signatures are scale-invariant and the verify dot
    // needs unit vectors anyway (single dot per candidate instead of 3)
    val c = corpus.select(col(idCol).as("id"),
        normalized(col(vecCol).cast("array<double>")).as("v"))
      .select(col("id"), col("v"), posexplode(sigs(col("v"))).as(Seq("table", "sig")))
    val q = queries.select(col(idCol).as("query_id"),
        normalized(col(vecCol).cast("array<double>")).as("qv"))
      .select(col("query_id"), col("qv"), posexplode(sigs(col("qv"))).as(Seq("table", "sig")))

    val scored = c.join(broadcast(q), Seq("table", "sig"))
      .filter(col("id") =!= col("query_id"))
      .dropDuplicates("query_id", "id")
      .withColumn("cosine", round(graft.functions.array_dot(col("v"), col("qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** Int8 scalar-quantized (SQ8) ANN: codes = `round(x/scale·levels)` with one
    * corpus-wide symmetric scale, candidates ranked by the INTEGER dot product of the
    * code arrays, and only the top `refine·k` per query re-ranked with exact cosine.
    *
    * Scale design: the scan side of the candidate scoring is the code column —
    * 1 byte/dim on disk versus 8 for raw doubles, so a 100 TB embedding store scans
    * at ~1/8 the I/O before the bounded re-rank touches any raw vector (the same
    * codes-only-index layout [[Pq.writeIndex]] demonstrates; SQ8 trades PQ's higher
    * compression for a training-free, closed-form encode). The scale constant comes
    * from ONE bounded aggregation (a 1-row collect riding the plan as a literal).
    *
    * Unlike the trained ANN paths (LSH tables, IVF cells, PQ codebooks), every step
    * here is closed-form and deterministic: integer ADC scores tie-break on id, the
    * re-rank rounds to 6 dp — so the full result is engine-reproducible and this is
    * the one ANN query with a complete DuckDB oracle (`ann_sq_topk`).
    *
    * Per-dimension scales (classic SQ8) would squeeze more resolution from skewed
    * dimensions; the global symmetric scale keeps the encode a pure column expression
    * with one corpus constant, which is enough once the exact re-rank is in place.
    */
  def sqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      refine: Int = 4,
      levels: Int = 127): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(refine >= 1, s"refine must be >= 1, got $refine")
    require(levels >= 1, s"levels must be >= 1, got $levels")
    val c = corpus.select(col(idCol).as("id"),
      normalized(col(vecCol).cast("array<double>")).as("v"))
    val q = queries.select(col(idCol).as("query_id"),
      normalized(col(vecCol).cast("array<double>")).as("qv"))
    // symmetric global scale = max |component| over the corpus; floor keeps an
    // all-zero corpus from dividing by zero
    val scaleRow = c.agg(max(array_max(transform(col("v"), x => abs(x))))).first()
    val scale = math.max(if (scaleRow.isNullAt(0)) 0.0 else scaleRow.getDouble(0), 1e-12)
    // integer-valued doubles: products ≤ levels²·dim ≪ 2^53, so the ADC dot is
    // EXACT and summation-order-independent — safe for cross-engine hash compare
    def codes(v: Column): Column =
      transform(v, x => round(x / lit(scale) * lit(levels), 0))
    val cc = c.withColumn("codes", codes(col("v")))
    val qc = q.withColumn("qcodes", codes(col("qv")))
    val adc = cc.crossJoin(broadcast(qc))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc", graft.functions.array_dot(col("codes"), col("qcodes")))
    val wApprox = Window.partitionBy("query_id").orderBy(desc("adc"), asc("id"))
    val shortlist = adc.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= refine * k)
    val wExact = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("id"))
    shortlist
      .withColumn("cosine", round(graft.functions.array_dot(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** Okapi BM25 top-k retrieval — the lexical counterpart of the embedding paths.
    *
    * Relational inverted index: the per-(doc, token) term-frequency table IS the
    * posting lists, and scoring is an equi-join of the (tiny, broadcast) query-term
    * side against it — each query term touches only its own postings, never a corpus
    * scan per query. Doc-length normalization joins back on the document key with the
    * posting side already filtered to query-matching rows, so the join's probe side
    * is bounded by matching postings regardless of corpus size. One token explode
    * feeds tf, doc length, and document frequency through the scoped cache.
    *
    * Determinism across engines: per-term contributions and the final score are
    * rounded to 6 dp, and ties rank by document id, so sub-ULP `ln`/summation-order
    * differences cannot flip a row. `n_docs`/`avgdl` count only docs with ≥1 token.
    *
    * Returns (query_id, rank, doc_id, bm25, n_terms) with rank ≤ k per query.
    */
  /** Margin-based parallel-corpus mining (Artetxe & Schwenk, "Margin-based Parallel
    * Corpus Mining with Multilingual Sentence Embeddings", ACL 2019 — the
    * LASER/CCMatrix recipe): score a candidate translation pair not by raw cosine
    * but by its RATIO margin against both sides' neighborhoods,
    *
    *   margin(x, y) = cos(x, y) / ( Σ_{z∈NNk(x,Y)} cos(x,z)/2k
    *                              + Σ_{z∈NNk(y,X)} cos(y,z)/2k )
    *
    * which cancels the hubness that makes raw-cosine mining pair everything with a
    * few central sentences. Candidates are the union of forward and backward top-k
    * lists; each source keeps its best-margin target at `threshold` (≥ 1 = "better
    * than an average neighbor", the published operating point).
    *
    * Scale design: built on the SAME top-k primitive as the ANN family — the
    * `topK` parameter defaults to the exact-recall [[bruteForceTopK]] baseline and
    * accepts the IVF index path at corpus scale (e.g.
    * `(c, q, id, v, k) => Ivf.topK(c, q, id, v, k, model)` — TextOpsSpec pins its
    * pair recall against brute force); everything downstream (two per-id
    * denominator aggregations, a candidate-keyed join, one per-source window) runs
    * on O(ids · k) rows, never |X|·|Y|. Determinism: cosines are rounded to 6
    * INSIDE the top-k primitive (so ranks and the denominator sums replay
    * cross-engine) and the final margin rounds to 6 before the
    * (margin DESC, target ASC) pick.
    */
  def marginBitext(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double = 1.0,
      topK: (DataFrame, DataFrame, String, String, Int) => DataFrame =
        BruteForceTopKFn): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import graft.util.Caching.CacheSyntax
    // The exact-baseline path computes the |X|·|Y| cosine matrix ONCE and reads
    // it through two windows: calling bruteForceTopK per direction would cross-
    // join (and dot-product) the same pairs twice for identical values —
    // array_dot is element-order-symmetric, so cos(x,y) is bitwise equal either
    // way (the invariant the union-dedup below already relies on). A custom topK
    // (the IVF path at corpus scale) keeps the two independent bounded probes.
    val (fwd, bwd) =
      if (topK eq BruteForceTopKFn) {
        val sN = src.select(col(idCol).as("qx"),
          normalized(col(vecCol).cast("array<double>")).as("xv"))
        // round-robin spread of the stream side: the |X|·|Y| dot-product pass
        // runs at its partitioning, and a single-file source otherwise grinds
        // the whole matrix on ONE task (measured 2.5 s single-task at sf0.1);
        // per-pair cosines are deterministic, so the result is layout-proof
        val tN = tgt.select(col(idCol).as("qy"),
            normalized(col(vecCol).cast("array<double>")).as("yv"))
          .repartition(tgt.sparkSession.sparkContext.defaultParallelism)
        val scored = tN.crossJoin(broadcast(sN))
          .filter(col("qy") =!= col("qx"))
          .withColumn("cosine",
            round(graft.functions.array_dot(col("yv"), col("xv")), 6))
          .select(col("qx"), col("qy"), col("cosine")).scopedPersist()
        val wf = Window.partitionBy("qx").orderBy(desc("cosine"), asc("qy"))
        val wb = Window.partitionBy("qy").orderBy(desc("cosine"), asc("qx"))
        (scored.withColumn("rank", row_number().over(wf)).filter(col("rank") <= k)
           .select(col("qx").as("query_id"), col("rank"), col("qy").as("id"),
             col("cosine")).scopedPersist(),
         scored.withColumn("rank", row_number().over(wb)).filter(col("rank") <= k)
           .select(col("qy").as("query_id"), col("rank"), col("qx").as("id"),
             col("cosine")).scopedPersist())
      } else {
        (topK(tgt, src, idCol, vecCol, k).scopedPersist(), // x → NNk(x, Y)
         topK(src, tgt, idCol, vecCol, k).scopedPersist()) // y → NNk(y, X)
      }
    val denomX = fwd.groupBy(col("query_id").as("x"))
      .agg((sum("cosine") / (2.0 * k)).as("dx"))
    val denomY = bwd.groupBy(col("query_id").as("y"))
      .agg((sum("cosine") / (2.0 * k)).as("dy"))
    // union of both directions' candidates; cos(x,y) is computed identically on
    // either side (same pairwise mult-add order), so max() is pure dedup
    val cands = fwd.select(col("query_id").as("x"), col("id").as("y"), col("cosine"))
      .unionByName(bwd.select(col("id").as("x"), col("query_id").as("y"), col("cosine")))
      .groupBy("x", "y").agg(max("cosine").as("cosine"))
    val scored = cands
      .join(denomX, "x").join(denomY, "y")
      .withColumn("margin", round(col("cosine") / (col("dx") + col("dy")), 6))
      .filter(col("margin") >= threshold)
    val w = Window.partitionBy("x").orderBy(desc("margin"), asc("y"))
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("x").as("src_id"), col("y").as("tgt_id"),
        col("cosine"), col("margin"))
  }

  /** Reciprocal-rank fusion (Cormack et al.): combine per-query rankings from
    * heterogeneous retrievers (lexical BM25, embedding ANN, …) by
    * `score(d) = Σ_r 1/(rrfK + rank_r(d))`, keeping the top `topK` per query —
    * deterministic ties broken by id.
    *
    * Scale design: inputs are already top-k-bounded per query, so the union, the
    * (query_id, id) hash aggregate, and the per-query rank window all run on
    * O(queries · Σkᵢ) rows — never corpus-sized. With ≤ 2 rankings the per-doc sum
    * adds at most two doubles (commutative, so engine/partition order cannot change
    * the result bit); for more rankings the usual round-6 comparison convention
    * applies.
    *
    * @param rankings each with columns `query_id`, `id`, `rank` (1-based)
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, rrfK: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(topK > 0, s"topK must be positive, got $topK")
    require(rrfK >= 0, s"rrfK must be non-negative, got $rrfK")
    val unioned = rankings
      .map(_.select(col("query_id"), col("id"), col("rank")))
      .reduce(_ unionByName _)
    val scored = unioned.groupBy("query_id", "id")
      .agg(sum(lit(1.0) / (lit(rrfK) + col("rank"))).as("rrf"))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "id", "rrf")
  }

  /** MMR-diversified re-rank: per query, greedily keep `k` of the bounded top-N
    * candidates maximizing λ·relevance − (1−λ)·max-cosine-to-selected
    * (Carbonell & Goldstein 1998) — the standard redundancy filter between
    * retrieval and a RAG consumer.
    *
    * `cands` carries (query_id, id, rank, rel) from an upstream top-N (N bounded —
    * that's what makes the per-query `collect_list` safe); embeddings attach by one
    * id-keyed join, then the greedy loop runs ROW-LOCAL per query inside the
    * codegen'd [[graft.expressions.MmrSelect]] — queries are data-parallel, no
    * further shuffle. Candidates feed the expression sorted by rank, so greedy
    * ties are deterministic.
    */
  def mmrRerank(
      cands: DataFrame,
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      lambdaWeight: Double,
      k: Int): DataFrame = {
    val withEmb = cands.join(
      embs.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("emb")),
      Seq("id"))
    withEmb.groupBy("query_id")
      .agg(sort_array(collect_list(
        struct(col("rank"), col("id"), col("rel"), col("emb")))).as("cs"))
      .select(col("query_id"),
        graft.functions.mmr_select(
          transform(col("cs"), c =>
            struct(c.getField("id").as("id"), c.getField("rel").as("rel"),
              c.getField("emb").as("emb"))),
          lambdaWeight, k).as("sel"))
      .select(col("query_id"), posexplode(col("sel")).as(Seq("pos", "id")))
      .select(col("query_id"), (col("pos") + 1).as("mmr_rank"), col("id"))
  }

  /** Ranking-quality evaluation (NDCG@k with exponential gain, reciprocal rank,
    * precision@k) of a bounded top-k `ranking` against graded relevance judgments
    * `qrels` — the offline acceptance gate for a retrieval stack (BM25, ANN, or
    * hybrid) before it serves. Järvelin & Kekäläinen 2002 NDCG.
    *
    *   - `ranking`: (query_id, rank, doc_id), rank 1-based, ≤ k rows per query
    *   - `qrels`: (query_id, doc_id, rel) with rel > 0 integer grades; docs absent
    *     from qrels count as rel = 0
    *   - `relThreshold`: minimum grade treated as "relevant" for RR / P@k
    *
    * Scale shape: the ranking side is already bounded (queries × k rows); the only
    * corpus-scale input is qrels, which the ideal-DCG pass reduces with ONE window
    * partitioned by query (rel desc, doc_id tiebreak → deterministic ideal order)
    * before the k-row cutoff. Everything downstream is queries×k-bounded.
    */
  def retrievalEval(
      ranking: DataFrame,
      qrels: DataFrame,
      k: Int,
      relThreshold: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val lg2 = math.log(2.0)
    def gain(rel: Column, rank: Column): Column =
      (pow(lit(2.0), rel) - lit(1.0)) / (log(rank.cast("double") + 1.0) / lit(lg2))
    val ranked = ranking.filter(col("rank") <= k)
      .join(qrels, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val perQ = ranked.groupBy("query_id").agg(
      sum(gain(col("rel"), col("rank"))).as("dcg"),
      min(when(col("rel") >= relThreshold, col("rank"))).as("first_rel"),
      (sum((col("rel") >= relThreshold).cast("long")) / lit(k.toDouble)).as("p_at_k"))
    val wi = Window.partitionBy("query_id").orderBy(desc("rel"), asc("doc_id"))
    val ideal = qrels.withColumn("irank", row_number().over(wi))
      .filter(col("irank") <= k)
      .groupBy("query_id").agg(sum(gain(col("rel"), col("irank"))).as("idcg"))
    // LEFT join: a query with no qrels rows (or only rel<=0 ones, idcg = 0) stays
    // in the output with ndcg = 0.0 — dropping it would silently inflate averages
    perQ.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        when(col("idcg").isNull || col("idcg") === 0, lit(0.0))
          .otherwise(col("dcg") / col("idcg")).as("ndcg"),
        coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"),
        col("p_at_k"))
  }

  def bm25TopK(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      queries: DataFrame, // (query_id, qtext)
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import graft.util.Caching.CacheSyntax
    val terms = corpus
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .scopedPersist()
    val dl = terms.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = terms.groupBy("token").agg(count(lit(1)).as("df"))
    // bounded 1-row collect (corpus-level constants ride the plan as literals; long
    // sums stay exact in double below 2^53 tokens, so avgdl is bit-identical across
    // engines and summation orders)
    val statsRow = dl.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl")).first()
    val nDocs = statsRow.getLong(0)
    // empty or all-empty-text corpus: no postings to score — return the empty
    // result instead of NPE-ing on the NULL average
    val avgdl = if (nDocs == 0) 1.0 else statsRow.getDouble(1)
    // query terms are a set (classic BM25); idf attaches on the tiny side so the
    // postings probe is ONE broadcast hash join
    val qidf = broadcast(
      queries
        .select(col("query_id"),
          explode(array_distinct(TextOps.tokens(col("qtext")))).as("token"))
        .join(dfreq, "token")
        .withColumn("idf",
          log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
        .select(col("query_id"), col("token"), col("idf")))
    val dln = dl.select(col("doc_id"),
      (lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))).as("dl_norm"))
    val contrib = terms
      .join(qidf, "token")
      .join(dln, "doc_id")
      .withColumn("c",
        round(col("idf") * col("tf") * lit(k1 + 1.0) / (col("tf") + col("dl_norm")), 6))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(round(sum("c"), 6).as("bm25"), count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("query_id").orderBy(desc("bm25"), asc("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "bm25", "n_terms")
  }

  /** Simplified silhouette over cosine distance for a fixed-centroid assignment —
    * the standard cluster-quality check for the SemDeDup/IVF cell structure this
    * module builds (how tight is each cell, and is a point closer to a foreign
    * centroid than its own?). Per point: a = 1 − cos(v, assigned centroid),
    * b = 1 − max cosine over the OTHER centroids, s = (b − a) / max(a, b)
    * (0 when both distances are 0, the duplicate-of-centroid edge). The
    * "simplified" variant scores against centroids, not all points — O(N·k)
    * instead of the O(N²) pairwise silhouette, the only form that scales.
    *
    * One corpus pass: the k cosines are codegen'd sequential-fold dots against
    * literal centroid vectors (bit-reproducible across engines), the assignment
    * is the same argmax (cos DESC, index ASC) as [[graft.functions.nearest_centroid]],
    * and the result is one k-row hash aggregate — no joins, no shuffle beyond it.
    *
    * @param centroids unit-normalized, the bounded k×dim driver convention
    * @return (centroid_id, n, mean_silhouette) — one row per non-empty cell
    */
  def silhouette(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.length >= 2, s"silhouette needs >= 2 centroids, got ${centroids.length}")
    val v = normalized(col(vecCol).cast("array<double>"))
    // sequential-fold dot (NOT array_dot): identical accumulation order to the
    // oracle's list_inner_product, so a/b are bit-exact on both sides
    def cosTo(c: Array[Double]): Column = aggregate(
      zip_with(v, typedLit(c.toSeq), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val scored = corpus.select(col(idCol),
        graft.functions.nearest_centroid(v, centroids).as("centroid_id"),
        array(centroids.map(cosTo).toIndexedSeq: _*).as("_cos"))
      .withColumn("_best", element_at(col("_cos"), col("centroid_id") + 1))
      // max over the others = 2nd element of the descending sort: any duplicate
      // of the best value lands there too, which is exactly max-over-others
      .withColumn("_other", element_at(sort_array(col("_cos"), asc = false), 2))
      .withColumn("_a", lit(1.0) - col("_best"))
      .withColumn("_b", lit(1.0) - col("_other"))
      .withColumn("_sil",
        when(greatest(col("_a"), col("_b")) === 0.0, lit(0.0))
          .otherwise((col("_b") - col("_a")) / greatest(col("_a"), col("_b"))))
    scored.groupBy("centroid_id")
      // + 0.0 folds a rounded -0.0 (tiny negative mean) to 0.0, engine-portably
      .agg(count(lit(1)).as("n"),
        (round(avg("_sil"), 6) + lit(0.0)).as("mean_silhouette"))
  }

  /** Cluster-balanced diversity sampling (the SemDeDup/DCLM "sample evenly across
    * embedding clusters" curation step): assign every row to its nearest centroid
    * (codegen'd argmax-dot over normalized vectors) and keep at most `perCell`
    * rows per cell in deterministic md5(id) order — an unbiased, reproducible
    * draw that flattens topic skew instead of sampling proportionally to it.
    *
    * Scale: the per-cell pick is a window PARTITIONED by cell (k-way parallel,
    * never a global sort); cells are ~N/k rows by construction of the argmax
    * assignment, and a pathologically hot cell degrades to that one partition's
    * sort only. For fraction-based cuts at extreme skew use
    * [[graft.textops.Curation.keepTopFractionApprox]] on the hash instead.
    *
    * @param centroids unit-normalized, the bounded k×dim driver convention
    * @return (id, centroid_id, cell_rank) — kept rows only
    */
  def clusterBalancedSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Array[Array[Double]],
      perCell: Int): DataFrame = {
    require(perCell >= 1, s"perCell must be >= 1, got $perCell")
    val v = normalized(col(vecCol).cast("array<double>"))
    val assigned = corpus.select(col(idCol),
      graft.functions.nearest_centroid(v, centroids).as("centroid_id"))
    val w = Window.partitionBy("centroid_id")
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    assigned
      .withColumn("cell_rank", row_number().over(w))
      .filter(col("cell_rank") <= perCell)
  }
}
