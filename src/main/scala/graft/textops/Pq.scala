package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for compressed-domain ANN (IVF-PQ, the standard
  * billion-scale recipe: Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011).
  *
  * Scale design: the searchable corpus representation is `m` ints per row instead of
  * `dim` doubles — a 64-dim embedding collapses to 8 codes (codebooks are
  * `m × ksub × dim/m` doubles, driver-sized constants serialized with the plan).
  * Candidate scoring reads ONLY the code column ([[graft.expressions.PqAdcScore]]);
  * the raw vectors are touched just for the bounded refine list, so a 100 TB
  * embedding store is scanned as a ~100·m/(8·dim)-sized code column plus point reads.
  * Training mirrors [[Ivf.fit]]: per-subspace Lloyd on a bounded seeded sample, all
  * `m` subspaces updated in one aggregation pass per round.
  */
object Pq {

  /** `codebooks(sub)(code)` = centroid subvector (length dim/m). */
  case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def subDim: Int = codebooks(0)(0).length
  }

  /** Deterministic per-subspace k-means on unit-normalized vectors: seed codes from
    * the `ksub` smallest-salted-hash sample rows (the [[Ivf.fit]] convention), then
    * `iters` Lloyd rounds. Each round encodes the sample once (one codegen'd
    * projection) and recenters every subspace from ONE (sub, code)-keyed aggregation
    * — never a per-subspace pass. Empty cells keep their previous centroid.
    */
  def fit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3,
      seed: Long = 42L,
      trainSampleRows: Long = 100000L): Model = {
    require(m > 0 && dim % m == 0, s"dim $dim must be divisible by m $m")
    require(ksub > 0, s"ksub must be positive, got $ksub")
    require(trainSampleRows > 0, s"trainSampleRows must be positive, got $trainSampleRows")
    val subDim = dim / m
    // null / null-element vectors would surface as null group keys and driver NPEs
    // deep in the recenter loop — drop them up front (the ArrayAvgAgg convention);
    // pq_encode still raises on any that slip through a caller's own projection
    val full = corpus.select(col(idCol).as("id"),
      Similarity.normalized(col(vecCol).cast("array<double>")).as("v"))
      .filter(col("v").isNotNull && !exists(col("v"), _.isNull))
    val n = full.count()
    val v =
      (if (n > 2 * trainSampleRows)
        full.sample(withReplacement = false,
          math.min(1.0, 1.2 * trainSampleRows / n), seed)
      else full).cache()
    try {
      // portable md5(id:seed) seeding, code id = hash rank — the Ivf.fit convention;
      // lets the ann_pq_topk DuckDB oracle replay training exactly
      val seedRows = v
        .withColumn("h", md5(concat_ws(":", col("id").cast("string"), lit(seed.toString))))
        .orderBy("h").limit(ksub)
        .select("v").collect()
        .map(_.getSeq[Double](0).toArray)
      require(seedRows.nonEmpty, "pq fit: empty training set")
      // fewer sample rows than ksub: cycle the seeds (duplicate centroids merge via
      // the lowest-code tie-break, harmless at toy scale)
      var codebooks: Array[Array[Array[Double]]] = Array.tabulate(m, ksub) { (s, c) =>
        java.util.Arrays.copyOfRange(seedRows(c % seedRows.length), s * subDim, (s + 1) * subDim)
      }

      (1 to iters).foreach { _ =>
        val coded = v.withColumn("codes", graft.functions.pq_encode(col("v"), codebooks))
        // every (subspace, code) mean in one shuffle: explode the m subvectors
        // row-locally, then a single array-average aggregation
        val subs = (0 until m).map(s => struct(
          lit(s).as("sub"),
          col("codes").getItem(s).as("code"),
          slice(col("v"), s * subDim + 1, subDim).as("sv")))
        val means = coded
          .select(explode(array(subs: _*)).as("e"))
          .groupBy(col("e.sub"), col("e.code"))
          .agg(graft.functions.array_avg_agg(col("e.sv")).as("mean"))
          .collect()
        val next = codebooks.map(_.map(_.clone))
        means.foreach { r =>
          next(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
        }
        codebooks = next
      }
      Model(codebooks)
    } finally v.unpersist()
  }

  /** The corpus with its PQ code column attached (normalized vector kept for the
    * refine re-rank; an on-disk index would persist `codes` and drop `v`).
    */
  def withCodes(corpus: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame =
    corpus
      .select(col(idCol).as("id"),
        Similarity.normalized(col(vecCol).cast("array<double>")).as("v"))
      .withColumn("codes", graft.functions.pq_encode(col("v"), model.codebooks))

  /** Write the code-only index partitioned by IVF cell: `(id, codes)` per row — the
    * raw vectors stay in the base table, so the index is ~`m`/dim·(4/8) the size of
    * the embedding store and probe reads prune whole cell directories. This is the
    * on-disk layout the ADC scan rides at corpus scale.
    */
  def writeIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      ivfModel: Ivf.Model,
      pqModel: Model,
      path: String): Unit =
    withCodes(corpus, idCol, vecCol, pqModel)
      .withColumn("cell", graft.functions.nearest_centroid(col("v"), ivfModel.centroids))
      .select("cell", "id", "codes")
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Day-2 code-index growth (the [[Ivf.appendToIndex]] analogue): encode a new
    * batch with the EXISTING codebooks, assign its IVF cells, append — no refit, no
    * touch of indexed rows. Ingest cost is one codegen'd encode+assign projection
    * over the batch plus a partitioned append; must equal a from-scratch rebuild
    * under the same models (spec-pinned).
    */
  def appendToIndex(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      ivfModel: Ivf.Model,
      pqModel: Model,
      path: String): Unit =
    withCodes(batch, idCol, vecCol, pqModel)
      .withColumn("cell", graft.functions.nearest_centroid(col("v"), ivfModel.centroids))
      .select("cell", "id", "codes")
      .write.partitionBy("cell").mode("append").parquet(path)

  /** Top-k over a written code index: reads ONLY the probed cell partitions and ONLY
    * the `m`-int code column; the exact re-rank fetches raw vectors from the base
    * `corpus` for just the ADC shortlist (≤ queries · refine · k rows — a bounded
    * semi-join against the vector store, never a second corpus scan of vectors).
    * Identical results to the in-memory [[topK]].
    */
  def topKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      ivfModel: Ivf.Model,
      pqModel: Model,
      nprobe: Int = 4,
      refine: Int = 16): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val probes = queryProbes(queries, idCol, vecCol, ivfModel, nprobe)
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0))
    val coded = spark.read.parquet(path)
      .filter(col("cell").isin(cells.map(Int.box): _*))
    val shortlist = adcShortlist(coded, probes, pqModel, k, refine)
    val vectors = corpus.select(col(idCol).as("id"),
      Similarity.normalized(col(vecCol).cast("array<double>")).as("v"))
    rerank(shortlist.join(vectors, "id"), k)
  }

  /** IVF-PQ top-k: IVF probes bound the candidate set, ADC over the code column
    * ranks it, and only the top `refine·k` candidates per query are re-ranked with
    * their exact vectors (output cosine is exact, so results are directly comparable
    * with [[Similarity.bruteForceTopK]] / [[Ivf.topK]]).
    */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      ivfModel: Ivf.Model,
      pqModel: Model,
      nprobe: Int = 4,
      refine: Int = 16): DataFrame = {
    require(refine >= 1, s"refine must be >= 1, got $refine")
    val coded = withCodes(corpus, idCol, vecCol, pqModel)
      .withColumn("cell", graft.functions.nearest_centroid(col("v"), ivfModel.centroids))
    val probes = queryProbes(queries, idCol, vecCol, ivfModel, nprobe)
    // the in-memory path already carries `v`, so the shortlist re-ranks in place
    rerank(adcShortlist(coded, probes, pqModel, k, refine), k)
  }

  /** Per-query probe cells with the normalized query vector attached. */
  private def queryProbes(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      ivfModel: Ivf.Model,
      nprobe: Int): DataFrame =
    queries
      .select(col(idCol).as("query_id"),
        Similarity.normalized(col(vecCol).cast("array<double>")).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(graft.functions.top_centroids(col("qv"), ivfModel.centroids, nprobe))
          .as("cell"))

  /** Top `refine·k` candidates per query by ADC score over the code column alone;
    * ties broken on id for determinism.
    */
  private def adcShortlist(
      coded: DataFrame,
      probes: DataFrame,
      pqModel: Model,
      k: Int,
      refine: Int): DataFrame = {
    val adc = coded.join(broadcast(probes), "cell")
      .filter(col("id") =!= col("query_id"))
      .withColumn("adc",
        graft.functions.pq_adc_score(col("codes"), col("qv"), pqModel.codebooks))
    val wApprox = Window.partitionBy("query_id").orderBy(desc("adc"), asc("id"))
    adc.withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= refine * k)
  }

  /** Exact-cosine re-rank of a shortlist carrying (query_id, qv, id, v). */
  private def rerank(shortlist: DataFrame, k: Int): DataFrame = {
    val wExact = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("id"))
    shortlist
      .withColumn("cosine", round(graft.functions.array_dot(col("v"), col("qv")), 6))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }
}
