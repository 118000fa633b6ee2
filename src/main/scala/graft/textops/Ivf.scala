package graft.textops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the corpus into `k`
  * Voronoi cells around trained centroids; a query scores only the rows of its
  * `nprobe` closest cells.
  *
  * Scale design: the index is ONE extra int column (`cell`) on the corpus — at 100 TB
  * you write it once (ideally partitionBy(cell) so probes prune files) and every query
  * batch is a broadcast join against its probe cells. Centroids are k×dim doubles —
  * driver-sized by construction. Training is Lloyd's algorithm with deterministic
  * seeding; iterations are plain Spark aggregations.
  */
object Ivf {

  case class Model(centroids: Array[Array[Double]])

  /** Deterministic k-means: seed centroids = the k corpus rows with smallest salted
    * PORTABLE uid hash (md5 of `id:seed`, the same cross-engine convention as the
    * minhash/sampling families — it lets an external engine replay training exactly,
    * which the `ann_ivf_topk` DuckDB oracle does), then `iters` Lloyd rounds (assign
    * via broadcast centroid table, recenter via per-dimension average).
    *
    * Training runs on a bounded seeded SAMPLE (`trainSampleRows`, the standard IVF
    * recipe — centroid quality needs a statistical picture of the distribution, not
    * every row): each Lloyd round costs O(sample·k·dim) instead of O(N·k·dim), so
    * fit cost is corpus-size-independent past the sample bound. The full corpus
    * still pays exactly ONE O(N·k·dim) assignment pass wherever the caller assigns
    * cells — that pass is the IVF contract, not a training artifact. Sampling only
    * engages above `2·trainSampleRows` rows, so small-corpus fits are unchanged.
    */
  def fit(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      seed: Long = 42L,
      trainSampleRows: Long = 100000L): Model = {
    require(trainSampleRows > 0, s"trainSampleRows must be positive, got $trainSampleRows")
    // full is deliberately NOT cached: it is scanned once for the count and once to
    // draw the sample — caching it would pin N normalized vectors for the whole
    // Lloyd loop, exactly the memory pressure the bounded sample avoids (callers
    // that reuse the corpus persist their own projection)
    val full = corpus.select(col(idCol).as("id"),
      Similarity.normalized(col(vecCol).cast("array<double>")).as("v"))
      // null / null-element vectors would NPE in the recenter collect — drop them
      // up front (the ArrayAvgAgg convention, same guard as Pq.fit/Pca.fit)
      .filter(col("v").isNotNull && !exists(col("v"), _.isNull))
    val n = full.count()
    val v =
      (if (n > 2 * trainSampleRows)
        full.sample(withReplacement = false,
          math.min(1.0, 1.2 * trainSampleRows / n), seed)
      else full).cache()
    try {
      // centroid INDEX = rank by hash: the order of this collect defines cell ids,
      // which ties and empty-cell carryover depend on — keep it sorted
      var centroids: Array[Array[Double]] = v
        .withColumn("h", md5(concat_ws(":", col("id").cast("string"), lit(seed.toString))))
        .orderBy("h").limit(k)
        .select("v").collect()
        .map(_.getSeq[Double](0).toArray)

      (1 to iters).foreach { _ =>
        val assigned = assign(v, centroids)
        // one (sum-vector, count) buffer per cell — the position-explode form
        // shuffled dim rows per member and reassembled arrays on the driver
        val means = assigned.groupBy("cell")
          .agg(graft.functions.array_avg_agg(col("v")).as("m"))
          .collect()
        val next = centroids.clone()
        means.foreach { r =>
          val arr = r.getSeq[Double](1).toArray
          // re-normalize so cell assignment stays a max-dot-product problem
          val nrm = math.sqrt(arr.map(x => x * x).sum)
          next(r.getInt(0)) = if (nrm > 0) arr.map(_ / nrm) else arr
        }
        // cells with no members keep their previous centroid (absent from `means`)
        centroids = next
      }
      Model(centroids)
    } finally v.unpersist()
  }

  /** k-means|| seeding (Bahmani et al., VLDB 2012) + Lloyd — the large-k fit path.
    * Plain [[fit]] seeds from k hash-uniform rows, which for large k lands several
    * seeds in the same dense region and wastes cells; k-means|| oversamples
    * candidates PROPORTIONAL TO SQUARED DISTANCE from the current set over a few
    * rounds, then reduces the weighted candidates to k. Every random draw is a
    * PORTABLE md5 fraction (the sampling-family convention), and the reduction is
    * a deterministic weighted farthest-point traversal — so an external engine
    * replays the entire fit, which the `ann_ivf_scalable_topk` DuckDB oracle does.
    *
    * Per round: one aggregation for ΣD² plus one filter-collect of the expected
    * `oversample·k` candidates — all distance math is a codegen'd `greatest` of
    * literal-centroid dots on the bounded training sample; the candidate set
    * (≤ 1 + rounds·oversample·k expected) and the k×k farthest-point reduction
    * are driver-sized by construction. Lloyd then runs exactly as [[fit]].
    */
  def fitScalable(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 2,
      rounds: Int = 3,
      oversample: Double = 2.0,
      seed: Long = 42L,
      trainSampleRows: Long = 100000L): Model = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(oversample > 0, s"oversample must be positive, got $oversample")
    // string ids: portable hashing and ordering for any id type
    val full = corpus.select(col(idCol).cast("string").as("id"),
      Similarity.normalized(col(vecCol).cast("array<double>")).as("v"))
      .filter(col("v").isNotNull && !exists(col("v"), _.isNull))
    val n = full.count()
    val l = oversample * k
    val v =
      (if (n > 2 * trainSampleRows)
        full.sample(withReplacement = false,
          math.min(1.0, 1.2 * trainSampleRows / n), seed)
      else full).cache()
    try {
      // candidate 0 = the smallest-md5 row (the portable "uniform" first pick)
      val first = v
        .withColumn("h", md5(concat_ws(":", col("id"), lit(seed.toString))))
        .orderBy("h").limit(1)
        .select(col("id"), col("v")).collect()
        .map(r => (0, r.getString(0), r.getSeq[Double](1).toArray))
      require(first.nonEmpty, "fitScalable: empty training set")
      var cands: Array[(Int, String, Array[Double])] = first
      def maxDot = { // codegen'd greatest of literal dots against current candidates
        val dots = cands.map { case (_, _, c) =>
          graft.functions.array_dot(col("v"), typedlit(c.toSeq)) }
        if (dots.length == 1) dots.head else greatest(dots: _*)
      }
      (1 to rounds).foreach { r =>
        val d2 = greatest(lit(0.0), lit(2.0) - lit(2.0) * maxDot)
        val sumD = v.agg(sum(d2).as("s")).collect()(0).getDouble(0)
        if (sumD > 0) {
          // independent md5-fraction draw per row and round: P(pick) = l·d²/ΣD²
          val frac = conv(substring(
            md5(concat_ws(":", col("id"), lit(seed.toString), lit(r.toString))),
            1, 8), 16, 10).cast("double") / lit(4294967296.0)
          val drawn = v.filter(frac < lit(l) * d2 / lit(sumD))
            .select(col("id"), col("v")).collect()
            .map(x => (r, x.getString(0), x.getSeq[Double](1).toArray))
          val known = cands.map(_._2).toSet
          cands = cands ++ drawn.filter(c => !known.contains(c._2)).sortBy(_._2)
        }
      }
      // weight candidates by their Voronoi population (ties → lowest ordinal,
      // the nearest_centroid convention; candidate order = (round, id))
      val candArr = cands.sortBy(c => (c._1, c._2)).map(_._3)
      val weights = new Array[Double](candArr.length)
      v.withColumn("cell", graft.functions.nearest_centroid(col("v"), candArr))
        .groupBy("cell").agg(count(lit(1)).as("w")).collect()
        .foreach(r => weights(r.getInt(0)) = r.getLong(1).toDouble)
      // deterministic weighted farthest-point reduction to k seeds: start at the
      // heaviest candidate, then repeatedly take argmax w·minDist² to the chosen
      // set (ties → lowest ordinal). Chosen ORDER defines the cell ids.
      val m = candArr.length
      require(m >= 1, "fitScalable: no candidates")
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
      val minD2 = Array.fill(m)(Double.MaxValue)
      var pick = weights.indices.maxBy(i => (weights(i), -i.toDouble))
      (0 until math.min(k, m)).foreach { t =>
        if (t > 0) {
          var best = -1
          var bestScore = -1.0
          var i = 0
          while (i < m) {
            if (!chosen.contains(i)) {
              val sc = weights(i) * minD2(i)
              if (sc > bestScore) { bestScore = sc; best = i }
            }
            i += 1
          }
          pick = best
        }
        chosen += pick
        val pv = candArr(pick)
        var i = 0
        while (i < m) {
          var dot = 0.0
          var j = 0
          while (j < pv.length) { dot += candArr(i)(j) * pv(j); j += 1 }
          val d = math.max(0.0, 2.0 - 2.0 * dot)
          if (d < minD2(i)) minD2(i) = d
          i += 1
        }
      }
      var centroids = chosen.map(candArr).toArray
      (1 to iters).foreach { _ =>
        val assigned = assign(v, centroids)
        val means = assigned.groupBy("cell")
          .agg(graft.functions.array_avg_agg(col("v")).as("m"))
          .collect()
        val next = centroids.clone()
        means.foreach { r =>
          val arr = r.getSeq[Double](1).toArray
          val nrm = math.sqrt(arr.map(x => x * x).sum)
          next(r.getInt(0)) = if (nrm > 0) arr.map(_ / nrm) else arr
        }
        centroids = next
      }
      Model(centroids)
    } finally v.unpersist()
  }

  /** Nearest-centroid assignment: one codegen'd argmax projection over the literal
    * centroid matrix — the broadcast-join + per-id window form shuffled k×N rows to
    * pick each row's maximum.
    */
  private def assign(v: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    v.withColumn("cell", graft.functions.nearest_centroid(col("v"), centroids))
      .select(col("id"), col("v"), col("cell"))

  /** Write the indexed corpus partitioned by cell. At corpus scale this is the
    * one-time index build: each Voronoi cell becomes a parquet directory, so probe
    * reads prune whole directories (partition pruning on the `cell` filter) instead
    * of scanning the corpus.
    */
  def writeIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      path: String): Unit =
    assign(
      corpus.select(col(idCol).as("id"),
        Similarity.normalized(col(vecCol).cast("array<double>")).as("v")),
      model.centroids)
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Day-2 index maintenance: assign a NEW batch of vectors to the EXISTING model's
    * cells and append them into the written index — no refit, no touch of the rows
    * already indexed. This is how a 100 TB embedding store grows daily: ingest cost
    * is O(batch·k·dim) assignment plus a partitioned append; queries keep pruning by
    * cell as before. (Centroid drift from distribution shift is the retrain signal —
    * a growing share of batch rows landing far from their centroid; refit then
    * rebuilds the index offline, exactly like the minhash band-index analogue.)
    * Results must equal a from-scratch index over base ∪ batch under the SAME model
    * — pinned by the `ann_ivf_incremental` full oracle.
    */
  def appendToIndex(
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      path: String): Unit =
    assign(
      batch.select(col(idCol).as("id"),
        Similarity.normalized(col(vecCol).cast("array<double>")).as("v")),
      model.centroids)
      .write.partitionBy("cell").mode("append").parquet(path)

  /** Top-k over a written index: reads ONLY the probed cell partitions. The probed
    * cell set is ≤ queries × nprobe (driver-sized by construction), so it becomes an
    * `IN` filter on the partition column and the scan never touches other cells.
    */
  def topKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      model: Model,
      nprobe: Int = 4): DataFrame = {
    val probes = queryProbes(queries, idCol, vecCol, model, nprobe)
    val cells = probes.select("cell").distinct().collect().map(_.getInt(0))
    val c = spark.read.parquet(path).filter(col("cell").isin(cells.map(Int.box): _*))
    rank(c, probes, k)
  }

  /** Per-query probe cells: the `nprobe` centroids with the largest dot product —
    * one codegen'd `TopCentroids` projection + explode (formerly a centroid
    * cross-join and a per-query ranking window; same (dot DESC, cell ASC) order).
    */
  private def queryProbes(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model,
      nprobe: Int): DataFrame =
    queries
      .select(col(idCol).as("query_id"),
        Similarity.normalized(col(vecCol).cast("array<double>")).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(graft.functions.top_centroids(col("qv"), model.centroids, nprobe))
          .as("cell"))

  private def rank(indexed: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = indexed.join(broadcast(probes), "cell")
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", round(graft.functions.array_dot(col("v"), col("qv")), 6))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** Top-k per query, probing the `nprobe` closest cells (in-memory assignment;
    * use [[writeIndex]] + [[topKFromIndex]] when the corpus is indexed on disk).
    */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      model: Model,
      nprobe: Int = 4): DataFrame = {
    val c = assign(
      corpus.select(col(idCol).as("id"),
        Similarity.normalized(col(vecCol).cast("array<double>")).as("v")),
      model.centroids)
    rank(c, queryProbes(queries, idCol, vecCol, model, nprobe), k)
  }
}
