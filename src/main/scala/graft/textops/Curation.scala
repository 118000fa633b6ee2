package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Caching.CacheSyntax

/** Corpus-curation operators for large-scale training-data pipelines: deterministic
  * hash sampling / domain mixing / train-val splits, token-budget sequence packing,
  * boilerplate detection and removal, benchmark-contamination checks, and PII
  * redaction. Designed scale-first:
  *
  *   - sampling and splits are pure filters over an md5-derived draw — no shuffle, no
  *     RNG state, reproducible on any engine (incl. the DuckDB correctness oracle);
  *   - packing windows are per-shard (a global order would serialize the cluster);
  *   - boilerplate / contamination sets are high-doc-frequency or benchmark n-grams —
  *     small by construction — and join broadcast, so the corpus side streams;
  *   - redaction is a codegen'd `regexp_replace` scan.
  */
object Curation {

  // ---- deterministic hash sampling -----------------------------------------

  /** Uniform draw in [0, 2^32) for `salt:key`, rendered as the first 8 hex digits of
    * the md5 — lexicographic comparison against [[rateThreshold]] keeps ~rate of rows
    * identically in any engine with md5.
    */
  def hashDraw(key: Column, salt: String): Column =
    substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 8)

  /** Hex threshold string for a keep rate: draws lexicographically below it are kept.
    * Rates ≥ 1 map to "g" — every 8-hex-digit draw sorts below it (hex digits < 'g'),
    * so the stratum is kept whole with the same single string comparison.
    */
  def rateThreshold(rate: Double): String = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    if (rate >= 1.0) "g" else f"${math.floor(rate * 4294967296.0).toLong}%08x"
  }

  /** Deterministic Bernoulli(rate) sample keyed on `key`. */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: String): DataFrame =
    if (rate >= 1.0) df else df.filter(hashDraw(key, salt) < lit(rateThreshold(rate)))

  /** Quality-weighted (importance) sampling: keep each row with its OWN probability
    * `probCol`, clamped to [0,1] — the keep-good-data-more-often knob of a curation
    * pipeline. Same md5 draw machinery as the fixed-rate samplers (shuffle-free,
    * reproducible, engine-portable); the draw fraction is `draw / 2^32`, exact in
    * double, so engines agree on every boundary. Round `probCol` consistently on
    * both engines when it is itself computed (sub-ULP drift at `draw == prob`
    * would otherwise flip a row).
    */
  def importanceSample(df: DataFrame, key: Column, probCol: Column, salt: String): DataFrame =
    df.filter(
      conv(hashDraw(key, salt), 16, 10).cast("double") / lit(4294967296.0) <
        least(greatest(probCol, lit(0.0)), lit(1.0)))

  /** Domain mixing: per-stratum deterministic downsampling toward target rates.
    * The draw column is referenced exactly once (the per-stratum ladder selects the
    * THRESHOLD, not the comparison) — Catalyst re-inlines a projected column's full
    * expression at every reference site inside a filter, so a when-ladder of
    * comparisons would compute the md5 once per stratum.
    */
  def stratifiedSample(
      df: DataFrame,
      key: Column,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double,
      salt: String): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(rateThreshold(defaultRate))) {
      case (acc, (s, r)) => when(stratum === s, lit(rateThreshold(r))).otherwise(acc)
    }
    df.filter(hashDraw(key, salt) < threshold)
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006): draw `n`
    * rows with inclusion probability proportional to `weight` by keying each row
    * with `u^(1/w)` — here its monotone log form `ln(u)/w` — for a deterministic
    * md5-uniform `u ∈ (0,1)`, and keeping the global top-`n` keys (ties broken by
    * `key`). The draw is `(draw32 + 0.5)/2^32`, exact in double, so any engine with
    * md5 reproduces the selection bit-for-bit.
    *
    * Scale design: a shuffle-free projection plus ONE TakeOrdered job (per-partition
    * top-n, then a driver merge of n·partitions rows) — the corpus is never globally
    * sorted and never shuffled. The key column is dropped from the output: selection
    * depends only on comparison ORDER, which survives sub-ulp `ln` differences
    * across engines far more robustly than hashed key VALUES would.
    */
  def weightedSample(
      df: DataFrame,
      key: Column,
      weight: Column,
      n: Int,
      salt: String): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val u = (conv(hashDraw(key, salt), 16, 10).cast("double") + 0.5) / lit(4294967296.0)
    df.withColumn("_es_key", log(u) / greatest(weight.cast("double"), lit(1e-12)))
      .orderBy(col("_es_key").desc, key)
      .limit(n)
      .drop("_es_key")
  }

  /** Temperature-scaled domain mixing — the `w_d ∝ n_d^α` recipe of LLM pretraining
    * mixtures (GPT-3/PaLM style): a target of `budgetRows` rows is split across
    * domains by softened size weights, so α < 1 UPSAMPLES small domains relative to
    * proportional sampling (α = 1 is proportional; α → 0 approaches uniform across
    * domains). Per-domain keep rate = `min(1, budget · n_d^(α−1) / Σ n_d^α)`, rounded
    * to 6 decimals so both engines agree on every draw boundary (counts are exact
    * integers; only the pow/divide is floating) — rates above 1 are capped, not
    * replicated (compose with [[epochMix]] for > 1 pass over a small domain).
    *
    * One bounded aggregation (domain count table, collected — #domains is
    * dashboard-sized by construction) feeds a literal rate ladder; the row filter is
    * the same shuffle-free md5 draw as every sampler here.
    */
  def temperatureMix(
      df: DataFrame,
      key: Column,
      stratum: Column,
      alpha: Double,
      budgetRows: Long,
      salt: String): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(budgetRows > 0, s"budgetRows must be positive, got $budgetRows")
    // a null stratum is unsampleable (the rate ladder's === never matches it), so
    // its rows drop like every null-key draw here — and it must not inflate the
    // weight total, nor NPE the driver sort below
    val counts = df.groupBy(stratum.cast("string").as("_stratum"))
      .agg(count(lit(1)).as("_n"))
      .collect()
      .filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // deterministic summation order for the weight total
    val totalW = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val rates = counts.map { case (s, n) =>
      s -> BigDecimal(math.min(1.0, budgetRows * math.pow(n.toDouble, alpha) / totalW / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rate = rates.foldLeft(lit(0.0)) {
      case (acc, (s, r)) => when(stratum.cast("string") === s, lit(r)).otherwise(acc)
    }
    df.filter(
      conv(hashDraw(key, salt), 16, 10).cast("double") / lit(4294967296.0) < rate)
  }

  /** Exactly `n` rows per stratum (or the whole stratum when smaller), chosen by the
    * deterministic md5 draw — the fixed-size-eval-set / per-domain-budget shape that
    * rate-based sampling can't give. Adds `draw_rank` (1-based within the stratum).
    * One window exchange per call; rows beyond rank `n` never survive the filter, and
    * the draw is reproducible on any engine with md5 (the DuckDB oracle re-derives
    * the same ranks digit for digit).
    */
  def sampleExactN(
      df: DataFrame,
      key: Column,
      stratumCols: Seq[Column],
      n: Int,
      salt: String): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(!df.columns.contains("draw_rank"),
      "sampleExactN adds a 'draw_rank' column; the input must not already contain one")
    val w = Window.partitionBy(stratumCols: _*).orderBy(hashDraw(key, salt), key)
    df.withColumn("draw_rank", row_number().over(w))
      .filter(col("draw_rank") <= n)
  }

  /** Deterministic train/validation assignment (adds a `split` column). */
  def assignSplit(df: DataFrame, key: Column, trainFrac: Double, salt: String): DataFrame =
    df.withColumn("split",
      when(hashDraw(key, salt) < lit(rateThreshold(trainFrac)), lit("train"))
        .otherwise(lit("val")))

  /** Deterministic global training order: every row gets a dense 1-based `position`
    * by (md5 draw, key) — the shuffle-the-corpus-once-before-sharding step of a
    * pretraining pipeline, reproducible on any engine with md5 (ties on the draw are
    * broken by the key, so the order is total and engine-independent).
    *
    * Scale: a GLOBAL row_number window would move the whole corpus through one
    * partition, so the numbering is split instead: the first two draw hex digits
    * form 256 buckets whose lexicographic order agrees with the full draw order;
    * one bounded count aggregation yields each bucket's cumulative offset
    * (driver-side, 256 rows), and the per-row number is `offset(bucket) +
    * row_number` over a window PARTITIONED by bucket — every partition numbers its
    * own slice in parallel. The md5 draw is uniform, so buckets are balanced by
    * construction (~N/256 each).
    */
  def globalShuffle(df: DataFrame, key: Column, salt: String): DataFrame = {
    require(!df.columns.contains("position"),
      "globalShuffle adds a 'position' column; the input must not already contain one")
    Seq("_draw", "_bucket", "_rn").foreach(c => require(!df.columns.contains(c),
      s"globalShuffle uses a reserved '$c' column; the input must not already contain one"))
    val withDraw = df
      .withColumn("_draw", hashDraw(key, salt))
      .withColumn("_bucket", substring(col("_draw"), 1, 2))
    val rawCounts = withDraw.groupBy("_bucket").agg(count(lit(1)).as("n")).collect()
    // a null key has no draw and no defined position; silently dropping rows from a
    // SHUFFLE would corrupt the training order, so fail loudly instead
    require(!rawCounts.exists(_.isNullAt(0)),
      "globalShuffle: null key rows have no position — filter them out first")
    val counts = rawCounts.map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return df.withColumn("position", lit(0L)).filter(lit(false))
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L) { case (acc, (_, n)) => acc + n })
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_bucket").orderBy(col("_draw"), key.cast("string"))
    // a bucket absent from the offset map means the input changed between the
    // count pass and the numbering pass (non-deterministic source, e.g. an
    // unseeded sample) — positions would silently come out null; fail loudly
    val offset = element_at(typedLit(offsets), col("_bucket"))
    withDraw
      .withColumn("_rn", row_number().over(w))
      .withColumn("position",
        when(offset.isNull, raise_error(concat(
          lit("globalShuffle: draw bucket not seen by the offset pass "),
          lit("(non-deterministic input?): "), col("_bucket"))))
          .otherwise(offset + col("_rn")))
      .drop("_draw", "_bucket", "_rn")
  }

  /** Curriculum training order: rows are bucketed by exact score percentiles
    * (easy→hard curriculum, e.g. score = token count for the classic length
    * curriculum), shuffled deterministically WITHIN each difficulty bucket, and
    * numbered bucket-major — so a reader streaming positions 1..N sees difficulty
    * rise while order inside a difficulty band stays unbiased.
    *
    * Scale shape mirrors [[globalShuffle]]: bucket boundaries come from one exact
    * percentile aggregate (swap in `percentile_approx` past ~10⁹ rows — noted in
    * SCALING.md), the (bucket, draw-prefix) offsets from one bounded count
    * aggregate, and numbering runs in a window PARTITIONED by (bucket,
    * draw-prefix) — never a single-partition global window.
    */
  def curriculumOrder(
      df: DataFrame,
      key: Column,
      score: Column,
      numBuckets: Int,
      salt: String): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    Seq("position", "bucket", "_draw", "_sub", "_rn").foreach(c =>
      require(!df.columns.contains(c),
        s"curriculumOrder uses a reserved '$c' column; the input must not already contain one"))
    // exact interior percentiles (the engine-portable aggregate ep5 pins against
    // quantile_cont); boundary b_i closes bucket i: score <= b_i → bucket <= i
    val probs = (1 until numBuckets).map(_.toDouble / numBuckets)
    // boundaries rounded to 6 decimals on BOTH engines before the comparison —
    // interpolated percentiles are the one floating step here, and an unrounded
    // boundary that lands exactly on a score value would make bucket membership
    // hinge on sub-ULP interpolation agreement
    val boundaries: Seq[Double] =
      if (probs.isEmpty) Seq.empty
      else df.select(score.cast("double").as("_s"))
        .agg(expr(s"percentile(_s, array(${probs.mkString(", ")}))").as("bs"))
        .collect()(0).getSeq[Double](0)
        .map(b => BigDecimal(b).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val bucket = boundaries.zipWithIndex.foldRight(lit(numBuckets - 1)) {
      case ((b, i), acc) => when(score.cast("double") <= b, lit(i)).otherwise(acc)
    }
    val withDraw = df
      .withColumn("bucket", bucket)
      .withColumn("_draw", hashDraw(key, salt))
      .withColumn("_sub", substring(col("_draw"), 1, 2))
    val rawCounts = withDraw.groupBy("bucket", "_sub")
      .agg(count(lit(1)).as("n")).collect()
    require(!rawCounts.exists(r => r.isNullAt(0) || r.isNullAt(1)),
      "curriculumOrder: null score or key rows have no position — filter them out first")
    val counts = rawCounts.map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L) { case (acc, (_, n)) => acc + n })
      .map { case ((b, s), off) => s"$b|$s" -> off }
      .toMap
    if (offsets.isEmpty) return withDraw.drop("_draw", "_sub")
      .withColumn("position", lit(0L)).filter(lit(false))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket", "_sub").orderBy(col("_draw"), key.cast("string"))
    val offset = element_at(typedLit(offsets),
      concat(col("bucket").cast("string"), lit("|"), col("_sub")))
    withDraw
      .withColumn("_rn", row_number().over(w))
      .withColumn("position", offset + col("_rn"))
      .drop("_draw", "_sub", "_rn")
  }

  /** Deterministic shard id in [0, numShards): first 8 md5 hex digits of
    * `salt:key`, parsed as an unsigned 32-bit value, mod `numShards` — engine-portable
    * (the DuckDB oracle reproduces it digit for digit) and stable across runs, so
    * re-sharding a grown corpus only moves rows whose keys changed.
    */
  def shardId(key: Column, numShards: Int, salt: String): Column = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    (conv(hashDraw(key, salt), 16, 10).cast("long") % numShards).cast("int")
  }

  /** Sharded training-corpus sink: assign deterministic shards and write
    * `partitionBy(shard)` parquet — the layout training jobs consume (one reader per
    * shard, partition-pruned access to any shard subset). Returns the corpus read
    * BACK from the written files, so callers aggregate manifests from what is
    * actually on disk. The shuffle-free assignment is a pure column expression; the
    * write itself fans rows to shard directories without a repartition (each task
    * writes the shards it holds — at cluster scale add `.repartition(col("shard"))`
    * upstream when one-file-per-shard output matters more than write parallelism).
    */
  def writeShards(
      df: DataFrame,
      key: Column,
      numShards: Int,
      path: String,
      salt: String): DataFrame = {
    // mirror AsofJoin's reserved-name check: never silently replace a user column
    require(!df.columns.contains("shard"),
      "writeShards adds a 'shard' column; the input must not already contain one")
    val sharded = df.withColumn("shard", shardId(key, numShards, salt))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  // ---- token-budget sequence packing ---------------------------------------

  /** Concatenate-then-chunk sequence packing: within each shard, documents are laid
    * end-to-end in `orderCol` order and assigned to the training sequence their first
    * token lands in (`seq_id = tokens_before / budget`). Adds `cum_before` and
    * `seq_id`. Sharding bounds the sequential window — a single global order would
    * funnel 100 TB through one partition; pack within (source, date, …) shards and
    * the window sort is per-shard.
    */
  def packSequences(
      df: DataFrame,
      tokensCol: Column,
      shardCols: Seq[Column],
      orderCol: Column,
      budget: Int): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shardCols: _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("cum_before", coalesce(sum(tokensCol).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("cum_before") / lit(budget)))
  }

  /** Keep the best `fraction` of each stratum by `scoreCol` (ties broken by
    * `tieCol` asc) — the "top X% by quality per domain" curation step. Keeps
    * `ceil(fraction · stratumSize)` rows, so a non-empty stratum always keeps ≥ 1.
    *
    * One shuffle: rank and stratum size come from two window functions over the SAME
    * partitioning, so Catalyst plans a single exchange + sort. Rank on a ROUNDED
    * score when the score is float-derived — the correctness oracle ranks the same
    * rounded value, and sub-ULP drift must not flip an ordering.
    *
    * Scale: the per-stratum sort is the inherent cost of exact ranking; when a
    * stratum outgrows a partition's sort budget, use [[keepTopFractionApprox]] (the
    * quantile-sketch path). This exact path IS the oracle-checkable contract.
    */
  def keepTopFraction(
      df: DataFrame,
      scoreCol: Column,
      stratumCols: Seq[Column],
      tieCol: Column,
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0,1], got $fraction")
    require(!df.columns.contains("qrank"),
      "keepTopFraction adds a 'qrank' column; the input must not already contain one")
    val w = Window.partitionBy(stratumCols: _*).orderBy(scoreCol.desc, tieCol.asc)
    val wAll = Window.partitionBy(stratumCols: _*)
    df.withColumn("qrank", row_number().over(w))
      .withColumn("stratum_n", count(lit(1)).over(wAll))
      .filter(col("qrank") <= ceil(col("stratum_n") * fraction))
      .drop("stratum_n")
  }

  /** Scale path for [[keepTopFraction]]: cut each stratum at its approximate
    * `1 − fraction` score quantile instead of ranking — one aggregation pass
    * (`percentile_approx` sketch per stratum) plus one broadcast-joined filter scan,
    * NO per-stratum sort. Keeps rows with score ≥ the threshold, so the kept count
    * is approximate where the sketch blurs the boundary (and ties at the threshold
    * all survive); `accuracy` is the `percentile_approx` knob (higher = tighter,
    * more sketch memory). Use the exact variant when the oracle-checkable
    * ceil(frac·n) contract matters; use this when a stratum outgrows a partition's
    * sort budget.
    *
    * Null handling matches the exact path's useful half: NULL stratum keys form
    * their own stratum (null-safe join), but NULL scores are dropped —
    * `percentile_approx` ignores them, so they have no defined cut; the exact path
    * ranks them last instead. Score your rows before cutting.
    */
  def keepTopFractionApprox(
      df: DataFrame,
      scoreCol: Column,
      stratumCols: Seq[Column],
      fraction: Double,
      accuracy: Int = 10000): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0,1], got $fraction")
    val internal = Seq("_score", "_cut") ++ stratumCols.indices.map(i => s"_st$i")
    val clashes = df.columns.toSeq.intersect(internal)
    require(clashes.isEmpty,
      s"keepTopFractionApprox uses internal column(s) ${clashes.mkString(", ")}")
    val keyed = df.withColumn("_score", scoreCol)
      .withColumns(stratumCols.zipWithIndex.map { case (c, i) => s"_st$i" -> c }.toMap)
    val keys = stratumCols.indices.map(i => s"_st$i")
    val cuts = keyed.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col("_score"), lit(1.0 - fraction), lit(accuracy))
        .as("_cut"))
    // null-SAFE join: a NULL stratum key is a stratum, not a dropped row
    val cond = keys.map(k => keyed(k) <=> cuts(k)).reduce(_ && _)
    keyed.join(broadcast(cuts), cond)
      .filter(col("_score") >= col("_cut"))
      // name-based drop removes BOTH sides' copies of the _st* join keys
      .drop((keys ++ Seq("_score", "_cut")): _*)
  }

  /** Epoch-based domain mixing (the "repeat under-represented domains" recipe):
    * stratum s is replicated `floor(epochs(s))` times, plus one more copy for the
    * deterministic `frac(epochs(s))` fraction of its rows (md5 draw keyed on `key`,
    * same contract as [[hashSample]]). Adds an `epoch` column (0-based copy index).
    * Epochs < 1 downsample (0 full copies + fractional draw) — [[stratifiedSample]]
    * with an epoch column.
    *
    * Shuffle-free: replication is a row-local `explode(sequence(...))`, the
    * fractional copy is a filtered union — both scans stream.
    */
  def epochMix(
      df: DataFrame,
      key: Column,
      stratum: Column,
      epochs: Map[String, Double],
      defaultEpochs: Double,
      salt: String): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 0), "epochs must be >= 0")
    require(!df.columns.contains("epoch"),
      "epochMix adds an 'epoch' column; the input must not already contain one")
    def ladder(f: Double => Column): Column =
      epochs.toSeq.sortBy(_._1).foldLeft(f(defaultEpochs)) {
        case (acc, (s, e)) => when(stratum === s, f(e)).otherwise(acc)
      }
    val whole = ladder(e => lit(math.floor(e).toLong))
    val fracThreshold = ladder(e => lit(rateThreshold(e - math.floor(e))))
    val full = df
      .withColumn("epoch",
        explode(when(whole >= 1, sequence(lit(0L), whole - 1))
          .otherwise(array().cast("array<bigint>"))))
    val fractional = df
      .filter(hashDraw(key, salt) < fracThreshold)
      .withColumn("epoch", whole)
    full.unionByName(fractional)
  }

  /** Per-document cross-entropy under a corpus-trained word-bigram language model —
    * the perplexity-style quality filter (CCNet/KenLM shape): documents whose token
    * transitions are improbable under the corpus distribution score high and get
    * filtered. Laplace-smoothed: P(w2|w1) = (n(w1,w2)+1) / (n1(w1)+V), with n1 the
    * bigram count starting at w1 and V the corpus distinct-token count. Returns
    * (id, n_bigrams, xent) with xent = mean −ln P over the document's bigrams
    * (0.0 with n_bigrams = 0 when the document has < 2 tokens); exact integer
    * counts divide into doubles identically on any engine.
    *
    * Scale shape: training is one bigram hash aggregate over the corpus; scoring
    * joins the exploded document bigrams against the model on the bigram key (the
    * model is vocabulary-sized — Catalyst broadcasts when it fits). Production
    * pipelines score against a FIXED stored model table — the same join, minus the
    * training aggregate. The shared bigram explode is persisted via the scoped
    * cache; every document bigram exists in a model trained on the same corpus, so
    * the scoring join is inner with no lost rows.
    */
  def bigramCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val bg = df.select(col(idCol),
        explode(TextOps.shingles(col(textCol), 2)).as("bigram"))
      .scopedPersist()
    val model = bg.groupBy("bigram").agg(count(lit(1)).as("n"))
    val firsts = model
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum("n").as("n1"))
    val v = df.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .agg(count_distinct(col("t"))).first().getLong(0)
    val scored = bg.join(model, "bigram")
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(firsts, "w1")
      .withColumn("nll",
        -log((col("n") + 1).cast("double") / (col("n1") + lit(v))))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg("nll"), 6).as("xent"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("xent"), lit(0.0)).as("xent"))
  }

  /** Mixture-weight solver: per-domain downsampling rates that hit a target token
    * mixture exactly while keeping the largest possible corpus — the step between
    * "we have these tokens per source" and the sampling rates `epochMix`/
    * `hashSample` consume. The binding domain is the one whose full inventory is
    * exhausted first: N = min_d(n_d / target_d) is the largest total budget whose
    * allocation target_d·N fits every domain, giving rate_d = target_d·N / n_d ≤ 1
    * with equality for the binding domain.
    *
    * Output: (domain, n_tokens, target_share, rate, expected_tokens). Fails loudly
    * in BOTH directions: on a corpus domain missing from `targets` (silently
    * dropping or zero-weighting it would corrupt the mixture) and on a target
    * domain with no corpus inventory (its share could never be filled, so every
    * reported rate would be a lie). One aggregation over the corpus, then
    * #domains-bounded driver reductions (the documented bounded boundary).
    */
  def mixtureWeights(
      df: DataFrame,
      domainCol: Column,
      weightCol: Column,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be non-empty with positive shares")
    val tot = targets.values.sum
    require(math.abs(tot - 1.0) < 1e-9, s"target shares must sum to 1, got $tot")
    val counts = df.groupBy(domainCol.as("domain"))
      .agg(sum(weightCol).cast("long").as("n_tokens"))
      .withColumn("target_share", element_at(typedLit(targets), col("domain")))
      .withColumn("target_share",
        when(col("target_share").isNull, raise_error(concat(
          lit("mixtureWeights: domain missing from targets: "), col("domain"))))
          .otherwise(col("target_share")))
      .scopedPersist() // read 3× below (observed set, nMax, final select)
    // symmetric fail-loud: a TARGET domain absent from the corpus is as corrupting
    // as a corpus domain absent from targets — the solver would report rates whose
    // realized mixture can never hit the documented shares (the missing domain's
    // share stays unfilled). Bounded: the counts table is #domains-sized.
    val observed = counts.select("domain").collect().map(_.getString(0)).toSet
    val unfillable = targets.keySet -- observed
    require(unfillable.isEmpty,
      s"mixtureWeights: target domains with no corpus inventory: " +
        unfillable.toSeq.sorted.mkString(", "))
    val nMax = counts
      .agg(min(col("n_tokens").cast("double") / col("target_share"))).first().getDouble(0)
    counts
      .withColumn("rate", col("target_share") * nMax / col("n_tokens"))
      .withColumn("expected_tokens",
        round(col("target_share") * nMax).cast("long"))
  }

  /** Per-doc cross-entropy under an interpolated Kneser–Ney bigram LM (Kneser &
    * Ney 1995; Chen & Goodman 1999) trained on the corpus itself — the smoothing
    * real LM-based quality filters (KenLM / CCNet-style) use, where the backoff
    * weight of a word is how many distinct CONTEXTS it follows, not its raw
    * frequency (so "Francisco" scores low outside "San Francisco" even though it
    * is frequent):
    *
    *   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1•) + D·N1+(w1•)/c(w1•) · N1+(•w2)/B
    *
    * with discount D, N1+(w1•) = distinct continuations of w1, N1+(•w2) = distinct
    * contexts preceding w2, B = total distinct bigram types. Scoring the training
    * corpus means every scored bigram occurs (c ≥ 1), so P > 0 without an OOV
    * floor.
    *
    * Scale shape: ONE bigram explode feeds the count table (persisted); context
    * and continuation statistics are two aggregations OVER THE TYPE TABLE (≪
    * occurrences); scoring joins occurrences back on the bigram key and the two
    * (smaller) w1/w2 keys. No windows, no driver state beyond the 1-row type
    * total.
    */
  def knBigramCrossEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val bg = df.select(col(idCol),
        explode(TextOps.shingles(col(textCol), 2)).as("bigram"))
      .scopedPersist()
    val types = bg.groupBy("bigram").agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .scopedPersist()
    val ctx = types.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("nf")) // nf = N1+(w1•)
    val cont = types.groupBy("w2").agg(count(lit(1)).as("nb")) // nb = N1+(•w2)
    val b = types.count().toDouble // bounded: one scalar
    val d = lit(discount)
    val scored = bg
      .join(types.select("bigram", "c12", "w1", "w2"), "bigram")
      .join(ctx, "w1")
      .join(cont, "w2")
      .withColumn("p",
        greatest(col("c12") - d, lit(0.0)) / col("c1") +
          d * col("nf") / col("c1") * (col("nb") / lit(b)))
      .withColumn("nll", -log(col("p")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg("nll"), 6).as("kn_xent"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("kn_xent"), lit(0.0)).as("kn_xent"))
  }

  /** Top-`k` TF-IDF keywords per document: tf = in-doc term count, idf = ln(N/df)
    * over document frequency, ranked by (rounded score desc, token asc). Returns
    * (id, keyword_rank, token, tfidf).
    *
    * Scale shape: one token explode feeds both the df aggregate and the tf
    * aggregate (persisted via [[graft.util.Caching]]); the join back to per-doc
    * terms is on the token key (broadcast when the vocabulary is small, shuffled
    * hash join otherwise — Catalyst's call); the rank window partitions by document,
    * bounded by per-doc distinct terms. Ranking uses the ROUNDED score so sub-ULP
    * `ln` differences between engines cannot flip an ordering.
    */
  def tfidfKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val n = df.count()
    val terms = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
      .scopedPersist()
    val dfreq = terms.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = terms.join(dfreq, "token")
      .withColumn("tfidf",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
    val w = Window.partitionBy(idCol).orderBy(desc("tfidf"), asc("token"))
    scored.withColumn("keyword_rank", row_number().over(w))
      .filter(col("keyword_rank") <= k)
      .select(col(idCol), col("keyword_rank"), col("token"), col("tfidf"))
  }

  // ---- passage chunking ----------------------------------------------------

  /** Overlapping token-window passages (RAG-style chunking): windows of
    * `windowTokens` starting every `strideTokens`, with a final partial window when
    * the tail doesn't align. One row per chunk: (id, chunk_index, n_tokens, chunk).
    * Row-local work only — the explode carries the token array, so chunks of one
    * document never cross partitions and no shuffle is introduced.
    */
  def chunkPassages(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int,
      strideTokens: Int): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0,
      s"window/stride must be positive, got $windowTokens/$strideTokens")
    // n_chunks = 1 + ceil(max(n - window, 0) / stride), docs with no tokens dropped
    val base = df.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
    val over = greatest(size(col("toks")) - windowTokens, lit(0))
    val nChunks =
      (lit(1) + floor((over + lit(strideTokens - 1)) / lit(strideTokens))).cast("int")
    base
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_index"))
      .select(col(idCol), col("chunk_index"),
        slice(col("toks"), col("chunk_index") * strideTokens + 1, lit(windowTokens)).as("w"))
      .select(col(idCol), col("chunk_index"),
        size(col("w")).as("n_tokens"), array_join(col("w"), " ").as("chunk"))
  }

  // ---- boilerplate ---------------------------------------------------------

  /** Per-document boilerplate share: the fraction of its distinct word n-gram
    * shingles whose corpus document-frequency is ≥ `minDocFreq`. The high-frequency
    * shingle set is small by construction and broadcast; the per-document side is one
    * explode + semi-join + count.
    *
    * Lifecycle: persists intermediates via [[graft.util.Caching]]; bracket
    * materialization in `Caching.withCached { ... }` to release exactly them.
    */
  def boilerplateShingleStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocFreq: Long): DataFrame = {
    // persisted: referenced by the doc-frequency agg, the per-doc count, and the
    // boilerplate semi-join — without it the shingle explode scan re-executes 3×
    // (released by the caller's Caching.withCached bracket)
    val sh = df.select(col(idCol),
        explode(TextOps.distinctShingles(col(textCol), n)).as("shingle"))
      .scopedPersist()
    val boiler = sh.groupBy("shingle").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocFreq)
      .select("shingle")
    val perDoc = sh.groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
    val boilerPerDoc = sh.join(broadcast(boiler), Seq("shingle"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_boiler"))
    perDoc.join(boilerPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
  }

  /** Remove lines whose corpus document-frequency exceeds `maxDocFreq` (CCNet-style
    * boilerplate stripping: navbars, cookie banners, license headers). Rebuilds each
    * document from its surviving lines in original order; returns
    * (id, text, n_removed). The boilerplate line set (doc-freq > maxDocFreq) is small
    * and broadcast for the anti-join.
    */
  def removeBoilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      delim: String,
      maxDocFreq: Long): DataFrame = {
    // `split` takes a REGEX: quote the delimiter so "|" or "." split literally
    val delimRe = java.util.regex.Pattern.quote(delim)
    // persisted: the line explode feeds both the doc-frequency aggregate and the
    // anti-join — without it the corpus split+posexplode scan executes twice
    // (released by the caller's Caching.withCached bracket)
    val lines = df.select(col(idCol), posexplode(split(col(textCol), delimRe)))
      .toDF(idCol, "pos", "line")
      .scopedPersist()
    val boiler = lines.groupBy("line")
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .filter(col("doc_freq") > maxDocFreq)
      .select("line")
    val kept = lines.join(broadcast(boiler), Seq("line"), "left_anti")
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("line")))).as("parts"))
      .select(col(idCol),
        array_join(transform(col("parts"), p => p.getField("line")), delim).as(textCol))
    df.select(col(idCol), size(split(col(textCol), delimRe)).as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col(textCol), lit("")).as(textCol),
        (col("n_lines") - coalesce(size(split(col(textCol), delimRe)), lit(0)))
          .as("n_removed"))
  }

  // ---- vocabulary ----------------------------------------------------------

  /** Word-level vocabulary: the `topK` most frequent tokens with deterministic ids
    * (rank by count desc, then token asc). The heavy part is one explode + hash
    * aggregation with map-side combine; the ranking window runs over the top-K rows
    * only (K is bounded), never the full token table.
    */
  def buildVocab(df: DataFrame, textCol: Column, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = df.select(explode(TextOps.tokens(textCol)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token"))
      .limit(topK)
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(desc("n"), asc("token"))))
  }

  /** Byte-pair-encoding merge training (Sennrich et al. 2016): learn the `numMerges`
    * highest-count symbol merges over the corpus word vocabulary. Returns one row per
    * merge: (merge_rank, left, right, pair_count), deterministic (ties break on the
    * symbol pair lexicographically).
    *
    * Scale design — the shape every real BPE trainer uses: the CORPUS-sized work is
    * one distributed word-count aggregation; the merge loop then runs on the driver
    * over the BOUNDED word vocabulary (top `maxVocabWords` by count — beyond it the
    * frequency tail cannot influence top merges materially), so iteration cost is
    * independent of corpus size. Words are split to characters with a terminal
    * `</w>` marker, so merges never cross word boundaries.
    */
  def trainBpeMerges(
      df: DataFrame,
      textCol: Column,
      numMerges: Int,
      maxVocabWords: Int = 100000): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(TextOps.tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w"))
      .limit(maxVocabWords)
      .as[(String, Long)].collect()
    // vocab as mutable symbol sequences; counts never change, only the splits do
    val reps = words.map { case (w, n) => (w.map(_.toString).toArray :+ "</w>", n) }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= numMerges && continue) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      reps.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts(k) = pairCounts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) continue = false
      else {
        val ((l, r), n) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, l, r, n))
        val merged = l + r
        reps.indices.foreach { i =>
          val (syms, cnt) = reps(i)
          if (syms.length > 1) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += merged; j += 2
              } else { out += syms(j); j += 1 }
            }
            reps(i) = (out.toArray, cnt)
          }
        }
        rank += 1
      }
    }
    merges.result().toDF("merge_rank", "left", "right", "pair_count")
  }

  /** Encode each document's tokens as vocabulary ids (OOV → `unkId`). The vocabulary
    * (e.g. from [[buildVocab]]) is bounded by construction, so it collects to a
    * driver map and rides the [[graft.expressions.VocabEncode]] expression — one
    * codegen'd hash probe per token, no join against the corpus.
    */
  def encodeTokens(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      unkId: Int = 0): DataFrame = {
    val m = vocab.select(col("token"), col("token_id")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    df.select(col(idCol),
      graft.functions.vocab_encode(TextOps.tokens(col(textCol)), m, unkId)
        .as("token_ids"))
  }

  /** Decodes token ids back to tokens — the inverse of [[encodeTokens]], same
    * bounded-vocabulary expression shape (ids the vocab doesn't cover → `unkToken`).
    */
  def decodeTokens(
      df: DataFrame,
      idCol: String,
      idsCol: String,
      vocab: DataFrame,
      unkToken: String = "<unk>"): DataFrame = {
    val m = vocab.select(col("token"), col("token_id")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    df.select(col(idCol),
      graft.functions.vocab_decode(col(idsCol), m, unkToken).as("tokens"))
  }

  /** Applies a bounded, rank-ordered BPE merge list to the corpus:
    * `(id, bpe_tokens array<string>, n_bpe)`. The merge table rides the codegen'd
    * [[graft.expressions.BpeEncode]] expression — one row-local encode per document,
    * no join, no shuffle; pair with [[trainBpeMerges]] for the train→apply loop.
    */
  def bpeApply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    df.select(col(idCol),
        graft.functions.bpe_encode(TextOps.tokens(col(textCol)), merges).as("bpe_tokens"))
      .withColumn("n_bpe", size(col("bpe_tokens")))

  /** [[bpeApply]] from a trained merges table (`merge_rank, left, right, …` as
    * produced by [[trainBpeMerges]]) — bounded by construction (≤ numMerges rows).
    */
  def bpeApply(df: DataFrame, idCol: String, textCol: String,
      mergesDf: DataFrame): DataFrame =
    bpeApply(df, idCol, textCol,
      mergesDf.select(col("merge_rank"), col("left"), col("right"))
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  // ---- unigram-LM (SentencePiece-style) tokenizer --------------------------

  /** Candidate-piece seeding for unigram-LM training: every substring of length
    * 1..`maxPieceLen` of every corpus word, weighted by the word's count — the
    * corpus-sized step of training, fully relational (one word-count aggregation +
    * a bounded per-word substring explode; blow-up ≤ len·maxPieceLen per word). The
    * word array binds to a lambda variable by attribute reference, so nothing
    * recomputes per element.
    */
  def unigramSeedCandidates(
      df: DataFrame,
      textCol: Column,
      maxPieceLen: Int = 8,
      maxVocabWords: Int = 100000): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val words = df.select(explode(TextOps.tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w"))
      .limit(maxVocabWords)
    val pieces = flatten(transform(sequence(lit(1), length(col("w"))),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(col("w")) - i + 1)),
        l => col("w").substr(i, l))))
    words.select(explode(pieces).as("piece"), col("n"))
      .groupBy("piece").agg(sum("n").as("weighted_count"))
  }

  /** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece model): learn a
    * `vocabSize` piece → log-probability table by hard (Viterbi) EM over the corpus
    * word vocabulary.
    *
    * Scale shape — the same architecture as [[trainBpeMerges]] and what real
    * SentencePiece does: the CORPUS-sized work is one distributed word-count
    * aggregation (top `maxVocabWords` by count); seeding, the EM loop, and pruning
    * run on the driver over that BOUNDED vocabulary, so iteration cost is
    * independent of corpus size. Each E-step Viterbi-segments every vocab word with
    * the IDENTICAL code the serve expression runs
    * ([[graft.expressions.UnigramEncode.segment]]); the M-step refits piece
    * log-probs with Laplace smoothing; pruning keeps the `vocabSize` highest-usage
    * pieces (all single characters always survive, so every word stays
    * segmentable). Deterministic throughout: ties sort (-count, piece).
    *
    * Returns (piece, logprob, piece_rank) — logprob rounded to 6 like every
    * cross-engine float surface.
    */
  def trainUnigramLm(
      df: DataFrame,
      textCol: Column,
      vocabSize: Int = 1000,
      seedSize: Int = 5000,
      maxPieceLen: Int = 8,
      emIters: Int = 3,
      maxVocabWords: Int = 100000): DataFrame = {
    require(vocabSize >= 1 && seedSize >= vocabSize && emIters >= 1,
      s"trainUnigramLm: vocabSize=$vocabSize seedSize=$seedSize emIters=$emIters")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(explode(TextOps.tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w"))
      .limit(maxVocabWords)
      .as[(String, Long)].collect()
    // seed: substring counts over the bounded vocab (driver replica of
    // unigramSeedCandidates restricted to the same words)
    val cand = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, n) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= math.min(maxPieceLen, w.length - i)) {
          val p = w.substring(i, i + l)
          cand(p) = cand.getOrElse(p, 0L) + n
          l += 1
        }
        i += 1
      }
    }
    val singles = cand.keysIterator.filter(_.length == 1).toSet
    val seed = cand.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize).map(_._1).toSet ++ singles
    def toTable(lp: Map[String, Double]): java.util.HashMap[String, java.lang.Double] = {
      val m = new java.util.HashMap[String, java.lang.Double](lp.size * 2)
      lp.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
      m
    }
    // init log-probs from raw candidate frequency
    val seedTotal = seed.iterator.map(cand).sum.toDouble
    var probs: Map[String, Double] =
      seed.iterator.map(p => p -> math.log(cand(p) / seedTotal)).toMap
    var lastCounts: Seq[(String, Long)] = Seq.empty
    (1 to emIters).foreach { _ =>
      val table = toTable(probs)
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, n) =>
        graft.expressions.UnigramEncode
          .segment(w, table, graft.expressions.UnigramEncode.UnkLogprob, maxPieceLen)
          .foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      // prune to the vocabSize highest-usage pieces; single chars always survive
      // (count 0 if currently unused — smoothing keeps their prob finite)
      val kept = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
        .map(_._1).toSet ++ singles
      val total = kept.iterator.map(p => counts.getOrElse(p, 0L)).sum.toDouble
      probs = kept.iterator
        .map(p => p -> math.log((counts.getOrElse(p, 0L) + 1.0) / (total + kept.size)))
        .toMap
      lastCounts = kept.toSeq.map(p => p -> counts.getOrElse(p, 0L))
    }
    lastCounts.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, _), i) =>
        (p, BigDecimal(probs(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          i + 1)
      }
      .toDF("piece", "logprob", "piece_rank")
  }

  /** Viterbi-encode each document with a trained piece table (from
    * [[trainUnigramLm]]) — bounded table rides the codegen'd
    * [[graft.expressions.UnigramEncode]] expression, no join against the corpus.
    * Emits `(id, pieces array<string>, n_pieces)`.
    */
  def unigramApply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      piecesDf: DataFrame,
      maxPieceLen: Int = 8): DataFrame = {
    val m = piecesDf.select(col("piece"), col("logprob")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.select(col(idCol),
        graft.functions.unigram_encode(TextOps.tokens(col(textCol)), m, maxPieceLen)
          .as("pieces"))
      .withColumn("n_pieces", size(col("pieces")))
  }

  // ---- benchmark contamination ---------------------------------------------

  /** Benchmark-contamination stats: for each corpus document, the number and fraction
    * of its distinct word n-gram shingles that appear anywhere in the benchmark set.
    * The benchmark shingle set is broadcast (eval sets are tiny next to a pretraining
    * corpus); the corpus side is one explode + semi-join + count.
    *
    * Lifecycle: persists intermediates via [[graft.util.Caching]]; bracket
    * materialization in `Caching.withCached { ... }` to release exactly them.
    */
  def contaminationStats(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.distinctShingles(col(textCol), n)).as("shingle"))
      .distinct()
    // persisted: the corpus shingle scan feeds both the overlap count and the
    // per-doc shingle count
    val sh = corpus.select(col(idCol),
        explode(TextOps.distinctShingles(col(textCol), n)).as("shingle"))
      .scopedPersist()
    val overlap = sh.join(broadcast(benchShingles), Seq("shingle"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
    sh.groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
  }

  /** Corpus-wide paragraph-level exact dedup (RefinedWeb/CCNet-style): every
    * paragraph keeps only its FIRST occurrence across the whole corpus (first =
    * smallest `(id, position)`), and each document is rebuilt from its surviving
    * paragraphs in order. Catches boilerplate and partial copies that document-level
    * dedup misses; a fully-duplicated document comes back empty.
    *
    * Scale shape: one shuffle partitioned by the paragraph hash (the ranking window
    * runs per identical-paragraph group, bounded by that paragraph's occurrence
    * count) and one groupBy(id) to rebuild — both plain hash shuffles of the
    * paragraph stream, no joins against the corpus text.
    */
  def dedupParagraphs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      delim: String): DataFrame = {
    val delimRe = java.util.regex.Pattern.quote(delim)
    val paras = df
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), delimRe)).as(Seq("pos", "para")))
      .filter(length(trim(col("para"))) > 0)
    val firstWin = Window.partitionBy(md5(col("para"))).orderBy("id", "pos")
    // one groupBy over the ranked frame computes totals, survivors, and the rebuilt
    // text together (collect_list skips the nulls the `when` leaves for losers)
    val agg = paras
      .withColumn("rk", row_number().over(firstWin))
      .groupBy("id")
      .agg(count(lit(1)).as("n_paras"),
        count(when(col("rk") === 1, lit(1))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rk") === 1,
              struct(col("pos"), col("para"))))),
            _.getField("para")),
          delim).as("text_deduped"))
    // anchor on the input so empty / delimiter-only documents survive as (0, 0, "")
    df.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  /** Doc ids whose shingle set intersects the benchmark's — exact, via a Bloom
    * prefilter. The benchmark shingle set is built into a Bloom filter with ONE
    * distributed aggregate (only the fixed-size filter bytes reach the driver — never
    * the shingle set itself), the corpus shingle stream is cut down by a codegen'd
    * `might_contain` scalar filter (no shuffle, no hash relation: the filter is
    * `-n·ln(p)/ln(2)²` bits — ~1.2 GB for 10⁹ shingles at 1% fpp, vs 100s of GB for a
    * broadcast hash set), and only the surviving ~fpp fraction pays the exact
    * verification semi-join. False positives are removed by the verify step, so the
    * result is exact; false negatives don't exist by Bloom construction.
    *
    * Scale contrast with [[contaminationStats]]: that broadcasts the benchmark
    * shingle set as a hash relation (right for eval-set-sized benchmarks); this path
    * is for decontaminating against *large* held-out corpora where a hash relation
    * would not fit but a bit array does.
    *
    * Lifecycle: persists intermediates via [[graft.util.Caching]]; bracket
    * materialization in `Caching.withCached { ... }` to release exactly them.
    */
  def bloomContaminatedIds(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      fpp: Double = 0.01): DataFrame = {
    val benchShingles = benchmark
      .select(explode(TextOps.distinctShingles(col(textCol), n)).as("shingle"))
      .distinct()
      .scopedPersist()
    // sizing count + build agg both ride the persisted scan
    val expected = math.max(1L, benchShingles.count())
    val bloomBytes = benchShingles
      .agg(graft.functions.bloom_filter_agg(xxhash64(col("shingle")), expected, fpp)
        .as("bloom"))
      .head().getAs[Array[Byte]](0)
    val candidates = corpus
      .select(col(idCol), explode(TextOps.distinctShingles(col(textCol), n)).as("shingle"))
      .filter(graft.functions.bloom_might_contain(lit(bloomBytes), xxhash64(col("shingle"))))
    // NO broadcast hint on the verify join: the stated use case is a benchmark set
    // too large for a hash relation, so the survivors (a ~fpp fraction) meet it in a
    // shuffled semi-join; Catalyst still picks broadcast on its own for small sets
    candidates.join(benchShingles, Seq("shingle"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Corpus minus benchmark-contaminated documents (exact; see
    * [[bloomContaminatedIds]] for the Bloom-prefilter scale design).
    */
  def bloomDecontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      fpp: Double = 0.01): DataFrame =
    corpus.join(bloomContaminatedIds(corpus, benchmark, idCol, textCol, n, fpp),
      Seq(idCol), "left_anti")

  // ---- snapshot diff -------------------------------------------------------

  /** Corpus-version diff: classify every id across two snapshots as `added`,
    * `removed`, `changed`, or `unchanged` by comparing an md5 over `contentCols`.
    * The release-gating step between corpus versions ("what moved since v1?"):
    * one full-outer equi-join on the id — the single shuffle the comparison
    * fundamentally needs (stage both snapshots bucketed on the id to elide it) —
    * with content hashed DOWN to 16 bytes per side before the join, so the network
    * cost is ids + digests, never the documents themselves.
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "snapshotDiff needs at least one content column")
    def hashed(df: DataFrame, side: String) =
      df.select(col(idCol),
        md5(concat_ws("", contentCols.map(col): _*)).as(s"_h_$side"))
    hashed(oldSnap, "old").join(hashed(newSnap, "new"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h_old").isNull, "added")
          .when(col("_h_new").isNull, "removed")
          .when(col("_h_old") === col("_h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The k-row DSIR log-ratio table as a bounded driver map (k doubles) — the
    * trained artifact a serving/streaming gate rides. Same math as [[dsirScores]].
    */
  def dsirLogRatios(
      raw: DataFrame,
      target: DataFrame,
      textCol: String,
      k: Int = 256): Map[Long, Double] = {
    def bucketCounts(df: DataFrame) = df
      .select(explode(dsirFeatures(col(textCol), k)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ct = bucketCounts(target)
    val cr = bucketCounts(raw)
    val (nT, nR) = (ct.values.sum, cr.values.sum)
    (0L until k.toLong).map { b =>
      b -> (math.log((ct.getOrElse(b, 0L) + 1).toDouble / (nT + k)) -
        math.log((cr.getOrElse(b, 0L) + 1).toDouble / (nR + k)))
    }.toMap
  }

  /** Row-local DSIR score: the bounded log-ratio table rides the expression — no
    * join, no shuffle, streaming-safe. The table is a DENSE ARRAY literal indexed by
    * bucket, not a map literal: Catalyst probes a map literal by LINEAR key scan
    * (k comparisons per gram — measured 4× slower on the stream gate at k=256),
    * while an array literal is O(1) positional access. Round-6 like every
    * cross-engine float. Matches [[dsirScores]] up to summation order.
    */
  def dsirScoreColumn(textCol: Column, lr: Map[Long, Double], k: Int): Column = {
    val lrArr = typedLit((0L until k.toLong).map(b => lr.getOrElse(b, 0.0)))
    round(aggregate(dsirFeatures(textCol, k), lit(0.0),
      (acc, b) => acc + element_at(lrArr, (b + 1).cast("int"))), 6)
  }

  // ---- k-anonymity release gate --------------------------------------------

  /** k-anonymity gate over quasi-identifier columns: a row is releasable only when
    * at least `k` rows share its full quasi-identifier combination — the standard
    * pre-release privacy screen (rare combinations re-identify). ONE quasi-keyed
    * window (partition-parallel; partitions are group-sized), and window
    * partitioning groups NULLs together, so null quasi-values gate correctly.
    */
  def kAnonymityGate(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1)
    val w = Window.partitionBy(quasiCols.map(col): _*)
    df.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("k_anonymous", col("group_size") >= k)
  }

  /** Applies a CDC changelog to a base snapshot — the MERGE/upsert semantics every
    * incremental corpus store needs: `changelog` rows carry `(idCol, seqCol, opCol ∈
    * {I,U,D})` plus the base's content columns; for each id only the HIGHEST-seq
    * change applies (ties broken by `opCol` descending — make `seqCol` unique per id
    * upstream for fully defined semantics). `D` deletes the row, `I`/`U` replace its
    * content, untouched base rows pass through.
    *
    * Scale shape: one changelog-keyed window (partitions are per-id change counts,
    * never corpus-sized) + one full-outer id join against the base. Bucket both
    * sides on the id to make the daily apply exchange-free.
    */
  def applyChangelog(
      base: DataFrame,
      changelog: DataFrame,
      idCol: String,
      seqCol: String,
      opCol: String): DataFrame = {
    val contentCols = base.columns.filterNot(_ == idCol).toSeq
    require(contentCols.forall(changelog.columns.contains),
      s"changelog must carry the base content columns ${contentCols.mkString(", ")}")
    val w = Window.partitionBy(col(idCol)).orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changelog
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col(idCol) +: col(opCol).as("_op") +:
        contentCols.map(c => col(c).as(s"_new_$c")): _*)
    base.join(latest, Seq(idCol), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
      .select(col(idCol) +: contentCols.map(c =>
        when(col("_op").isNotNull, col(s"_new_$c")).otherwise(col(c)).as(c)): _*)
  }

  /** Incremental maintenance of a per-group (count, sum) materialized aggregate from
    * a CDC changelog — the day-2 path that keeps a 100 TB rollup fresh WITHOUT
    * re-aggregating the base table: work ∝ |changelog|, not |base|.
    *
    * The changelog collapses to the latest op per id (same MERGE collapse as
    * [[applyChangelog]], so the two stay consistent: non-D ops upsert, D deletes).
    * Each touched id contributes −(old row) and, unless deleted, +(new row) to its
    * group's delta; the bounded delta table then outer-merges into `oldAgg`.
    * Groups whose count reaches zero are dropped (they no longer exist in the
    * recomputed aggregate either).
    *
    * Scale note: the only base-table touch is the id-key join probing OLD values of
    * touched ids — with the base bucketed by id ([[graft.sources.BucketedTables]])
    * that probe is shuffle-free on the base side; it is never a re-aggregation.
    * Result == `applyChangelog(base, changelog).groupBy(group).agg(...)`, which the
    * spec and the DuckDB oracle both pin.
    *
    * `oldAgg` must carry (groupCol, n_rows, val_sum) — i.e. the output of this same
    * aggregation on the previous snapshot, which is what "materialized" means here.
    */
  def incrementalAggMaintain(
      base: DataFrame,
      oldAgg: DataFrame,
      changelog: DataFrame,
      idCol: String,
      seqCol: String,
      opCol: String,
      groupCol: String,
      valueCol: String): DataFrame = {
    require(Seq(groupCol, "n_rows", "val_sum").forall(oldAgg.columns.contains),
      s"oldAgg must carry ($groupCol, n_rows, val_sum), got ${oldAgg.columns.mkString(", ")}")
    val w = Window.partitionBy(col(idCol)).orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changelog
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col(idCol), col(opCol).as("_op"),
        col(groupCol).as("_new_g"), col(valueCol).cast("long").as("_new_v"))
    val touched = base
      .select(col(idCol), col(groupCol).as("_old_g"), col(valueCol).cast("long").as("_old_v"))
      .join(latest, Seq(idCol), "right")
    val minus = touched.filter(col("_old_g").isNotNull)
      .select(col("_old_g").as(groupCol), lit(-1L).as("dc"), (-col("_old_v")).as("dv"))
    val plus = touched.filter(col("_op") =!= "D")
      .select(col("_new_g").as(groupCol), lit(1L).as("dc"), col("_new_v").as("dv"))
    val delta = minus.unionByName(plus)
      .groupBy(col(groupCol)).agg(sum("dc").as("dc"), sum("dv").as("dv"))
    oldAgg.join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("n_rows"),
        (coalesce(col("val_sum"), lit(0L)) + coalesce(col("dv"), lit(0L))).as("val_sum"))
      .filter(col("n_rows") > 0)
  }

  // ---- DSIR data selection -------------------------------------------------

  /** Hashed n-gram feature buckets (unigrams + adjacent bigrams) of `textCol`,
    * md5-prefix-hashed into [0, k) — portable: any engine (incl. the DuckDB oracle)
    * reproduces the bucket ids exactly.
    */
  def dsirFeatures(textCol: Column, k: Int): Column = {
    // BIND the token array to a lambda variable before using it: referencing the
    // tokens() expression directly inside the transform lambdas would re-evaluate
    // the regex split per ELEMENT (O(tokens²) splits per doc — measured 7× slower
    // at sf0.1). A 1-element transform is the expression-level let-binding.
    element_at(transform(array(TextOps.tokens(textCol)), t => {
      val bigrams = when(size(t) >= 2,
        zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
          (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>"))
      transform(concat(t, bigrams),
        g => conv(substring(md5(g), 1, 4), 16, 10).cast("long") % k)
    }), 1)
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): score each raw document by how much more likely its
    * hashed n-gram features are under a TARGET domain sample than under the raw
    * corpus — `score(doc) = Σ_grams [ln p_target(bucket) − ln p_raw(bucket)]` with
    * Laplace-smoothed bucket categoricals. Feed the (exp of the) score to
    * [[weightedSample]] for the paper's importance-resampling draw, or threshold it.
    *
    * Scale shape: two hash aggregations build the k-bucket count tables, the
    * k-row log-ratio table broadcasts, and the per-doc score is one explode +
    * broadcast-join + sum — corpus-sized work is one token-stream pass; nothing
    * iterates. Zero-gram documents score 0 (left-join backfill).
    */
  def dsirScores(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 256): DataFrame = {
    require(k > 0)
    import graft.util.Caching.CacheSyntax
    // the raw corpus's exploded (id, bucket) features feed BOTH the corpus bucket
    // counts and the per-doc scoring join — tokenize+hash once, not twice
    val rawFeatures = raw
      .select(col(idCol), explode(dsirFeatures(col(textCol), k)).as("bucket"))
      .scopedPersist()
    val ct = target
      .select(explode(dsirFeatures(col(textCol), k)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("nt"))
    val cr = rawFeatures.groupBy("bucket").agg(count(lit(1)).as("nr"))
    // totals: two 1-row collects (bounded driver boundary, BM25-constant pattern)
    val nT = ct.agg(coalesce(sum("nt"), lit(0L))).head().getLong(0)
    val nR = cr.agg(coalesce(sum("nr"), lit(0L))).head().getLong(0)
    val buckets = raw.sparkSession.range(k).select(col("id").as("bucket"))
    val lr = buckets
      .join(ct, Seq("bucket"), "left").join(cr, Seq("bucket"), "left")
      .select(col("bucket"),
        (log((coalesce(col("nt"), lit(0L)) + 1).cast("double") / (nT + k).toDouble) -
          log((coalesce(col("nr"), lit(0L)) + 1).cast("double") / (nR + k).toDouble))
          .as("lr"))
    val scored = rawFeatures
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(idCol).agg(sum("lr").as("_s"))
    raw.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), round(coalesce(col("_s"), lit(0.0)), 6).as("dsir_score"))
  }

  // ---- PII redaction -------------------------------------------------------

  /** Email address pattern — restricted to the lookahead-free subset so Java regex
    * (Spark) and RE2 (the DuckDB oracle) agree match-for-match.
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 pattern (word-bounded; both engines support `\b`). */
  val Ipv4Pattern: String = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  /** Redacted copy of `text`: emails → `<EMAIL>` first (so their host dots can never
    * be re-matched), then IPv4s → `<IP>`. One codegen'd scan, no UDFs.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      Ipv4Pattern, "<IP>")

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))

  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** C4-style blocklist flags: a document is dropped when its source/domain is on the
    * blocked-source list or its (lowercased, whitespace) token stream contains any
    * blocked word. Adds `source_blocked`, `blocked_word_count`, and the surviving
    * `kept` flag.
    *
    * Scale design: both lists ride the plan as literal IN-sets evaluated by codegen'd
    * expressions at scan speed — no join, no shuffle. This is the right shape for the
    * published blocklists (UT1 ~couple-thousand domains, C4's word list ~400 entries);
    * a blocklist too large for plan literals should instead become a broadcast
    * semi-join on the source key, same output contract.
    */
  def blocklistFlags(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      blockedSources: Seq[String],
      blockedWords: Seq[String]): DataFrame = {
    require(blockedSources.nonEmpty || blockedWords.nonEmpty,
      "blocklistFlags needs at least one blocked source or word")
    val words = typedLit(blockedWords.map(_.toLowerCase))
    val blockedCount =
      if (blockedWords.isEmpty) lit(0L)
      else size(filter(TextOps.tokens(col(textCol)),
        t => array_contains(words, lower(t)))).cast("long")
    val srcBlocked =
      if (blockedSources.isEmpty) lit(false)
      else col(sourceCol).isInCollection(blockedSources)
    df.withColumn("source_blocked", srcBlocked)
      .withColumn("blocked_word_count", blockedCount)
      .withColumn("kept", !col("source_blocked") && col("blocked_word_count") === 0)
  }

  /** Cross-source quantile normalization (the calibration step before pooling
    * heterogeneously-scored sources): replace each row's score with the POOLED
    * corpus quantile at the row's within-group rank, so "top 10% of source A"
    * and "top 10% of source B" land on the same calibrated value even when one
    * source's scorer runs hot. The classic quantile-normalization recipe at a
    * fixed bin resolution:
    *
    *   1. pooled histogram over `bins` equal-width bins on [lo, hi] (ONE
    *      aggregation; the cumulative pass runs over `bins` rows, bounded);
    *   2. rank grid: for g in 1..bins, the pooled bin where the CDF first
    *      reaches g/bins (a bins x bins join of two BOUNDED tables);
    *   3. per-group cume_dist (partitioned window — the only row-scale pass,
    *      one exchange+sort per group, same shape as [[keepTopFraction]]);
    *   4. broadcast equi-join of ceil(cume_dist * bins) against the grid.
    *
    * Calibrated values are bin RIGHT EDGES, so resolution is (hi-lo)/bins.
    * Rank on a ROUNDED score (ties share a cume_dist, deterministically) —
    * sub-ULP drift must not flip an ordering, as everywhere in this module.
    */
  def quantileNormalize(
      df: DataFrame,
      scoreCol: Column,
      groupCols: Seq[Column],
      tieCol: Column,
      bins: Int = 100,
      lo: Double = 0.0,
      hi: Double = 1.0): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(hi > lo, s"hi ($hi) must exceed lo ($lo)")
    val width = (hi - lo) / bins
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val binned = df.withColumn("_qnbin",
      least(greatest(floor((scoreCol - lit(lo)) / lit(width)), lit(0)),
        lit(bins - 1)).cast("int"))
    // bounded: `bins` rows — the single-partition windows here are by design
    val wc = Window.orderBy("_qnbin").rowsBetween(Window.unboundedPreceding, 0)
    val wt = Window.orderBy("_qnbin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cdf = binned.groupBy("_qnbin").agg(count(lit(1)).as("_n"))
      .withColumn("_cdf", sum("_n").over(wc) / sum("_n").over(wt))
      .select(col("_qnbin"), col("_cdf"))
    import spark.implicits._
    val grid = (1 to bins).toDF("_g")
      .join(broadcast(cdf), col("_cdf") >= col("_g").cast("double") / bins)
      .groupBy("_g").agg(min("_qnbin").as("_calbin"))
      .withColumn("calibrated",
        round(lit(lo) + (col("_calbin") + 1) * lit(width), 6))
      .select(col("_g"), col("calibrated"))
    val wg = Window.partitionBy(groupCols: _*).orderBy(scoreCol.asc, tieCol.asc)
    df.withColumn("_g", ceil(cume_dist().over(wg) * bins).cast("int"))
      .join(broadcast(grid), Seq("_g"))
      .drop("_g")
  }

  /** INTRA-document repeated-line removal (the C4/Gopher rewrite step, as
    * opposed to [[dedupParagraphs]]' corpus-wide first-wins): within each
    * document, keep the FIRST occurrence of every exact line and drop later
    * repeats — boilerplate headers/footers and copy-pasted spans collapse
    * without any cross-document state. One explode + one (id, line)-partitioned
    * window + one per-id rebuild aggregation; blank lines pass through
    * untouched (they are structure, not content).
    * Output: (id, n_lines, n_dropped, text).
    */
  def dedupLinesWithinDoc(
      df: DataFrame,
      idCol: String,
      textCol: String,
      delim: String = "\n"): DataFrame = {
    val delimRe = java.util.regex.Pattern.quote(delim)
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), delimRe)).as(Seq("pos", "line")))
    val w = Window.partitionBy(col("id"), col("line")).orderBy(col("pos"))
    lines
      .withColumn("_rk",
        when(length(trim(col("line"))) === 0, lit(1)) // blanks always survive
          .otherwise(row_number().over(w)))
      .groupBy("id")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("_rk") > 1, 1L).otherwise(0L)).as("n_dropped"),
        array_join(ds_sort_collect(), delim).as("text"))
  }

  // ordered rebuild: collect (pos, line) of survivors, sort by pos, emit lines
  private def ds_sort_collect() = {
    import org.apache.spark.sql.functions._
    transform(
      sort_array(collect_list(when(col("_rk") === 1,
        struct(col("pos"), col("line"))))),
      s => s.getField("line"))
  }
}
