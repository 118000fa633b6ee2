package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distributed sketches — the approximate-statistics layer a 100 TB profile
  * pass runs INSTEAD of exact aggregation when the key space itself is too large to
  * shuffle (vocabulary size per language, per-domain cardinalities, heavy hitters over
  * a token stream).
  *
  * All hashing is portable md5 (the repo-wide convention — see
  * [[graft.textops.Dedup]]), so a DuckDB oracle replays every register/bucket EXACTLY:
  * the sketches are deterministic functions of the data, not of partitioning, task
  * order, or JVM hash seeds. That is also what makes them mergeable artifacts — two
  * register tables built on different clusters (or different days) union+max/sum into
  * the register table of the union of the inputs, which the specs pin.
  *
  * Scale design: a sketch's register table is BOUNDED (m=1024 registers per group for
  * HLL, depth×width=2048 cells for CMS) regardless of input rows, so the only
  * full-data pass is a map-side-combined groupBy over (group, register) — the shuffle
  * carries at most |groups|·m rows. No driver state, no collect.
  */
object Sketches {

  /** HLL register count m = 2^10. At m=1024 the standard error ≈ 1.04/√m ≈ 3.3%. */
  val HllM = 1024

  /** α₁₀₂₄ bias constant, computed from the same closed form the oracle SQL inlines. */
  val HllAlpha: Double = 0.7213 / (1.0 + 1.079 / HllM)

  private val TwoP53 = 9007199254740992.0 // 2^53, exact in double

  /** HyperLogLog register table: one row per (groupCols, bucket) with the max rank
    * ρ = 1 + leading-zeros of the 52-bit hash suffix. Deterministic: bucket and rank
    * both derive from md5(value). Mergeable by union → groupBy → max(register).
    *
    * Bucket = first 12 hash bits mod m; rank field = next 52 bits (13 hex chars), so
    * bucket and rank are independent. `bin()` gives the bit length exactly on both
    * engines (no floating log2 at power-of-two boundaries).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame =
    hllProject(df, groupCols, value)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).cast("int").as("register"))

  /** The stateless per-value projection under [[hllRegisters]]: (groupCols, bucket,
    * rho). Exposed so the STREAMING path can apply the identical expressions and run
    * the max-aggregation with streaming state — running max is monotone, so a
    * streaming update-mode agg lands on exactly the batch register table.
    */
  def hllProject(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val hex = md5(value.cast("string"))
    val bucket = conv(substring(hex, 1, 3), 16, 10).cast("long") % HllM
    val w = conv(substring(hex, 4, 13), 16, 10).cast("long")
    val rho = when(w === 0, lit(53L)).otherwise(lit(53L) - length(bin(w)).cast("long"))
    df.select(groupCols.map(col) ++ Seq(bucket.as("bucket"), rho.as("rho")): _*)
  }

  /** Cardinality estimate from a register table. The register sum is kept in INTEGER
    * arithmetic (Σ 2^(53−ρ_j) as BIGINT — exact, order-independent; max term 2^52,
    * max sum m·2^52 = 2^62 < 2^63) so Spark and the oracle agree bit-for-bit before
    * the single double division. Small-range correction (linear counting) applies
    * below 2.5m when empty registers remain, per the published HLL recipe.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val g = registers.groupBy(groupCols.map(col): _*).agg(
      sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - register)")).as("s"),
      count(lit(1)).as("nonzero"))
    val zeros = lit(HllM) - col("nonzero")
    val raw = lit(HllAlpha * HllM * HllM) * lit(TwoP53) /
      (zeros.cast("double") * lit(TwoP53) + col("s").cast("double"))
    val est = when(raw <= lit(2.5 * HllM) && zeros > 0,
      lit(HllM.toDouble) * log(lit(HllM.toDouble) / zeros.cast("double"))).otherwise(raw)
    g.select(groupCols.map(col) ++ Seq(
      round(est, 6).as("hll_estimate"), col("nonzero").cast("long").as("filled_registers")): _*)
  }

  /** Count-min sketch cell table from EXACT per-key counts (the normal build path at
    * scale: keys were already combined map-side, so the sketch build touches
    * |distinct keys| rows, not |events|). `depth` independent md5 rows, `width`
    * buckets each → depth·width bounded cells. Mergeable by union → sum.
    */
  /** Pairwise set-overlap estimates from ONE register table by inclusion–exclusion:
    * est(A∩B) = est(A) + est(B) − est(A∪B), where the union's registers are the
    * bucketwise MAX of the two groups' registers — the mergeable-sketch move that
    * turns an all-pairs corpus-overlap matrix into register arithmetic (no pairwise
    * joins over the data, ever; the only inputs are the bounded per-group register
    * tables). Groups pair as a < b (string order). Estimates can be slightly
    * negative for truly disjoint sets (estimator noise) — callers clamp if needed.
    */
  def hllPairwiseOverlap(registers: DataFrame, groupCol: String): DataFrame = {
    val pairs = registers.select(col(groupCol).as("ga")).distinct()
      .join(registers.select(col(groupCol).as("gb")).distinct(), col("ga") < col("gb"))
    val sideA = pairs.join(registers.withColumnRenamed(groupCol, "ga"), Seq("ga"))
    val sideB = pairs.join(registers.withColumnRenamed(groupCol, "gb"), Seq("gb"))
      .select("ga", "gb", "bucket", "register")
    val unionRegs = sideA.select("ga", "gb", "bucket", "register")
      .unionByName(sideB)
      .groupBy("ga", "gb", "bucket").agg(max("register").cast("int").as("register"))
    val estU = hllEstimate(unionRegs, Seq("ga", "gb"))
      .select(col("ga"), col("gb"), col("hll_estimate").as("est_union"))
    val estG = hllEstimate(registers, Seq(groupCol))
    estU
      .join(estG.select(col(groupCol).as("ga"), col("hll_estimate").as("est_a")), Seq("ga"))
      .join(estG.select(col(groupCol).as("gb"), col("hll_estimate").as("est_b")), Seq("gb"))
      .select(col("ga"), col("gb"), col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 6).as("est_overlap"))
  }

  /** The md5 bucket for CMS hash row `j`. */
  private def cmsBucket(j: Int, key: Column, width: Int): Column =
    conv(substring(md5(concat(lit(s"$j:"), key)), 1, 8), 16, 10).cast("long") % width

  /** Per-occurrence (row_j, bucket) projection for all `depth` hash rows — the
    * streaming ingest shape: a streaming sum over this projection maintains the
    * identical cell table [[cmsSketch]] builds from batch counts (linearity).
    */
  def cmsProject(keys: DataFrame, keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"cmsProject: depth=$depth width=$width")
    (0 until depth).map { j =>
      keys.select(lit(j).as("row_j"), cmsBucket(j, col(keyCol), width).as("bucket"))
    }.reduce(_ unionByName _)
  }

  def cmsSketch(counts: DataFrame, keyCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"cmsSketch: depth=$depth width=$width")
    val rows = (0 until depth).map { j =>
      counts.select(lit(j).as("row_j"),
        cmsBucket(j, col(keyCol), width).as("bucket"),
        col(cntCol).cast("long").as("cnt"))
    }
    rows.reduce(_ unionByName _)
      .groupBy("row_j", "bucket").agg(sum("cnt").as("cell"))
  }

  /** Point-query estimates: for each probe key, min over the `depth` cells it hashes
    * to. The sketch is tiny (depth·width cells) and broadcast; CMS guarantees
    * estimate ≥ true count, with overshoot bounded by collisions. */
  def cmsEstimate(probes: DataFrame, sketch: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    val hashed = (0 until depth).map { j =>
      probes.select(col(keyCol), lit(j).as("row_j"),
        cmsBucket(j, col(keyCol), width).as("bucket"))
    }.reduce(_ unionByName _)
    hashed.join(broadcast(sketch), Seq("row_j", "bucket"))
      .groupBy(keyCol).agg(min("cell").as("cms_estimate"))
  }

  // ------------------------------------------------------- quantile sketch

  /** Slot count k for the quantile sample sketch: rank standard error ≈
    * 0.5/√k ≈ 1.6 % of n at k=1024 — the data-card/profiling accuracy class.
    */
  val QsSlots = 1024

  /** Mergeable QUANTILE sketch — the missing family member next to HLL/CMS, for
    * the per-group distributions ([[quantileBins]], robust stats) that are exact
    * and per-group memory-bound at 100 TB.
    *
    * Design: a slot-minimum sample. md5(rowKey)'s first 12 bits pick one of
    * [[QsSlots]] slots; the remaining 29 hex chars are the row's in-slot priority
    * `h`; per (group, slot) the sketch keeps the minimum-`h` row's value — a
    * hash-stratified uniform row sample of ≤ k rows per group. Quantiles are the
    * sample's order statistics.
    *
    * Why not a literal KLL/t-digest: their compactors consume items in insertion
    * order, so the summary depends on partitioning and task order — it can be
    * neither bit-deterministic across runs nor replayed by a SQL oracle, and two
    * differently-ordered builds of the same data disagree. The slot-minimum
    * sample trades KLL's O(1/k) rank error for O(1/√k) and buys back the three
    * properties every sketch in this module guarantees:
    *
    *   - deterministic: a pure function of the row SET (md5-driven, like
    *     [[hllRegisters]]), invariant under partitioning/order — DuckDB replays
    *     every slot;
    *   - merge ≡ union, EXACTLY: min is associative/commutative/idempotent, so
    *     compact(sketch(A) ∪ sketch(B)) = sketch(A ∪ B) bit-for-bit ([[qsketchMerge]]);
    *   - streaming-maintainable: min-only state is monotone, so a streaming
    *     update-mode aggregation lands on exactly the batch sketch (the
    *     `stream_hll_distinct` pattern — `StreamOps.streamingQuantileSketch`).
    *
    * Scale shape: ONE map-side-combined groupBy — the shuffle carries at most
    * |groups|·k rows regardless of input size; no window, no sort, no driver state.
    *
    * `rowKey` should be unique per row (it is the sample's randomness source);
    * rows sharing a key tie on `h` and deterministically keep the smaller value
    * (the struct MIN is lexicographic over (h, v)), i.e. duplicates collapse to
    * one sample candidate. Rows with a NULL rowKey or NULL value are excluded —
    * they carry no sample information (see [[qsketchProject]]).
    */
  def qsketch(df: DataFrame, groupCols: Seq[String], value: Column, rowKey: Column): DataFrame =
    qsketchCompact(qsketchProject(df, groupCols, value, rowKey), groupCols)

  /** The stateless per-row projection under [[qsketch]]: (groupCols, slot, h, v).
    * Exposed for the streaming path, which applies these identical expressions and
    * maintains the min under streaming state.
    */
  def qsketchProject(df: DataFrame, groupCols: Seq[String], value: Column, rowKey: Column): DataFrame = {
    val hex = md5(rowKey.cast("string"))
    val slot = conv(substring(hex, 1, 3), 16, 10).cast("long") % QsSlots
    // NULL rowKey/value rows carry no sample information and would otherwise
    // produce a phantom (group, null-slot) cell (md5(NULL) = NULL) that inflates
    // n_slots and enters the quantile array — drop them up front (oracles mirror
    // this with `WHERE k IS NOT NULL AND v IS NOT NULL`)
    df.filter(rowKey.isNotNull && value.cast("double").isNotNull)
      .select(groupCols.map(col) ++ Seq(
        slot.as("slot"), substring(hex, 4, 29).as("h"), value.cast("double").as("v")): _*)
  }

  /** Canonical compaction: per (group, slot), the lexicographic struct-MIN keeps
    * the minimum-`h` row and its value in one agg. Idempotent — a sketch table is
    * a fixed point.
    */
  def qsketchCompact(rows: DataFrame, groupCols: Seq[String]): DataFrame =
    rows.groupBy((groupCols :+ "slot").map(col): _*)
      .agg(min(struct(col("h"), col("v"))).as("m"))
      .select(groupCols.map(col) ++ Seq(
        col("slot"), col("m.h").as("h"), col("m.v").as("v")): _*)

  /** Merge any number of sketch tables (different clusters, different days):
    * union + recompact ≡ the sketch of the unioned inputs, exactly.
    */
  def qsketchMerge(parts: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    qsketchCompact(parts.reduce(_ unionByName _), groupCols)

  /** Quantile estimates from a sketch table: per group, the sample's order
    * statistic at index ⌈q·m⌉ (1-based, clamped; m = filled slots). The sketch is
    * ≤ k rows per group, so the sort_array/collect_list here is bounded — never
    * row-scale. `qs` maps output column name → quantile.
    */
  def qsketchQuantiles(sketch: DataFrame, groupCols: Seq[String], qs: Seq[(String, Double)]): DataFrame = {
    val g = sketch.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_slots"),
        sort_array(collect_list(struct(col("v"), col("h")))).as("arr"))
    val ests = qs.map { case (name, q) =>
      val idx = least(col("n_slots"), greatest(lit(1L), ceil(lit(q) * col("n_slots"))))
      round(try_element_at(col("arr"), idx.cast("int")).getField("v"), 6).as(name)
    }
    g.select(groupCols.map(col) ++ (col("n_slots") +: ests): _*)
  }

  /** Exact per-group quartile boundaries + per-row bin assignment: the feature
    * discretization a data card / mixing policy runs over doc length. Uses Spark's
    * EXACT `percentile` (type-7 linear interpolation — the same definition DuckDB's
    * `quantile_cont` implements); boundaries are rounded to 6 decimals BEFORE the
    * comparison on BOTH engines so a cross-engine ulp in the interpolation can never
    * flip a row's bin. One agg over the data + one broadcast join back.
    */
  def quantileBins(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val q = df.groupBy(col(groupCol)).agg(
      round(expr(s"percentile($valueCol, 0.25D)"), 6).as("q1"),
      round(expr(s"percentile($valueCol, 0.5D)"), 6).as("q2"),
      round(expr(s"percentile($valueCol, 0.75D)"), 6).as("q3"))
    val v = col(valueCol).cast("double")
    df.join(broadcast(q), Seq(groupCol))
      .withColumn("bin",
        when(v <= col("q1"), 0).when(v <= col("q2"), 1)
          .when(v <= col("q3"), 2).otherwise(3))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol).cast("long")).as("bin_min"),
        max(col(valueCol).cast("long")).as("bin_max"))
  }
}
