package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.textops.TextOps

/** Generation-quality evaluation metrics — the reference-based scores an LLM eval
  * harness computes over (candidate, reference) pairs at corpus scale: sentence
  * BLEU (Papineni et al. 2002), ROUGE-N (Lin 2004), chrF (Popović 2015), and
  * SQuAD-style token F1 / exact match (Rajpurkar et al. 2016), plus the
  * distinct-n diversity profile (Li et al. 2016) over generations.
  *
  * All four pair metrics share ONE row-local core,
  * [[graft.expressions.NgramOverlapStats]]: both texts live in the same row, so
  * every order's clipped multiset intersection Σ_g min(c_cand, c_ref) and both
  * totals come from a single codegen'd pass — the metrics are pure projections
  * with ZERO shuffles, joins, or windows, and scale exactly like a scan. (The
  * first cut exploded grams through a (pair, n, gram) hash-count + equi-join;
  * the 4× scale smoke measured that 4.7× superlinear on chrF — SCALING.md r9 —
  * which is what forced the row-local design.)
  */
object GenEval {

  /** Word n-grams (whitespace tokens, single-pass expression). */
  def wordGrams(c: Column, n: Int): Column = TextOps.shingles(c, n)

  /** Character n-grams over the whitespace-stripped string (chrF convention). */
  def charGrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.CharShingles(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n))

  /** The per-pair overlap-stats array (length maxN) — one codegen'd pass. */
  private def overlap(candCol: Column, refCol: Column, maxN: Int, charMode: Boolean): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.NgramOverlapStats(
        org.apache.spark.sql.graftbridge.Bridge.expression(candCol),
        org.apache.spark.sql.graftbridge.Bridge.expression(refCol),
        maxN, charMode))

  /** Per-pair clipped n-gram overlap statistics for every n in `ns`:
    * `(pair_id, n, matched, cand_total, ref_total)` where
    * `matched = Σ_gram min(count_cand, count_ref)` (the clipped / multiset
    * intersection count every n-gram metric is built from) and the totals are the
    * sides' n-gram counts. One row-local expression + a row-local generator —
    * pairs with no grams on a side get explicit zeros from the expression itself.
    * `ns` must be the contiguous prefix 1..max (every caller's shape).
    */
  def clippedNgramStats(
      pairs: DataFrame,
      idCol: Column,
      candCol: Column,
      refCol: Column,
      ns: Seq[Int],
      charMode: Boolean = false): DataFrame = {
    require(ns.nonEmpty && ns == (1 to ns.max),
      s"ns must be the contiguous prefix 1..max, got $ns")
    pairs
      .select(idCol.as("pair_id"),
        explode(overlap(candCol, refCol, ns.max, charMode)).as("t"))
      .select(col("pair_id"), col("t.n").as("n"), col("t.matched").as("matched"),
        col("t.cand_total").as("cand_total"), col("t.ref_total").as("ref_total"))
  }

  /** Sentence BLEU per pair, orders 1..`maxN`, with add-one smoothing on orders
    * ≥ 2 (Lin & Och 2004): p₁ = m₁/t₁ (0 when the candidate is empty),
    * pₙ = (mₙ+1)/(tₙ+1) for n ≥ 2, brevity penalty exp(1 − ref/cand) when the
    * candidate is shorter, and BLEU = BP·exp(Σₙ ln pₙ / maxN) — forced to 0 when
    * p₁ = 0 (no unigram overlap means no credit, per the original definition).
    *
    * Output: `(pair_id, cand_len, ref_len, bp, bleu)`.
    */
  def bleu(
      pairs: DataFrame,
      idCol: Column,
      candCol: Column,
      refCol: Column,
      maxN: Int = 4): DataFrame = {
    // ONE row-local expression; every derived score is a fixed-order projection
    val base = pairs.select(idCol.as("pair_id"),
      overlap(candCol, refCol, maxN, charMode = false).as("st"))
    def m(k: Int) = element_at(col("st"), k).getField("matched")
    def t(k: Int) = element_at(col("st"), k).getField("cand_total")
    def p(k: Int): Column =
      if (k == 1)
        when(t(1) === 0, lit(0.0)).otherwise(m(1).cast("double") / t(1))
      else (m(k) + lit(1)).cast("double") / (t(k) + lit(1))
    // ln(0) is NULL in Spark; the 1e-300 floor keeps the sum defined — the
    // p1=0 branch below overrides anything the floor contributed
    val logsum = (1 to maxN)
      .map(k => log(greatest(p(k), lit(1e-300)))).reduce(_ + _)
    val bp = when(col("cand_len") === 0, lit(0.0))
      .when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("ref_len").cast("double") / col("cand_len")))
    base
      .withColumn("cand_len", t(1))
      .withColumn("ref_len", element_at(col("st"), 1).getField("ref_total"))
      .withColumn("bp", bp)
      .select(col("pair_id"), col("cand_len"), col("ref_len"), col("bp"),
        when(p(1) === 0, lit(0.0))
          .otherwise(col("bp") * exp(logsum / maxN)).as("bleu"))
  }

  /** Corpus-level BLEU per group (the sacrebleu default): order counts are SUMMED
    * over the group's pairs FIRST (integer sums — partitioning-invariant by
    * construction), then one closed form: pₙ = Mₙ/Tₙ unsmoothed (any zero matched
    * or total order forces BLEU 0, the standard corpus behavior), BP from the
    * summed lengths. ONE overlap pass + ONE hash aggregation per group.
    * Output: `(group, n_pairs, cand_len, ref_len, bp, bleu)`.
    */
  def corpusBleu(
      pairs: DataFrame,
      groupCol: Column,
      candCol: Column,
      refCol: Column,
      maxN: Int = 4): DataFrame = {
    val base = pairs.select(groupCol.as("group"),
      overlap(candCol, refCol, maxN, charMode = false).as("st"))
    val aggs =
      count(lit(1)).as("n_pairs") +:
        sum(element_at(col("st"), 1).getField("ref_total")).as("ref_len") +:
        (1 to maxN).flatMap(k => Seq(
          sum(element_at(col("st"), k).getField("matched")).as(s"m_$k"),
          sum(element_at(col("st"), k).getField("cand_total")).as(s"t_$k")))
    val agg = base.groupBy("group").agg(aggs.head, aggs.tail: _*)
    val anyZero = (1 to maxN)
      .map(k => col(s"m_$k") === 0 || col(s"t_$k") === 0)
      .reduce(_ || _)
    val logsum = (1 to maxN)
      .map(k => log(greatest(col(s"m_$k").cast("double") / col(s"t_$k"), lit(1e-300))))
      .reduce(_ + _)
    val bp = when(col("t_1") === 0, lit(0.0))
      .when(col("t_1") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("ref_len").cast("double") / col("t_1")))
    agg
      .withColumn("bp", bp)
      .select(col("group"), col("n_pairs"), col("t_1").as("cand_len"), col("ref_len"),
        col("bp"),
        when(anyZero, lit(0.0))
          .otherwise(col("bp") * exp(logsum / maxN)).as("bleu"))
  }

  /** ROUGE-N per (pair, n): clipped precision `m/t_cand`, recall `m/t_ref`, and
    * their F1 (all 0 where the denominator is 0).
    * Output: `(pair_id, n, matched, precision, recall, f1)`.
    */
  def rougeN(
      pairs: DataFrame,
      idCol: Column,
      candCol: Column,
      refCol: Column,
      ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    val st = clippedNgramStats(pairs, idCol, candCol, refCol, ns)
    val prec = when(col("cand_total") === 0, lit(0.0))
      .otherwise(col("matched").cast("double") / col("cand_total"))
    val rec = when(col("ref_total") === 0, lit(0.0))
      .otherwise(col("matched").cast("double") / col("ref_total"))
    st.withColumn("precision", prec)
      .withColumn("recall", rec)
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .select("pair_id", "n", "matched", "precision", "recall", "f1")
  }

  /** chrF per pair (Popović 2015): character n-grams of the whitespace-stripped
    * strings for n = 1..`maxN`, chrP/chrR = the arithmetic mean over orders of the
    * per-order clipped precision/recall (orders where a side has no grams
    * contribute 0 — the fixed-denominator convention keeps the mean defined and
    * deterministic), chrF_β = (1+β²)·P·R / (β²·P + R), 0 when both are 0.
    * Output: `(pair_id, chr_p, chr_r, chrf)`.
    */
  def chrF(
      pairs: DataFrame,
      idCol: Column,
      candCol: Column,
      refCol: Column,
      maxN: Int = 4,
      beta: Double = 2.0): DataFrame = {
    val base = pairs.select(idCol.as("pair_id"),
      overlap(candCol, refCol, maxN, charMode = true).as("st"))
    def mm(k: Int) = element_at(col("st"), k).getField("matched")
    def tc(k: Int) = element_at(col("st"), k).getField("cand_total")
    def tr(k: Int) = element_at(col("st"), k).getField("ref_total")
    def pv(k: Int) = when(tc(k) === 0, lit(0.0))
      .otherwise(mm(k).cast("double") / tc(k))
    def rv(k: Int) = when(tr(k) === 0, lit(0.0))
      .otherwise(mm(k).cast("double") / tr(k))
    val b2 = beta * beta
    // fixed-order means over the per-order columns — ULP-deterministic projection
    base
      .select(col("pair_id"),
        ((1 to maxN).map(pv).reduce(_ + _) / maxN).as("chr_p"),
        ((1 to maxN).map(rv).reduce(_ + _) / maxN).as("chr_r"))
      .withColumn("chrf",
        when(col("chr_p") + col("chr_r") === 0, lit(0.0))
          .otherwise(lit(1.0 + b2) * col("chr_p") * col("chr_r") /
            (lit(b2) * col("chr_p") + col("chr_r"))))
  }

  /** ROUGE-L per pair (Lin 2004): LCS of the whitespace token sequences via the
    * row-local [[graft.expressions.LcsLength]] DP — zero shuffles, the whole metric
    * is one codegen'd projection. Precision = LCS/|cand|, recall = LCS/|ref|,
    * F1 as in [[rougeN]] (0 where the denominator is 0).
    * Output: `(pair_id, lcs, cand_len, ref_len, precision, recall, f1)`.
    */
  def rougeL(
      pairs: DataFrame,
      idCol: Column,
      candCol: Column,
      refCol: Column): DataFrame = {
    val base = pairs.select(idCol.as("pair_id"),
      TextOps.tokens(candCol).as("ct"), TextOps.tokens(refCol).as("rt"))
    val lcs = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.LcsLength(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("ct")),
        org.apache.spark.sql.graftbridge.Bridge.expression(col("rt"))))
    base
      .select(col("pair_id"), lcs.as("lcs"),
        size(col("ct")).as("cand_len"), size(col("rt")).as("ref_len"))
      .withColumn("precision",
        when(col("cand_len") === 0, lit(0.0))
          .otherwise(col("lcs").cast("double") / col("cand_len")))
      .withColumn("recall",
        when(col("ref_len") === 0, lit(0.0))
          .otherwise(col("lcs").cast("double") / col("ref_len")))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
  }

  /** SQuAD-style token-level F1 + exact match per pair: unigram multiset overlap
    * on case-folded whitespace tokens; EM is equality of the folded
    * token sequences (whitespace-normalized, not raw-string, equality).
    * Output: `(pair_id, exact_match, matched, precision, recall, f1)`.
    */
  def tokenF1(
      pairs: DataFrame,
      idCol: Column,
      candCol: Column,
      refCol: Column): DataFrame = {
    val base = pairs.select(idCol.as("pair_id"),
      lower(candCol).as("cand"), lower(refCol).as("ref"))
    val s1 = element_at(overlap(col("cand"), col("ref"), 1, charMode = false), 1)
    base
      .select(col("pair_id"),
        (TextOps.tokens(col("cand")) === TextOps.tokens(col("ref"))).as("exact_match"),
        s1.getField("matched").as("matched"),
        s1.getField("cand_total").as("cand_total"),
        s1.getField("ref_total").as("ref_total"))
      .withColumn("precision",
        when(col("cand_total") === 0, lit(0.0))
          .otherwise(col("matched").cast("double") / col("cand_total")))
      .withColumn("recall",
        when(col("ref_total") === 0, lit(0.0))
          .otherwise(col("matched").cast("double") / col("ref_total")))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .select("pair_id", "exact_match", "matched", "precision", "recall", "f1")
  }

  /** Distinct-n diversity profile per group (Li et al. 2016): for each n in `ns`,
    * the number of distinct n-grams over the total n-gram count across the
    * group's texts — the standard mode-collapse / repetition alarm over a
    * generation set. Two bounded hash aggregations (per-gram, then per-group);
    * no windows. Output: `(group, n, total_ngrams, distinct_ngrams, distinct_ratio)`.
    */
  def distinctN(
      df: DataFrame,
      groupCol: Column,
      textCol: Column,
      ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be positive, got $ns")
    val tagged = ns.map(n =>
      transform(wordGrams(textCol, n), g => struct(lit(n).as("n"), g.as("gram"))))
    df.select(groupCol.as("group"), explode(flatten(array(tagged: _*))).as("t"))
      .groupBy(col("group"), col("t.n").as("n"), col("t.gram").as("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("group", "n")
      .agg(sum("cnt").as("total_ngrams"), count(lit(1)).as("distinct_ngrams"))
      .withColumn("distinct_ratio",
        col("distinct_ngrams").cast("double") / col("total_ngrams"))
  }
}
