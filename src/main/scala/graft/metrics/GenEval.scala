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
  * All four pair metrics share ONE relational core, [[clippedNgramStats]]: both
  * sides' n-grams for every requested n are emitted by a single-pass shingle
  * expression ([[graft.expressions.WordShingles]] / [[graft.expressions.CharShingles]]),
  * exploded ONCE with an n tag, hash-counted per (pair, n, gram), and the clipped
  * multiset intersection Σ_g min(c_cand, c_ref) comes from one equi-join on
  * (pair, n, gram). Every aggregation is map-side combinable and keyed by pair id —
  * no windows, no cross products — so the evaluation scales linearly with corpus
  * size and parallelizes per pair.
  */
object GenEval {

  /** Word n-grams (whitespace tokens, single-pass expression). */
  def wordGrams(c: Column, n: Int): Column = TextOps.shingles(c, n)

  /** Character n-grams over the whitespace-stripped string (chrF convention). */
  def charGrams(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.CharShingles(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), n))

  /** Per-pair clipped n-gram overlap statistics for every n in `ns`:
    * `(pair_id, n, matched, cand_total, ref_total)` where
    * `matched = Σ_gram min(count_cand, count_ref)` (the clipped / multiset
    * intersection count every n-gram metric is built from) and the totals are the
    * sides' n-gram counts. Pairs with no grams on a side get explicit zeros (the
    * (pair × n) grid left-joins the count tables), so downstream score formulas
    * see every pair.
    */
  def clippedNgramStats(
      pairs: DataFrame,
      idCol: Column,
      candCol: Column,
      refCol: Column,
      ns: Seq[Int],
      gram: (Column, Int) => Column = wordGrams): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be positive, got $ns")
    val base = pairs.select(idCol.as("pair_id"), candCol.as("cand"), refCol.as("ref"))

    def counts(side: String): DataFrame = {
      val tagged = ns.map(n =>
        transform(gram(col(side), n), g => struct(lit(n).as("n"), g.as("gram"))))
      base
        .select(col("pair_id"), explode(flatten(array(tagged: _*))).as("t"))
        .groupBy(col("pair_id"), col("t.n").as("n"), col("t.gram").as("gram"))
        .agg(count(lit(1)).as("cnt"))
    }

    val c = counts("cand")
    val r = counts("ref")
    val grid = base.select(col("pair_id")).withColumn("n", explode(typedlit(ns)))
    val cTot = c.groupBy("pair_id", "n").agg(sum("cnt").as("cand_total"))
    val rTot = r.groupBy("pair_id", "n").agg(sum("cnt").as("ref_total"))
    val m = c.as("c")
      .join(r.as("r"), Seq("pair_id", "n", "gram"))
      .groupBy("pair_id", "n")
      .agg(sum(least(col("c.cnt"), col("r.cnt"))).as("matched"))
    grid
      .join(cTot, Seq("pair_id", "n"), "left")
      .join(rTot, Seq("pair_id", "n"), "left")
      .join(m, Seq("pair_id", "n"), "left")
      .select(col("pair_id"), col("n"),
        coalesce(col("matched"), lit(0L)).as("matched"),
        coalesce(col("cand_total"), lit(0L)).as("cand_total"),
        coalesce(col("ref_total"), lit(0L)).as("ref_total"))
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
    val st = clippedNgramStats(pairs, idCol, candCol, refCol, 1 to maxN)
    val p = when(col("n") === 1,
        when(col("cand_total") === 0, lit(0.0))
          .otherwise(col("matched").cast("double") / col("cand_total")))
      .otherwise((col("matched") + lit(1)).cast("double") / (col("cand_total") + lit(1)))
    // pivot to one column per order so the log-sum is a FIXED left-associated
    // expression — a sum() over the n rows would accumulate in partition order
    // and ULP-drift against the oracle's order
    val agg = st
      .withColumn("p", p)
      .groupBy("pair_id")
      .agg(
        sum(when(col("n") === 1, col("cand_total"))).as("cand_len"),
        (sum(when(col("n") === 1, col("ref_total"))).as("ref_len") +:
          (1 to maxN).map(k => max(when(col("n") === k, col("p"))).as(s"p_$k"))): _*)
    // ln(0) is NULL in Spark; the 1e-300 floor keeps the sum defined — the
    // p_1=0 branch below overrides anything the floor contributed
    val logsum = (1 to maxN)
      .map(k => log(greatest(col(s"p_$k"), lit(1e-300)))).reduce(_ + _)
    val bp = when(col("cand_len") === 0, lit(0.0))
      .when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("ref_len").cast("double") / col("cand_len")))
    agg
      .withColumn("bp", bp)
      .select(col("pair_id"), col("cand_len"), col("ref_len"), col("bp"),
        when(col("p_1") === 0, lit(0.0))
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
    val st = clippedNgramStats(pairs, idCol, candCol, refCol, 1 to maxN, charGrams)
    val prec = when(col("cand_total") === 0, lit(0.0))
      .otherwise(col("matched").cast("double") / col("cand_total"))
    val rec = when(col("ref_total") === 0, lit(0.0))
      .otherwise(col("matched").cast("double") / col("ref_total"))
    val b2 = beta * beta
    // per-order columns, fixed-order means — same ULP-determinism rationale as bleu
    val agg = st.withColumn("prec", prec)
      .withColumn("rec", rec)
      .groupBy("pair_id")
      .agg(
        max(when(col("n") === 1, col("prec"))).as("prec_1"),
        (2 to maxN).map(k => max(when(col("n") === k, col("prec"))).as(s"prec_$k")) ++
          (1 to maxN).map(k => max(when(col("n") === k, col("rec"))).as(s"rec_$k")): _*)
    agg
      .select(col("pair_id"),
        ((1 to maxN).map(k => col(s"prec_$k")).reduce(_ + _) / maxN).as("chr_p"),
        ((1 to maxN).map(k => col(s"rec_$k")).reduce(_ + _) / maxN).as("chr_r"))
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
    val st = rougeN(base, col("pair_id"), col("cand"), col("ref"), Seq(1))
    val em = base.select(col("pair_id"),
      (TextOps.tokens(col("cand")) === TextOps.tokens(col("ref"))).as("exact_match"))
    em.join(st, Seq("pair_id"))
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
