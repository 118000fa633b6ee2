package graft.blocking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the classic
  * complement to equi-key blocking rules (`blocking/PairGenerator`, reference
  * `arc/autolinker.py` blocking): records are globally ordered by a fuzzy sort
  * key (e.g. concatenated normalized name+zip) and every pair within a sliding
  * window of `w` consecutive positions becomes a candidate. Catches near-misses
  * an exact blocking key drops (typo in the key ⇒ still sorts nearby) at
  * bounded cost: exactly (w−1)·N − C(w,2) candidate pairs, linear in N.
  *
  * Scale design: a global `row_number` window would funnel the corpus through
  * ONE partition, so positions come from the bucketed-offset numbering of
  * [[graft.textops.Curation.globalShuffle]]: the sort key's first 2 characters
  * form lexicographic buckets (prefix order agrees with full-key order), one
  * bounded count aggregation yields driver-side cumulative offsets, and each
  * partition numbers its own slice in parallel. The windowed self-join never
  * compares all pairs either — rows land in contiguous blocks of `w−1`
  * positions, the left side is exploded to its own and the NEXT block, and the
  * equi-join on block id finds each in-window pair exactly once.
  *
  * The sort key must be a STRING whose lexicographic order is the intended
  * order (zero-pad numeric fields into it); ties are broken by `id`, making the
  * order total and engine-independent. Unlike the md5 draw of `globalShuffle`,
  * a real-world sort key is often SKEWED across prefixes (many surnames start
  * with "S") — buckets stay correct under skew, only parallelism degrades;
  * widen the window-join block instead of the bucket prefix if one prefix
  * dominates.
  */
object SortedNeighborhood {

  /** Dense 1-based `position` by (sortKey, id) without a global window. */
  def rank(df: DataFrame, sortKey: Column, id: Column): DataFrame = {
    Seq("_snkey", "_bucket", "_rn", "position").foreach(c =>
      require(!df.columns.contains(c),
        s"SortedNeighborhood.rank adds a reserved '$c' column; rename the input's"))
    val withKey = df
      .withColumn("_snkey", sortKey.cast("string"))
      .withColumn("_bucket", coalesce(substring(col("_snkey"), 1, 2), lit("")))
    val rawCounts = withKey.groupBy("_bucket").agg(count(lit(1)).as("n")).collect()
    require(!withKey.filter(col("_snkey").isNull).limit(1).collect().nonEmpty,
      "SortedNeighborhood: null sort keys have no position — filter or fill first")
    val counts = rawCounts.map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    if (counts.isEmpty)
      return df.withColumn("position", lit(0L)).filter(lit(false))
    val offsets = counts.map(_._1)
      .zip(counts.scanLeft(0L) { case (acc, (_, n)) => acc + n })
      .toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_bucket").orderBy(col("_snkey"), id)
    val offset = element_at(typedLit(offsets), col("_bucket"))
    withKey
      .withColumn("_rn", row_number().over(w))
      .withColumn("position",
        when(offset.isNull, raise_error(concat(
          lit("SortedNeighborhood: bucket not seen by the offset pass "),
          lit("(non-deterministic input?): "), col("_bucket"))))
          .otherwise(offset + col("_rn")))
      .drop("_snkey", "_bucket", "_rn")
  }

  /** Candidate pairs within a sliding window of `window` consecutive positions.
    *
    * @return (id_l, id_r, pos_l, pos_r, distance) with pos_l < pos_r,
    *         distance = pos_r − pos_l ∈ [1, window−1]
    */
  def pairs(df: DataFrame, sortKey: Column, id: Column, window: Int): DataFrame = {
    require(window >= 2, s"window must cover at least 2 rows, got $window")
    val span = (window - 1).toLong
    val ranked = rank(df, sortKey, id)
      .select(id.cast("string").as("rid"), col("position"))
    // left row (lower position) visits its own block and the next; the right
    // row joins on its OWN block only, so a pair within `span` matches once
    val blk = expr(s"(position - 1) div ${span}L") // integral division, no FP
    val left = ranked.select(col("rid").as("id_l"), col("position").as("pos_l"),
      explode(array(blk, blk + 1)).as("_blk"))
    val right = ranked.select(col("rid").as("id_r"), col("position").as("pos_r"),
      blk.as("_blk"))
    left.join(right, Seq("_blk"))
      .filter(col("pos_r") > col("pos_l") && col("pos_r") - col("pos_l") <= span)
      .select(col("id_l"), col("id_r"), col("pos_l"), col("pos_r"),
        (col("pos_r") - col("pos_l")).as("distance"))
  }
}
