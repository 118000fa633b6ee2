package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise categorical-association profile: mutual information, normalized MI,
  * and Cramér's V for every pair of the selected columns — the
  * feature-redundancy / functional-dependency signal a profiling pass attaches
  * next to per-column entropy (`metrics/EntropyMetrics`, reference ARC's
  * entropy-based column scoring) and the value-overlap schema matcher
  * (`schemamatch/SchemaMatch`): overlap says two columns share VALUES, MI says
  * they share INFORMATION even when vocabularies differ.
  *
  * Scale shape (the Y10 one-pass pattern): the table is unpivoted ONCE to
  * (id, column, value) — k·N rows for k selected columns — and self-joined on
  * the row id with `col_a < col_b`, so every pair's contingency table falls out
  * of ONE hash aggregation over C(k,2)·N rows. Everything downstream
  * (margins, entropies, χ²) aggregates per-pair cell tables, bounded by the
  * columns' cardinalities, never by N. χ² over sparse contingencies uses the
  * observed-cells identity Σ_all (O−E)²/E = Σ_obs ((O−E)²/E − E) + n, so
  * zero-observed cells are never materialized.
  */
object Association {

  private val NullSentinel = "<null>"

  /** @param df    input table
    * @param idCol unique row key (the unpivot join key)
    * @param cols  categorical columns to cross (k ≥ 2; cardinalities should be
    *              modest — contingency aggregates are card(a)·card(b))
    * @return one row per unordered pair: (col_a, col_b, n, mi, nmi, cramers_v);
    *         mi in nats; nmi = mi/√(H_a·H_b), 0 when either entropy is 0;
    *         cramers_v = √(χ²/(n·min(r−1,c−1))), 0 for a constant column
    */
  def pairwiseStats(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, s"need at least 2 columns, got ${cols.length}")
    require(cols.distinct.length == cols.length, s"duplicate columns in $cols")
    import graft.util.Caching.CacheSyntax

    val long = cols.map { c =>
        df.select(col(idCol).as("id"), lit(c).as("c"),
          coalesce(col(c).cast("string"), lit(NullSentinel)).as("v"))
      }.reduce(_ unionByName _)
    val pairs = long.as("a").join(long.as("b"),
        col("a.id") === col("b.id") && col("a.c") < col("b.c"))
      .select(col("a.c").as("col_a"), col("b.c").as("col_b"),
        col("a.v").as("va"), col("b.v").as("vb"))

    val cell = pairs.groupBy("col_a", "col_b", "va", "vb")
      .agg(count(lit(1)).as("nxy")).scopedPersist()
    val ma = cell.groupBy("col_a", "col_b", "va").agg(sum("nxy").as("nx"))
    val mb = cell.groupBy("col_a", "col_b", "vb").agg(sum("nxy").as("ny"))
    val tot = cell.groupBy("col_a", "col_b").agg(
      sum("nxy").as("n"),
      countDistinct("va").as("r"), countDistinct("vb").as("c"))

    val scored = cell
      .join(ma, Seq("col_a", "col_b", "va"))
      .join(mb, Seq("col_a", "col_b", "vb"))
      .join(tot.select("col_a", "col_b", "n"), Seq("col_a", "col_b"))
      .groupBy("col_a", "col_b")
      .agg(
        sum((col("nxy") / col("n")) *
          log(col("n") * col("nxy") / (col("nx") * col("ny")))).as("mi_raw"),
        // observed-cells χ² identity; the "+ n" lands after the join below
        sum(pow(col("nxy") - col("nx") * col("ny") / col("n"), 2) /
          (col("nx") * col("ny") / col("n")) -
          col("nx") * col("ny") / col("n")).as("chi2_obs"))

    val ha = ma.join(tot.select("col_a", "col_b", "n"), Seq("col_a", "col_b"))
      .groupBy("col_a", "col_b")
      .agg(sum(-(col("nx") / col("n")) * log(col("nx") / col("n"))).as("h_a"))
    val hb = mb.join(tot.select("col_a", "col_b", "n"), Seq("col_a", "col_b"))
      .groupBy("col_a", "col_b")
      .agg(sum(-(col("ny") / col("n")) * log(col("ny") / col("n"))).as("h_b"))

    tot.join(scored, Seq("col_a", "col_b"))
      .join(ha, Seq("col_a", "col_b")).join(hb, Seq("col_a", "col_b"))
      .select(col("col_a"), col("col_b"), col("n"),
        round(col("mi_raw"), 6).as("mi"),
        round(when(col("h_a") <= 0 || col("h_b") <= 0, lit(0.0))
          .otherwise(col("mi_raw") / sqrt(col("h_a") * col("h_b"))), 6).as("nmi"),
        round(when(least(col("r"), col("c")) <= 1, lit(0.0))
          .otherwise(sqrt(greatest((col("chi2_obs") + col("n")) /
            (col("n") * (least(col("r"), col("c")) - 1)), lit(0.0)))), 6)
          .as("cramers_v"))
  }
}
