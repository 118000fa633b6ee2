package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over an undirected view of a link graph:
  * common-neighbor count, Jaccard coefficient, and Adamic–Adar
  * (`Σ_{z∈N(a)∩N(b)} 1/ln deg(z)`, Adamic & Adar 2003) for candidate node pairs.
  * In a curation pipeline these score "should these two documents/entities be
  * linked" — candidate generation for entity resolution and related-content
  * retrieval without embeddings.
  *
  * Scale design: one wedge self-join through the shared neighbor `z` — each
  * candidate pair (a,b) materializes once per common neighbor and is hash-aggregated
  * to (count, Σ1/ln deg). Fan-out per z is deg(z)², so celebrity hubs are the blowup
  * risk at 100 TB; `maxWedgeDegree` excludes nodes above the cap from SERVING as the
  * shared neighbor (the standard mitigation — a z adjacent to millions of nodes
  * carries ~no signal: 1/ln deg → 0, Jaccard denominator dominated anyway). Capped
  * semantics stay deterministic: scores simply don't count evidence through
  * over-capped hubs. No windows, no iteration: three hash joins + one aggregation.
  */
object LinkPrediction {

  /** Score candidate pairs (a < b) sharing at least one common neighbor.
    *
    * @param excludeExisting drop pairs already joined by an edge (predict NEW links)
    * @param maxWedgeDegree  nodes with degree above this do not serve as the shared
    *                        neighbor (scale guard; Long.MaxValue = exact)
    * Output: (a, b, common_neighbors, jaccard round 6, adamic_adar round 6).
    */
  def scores(
      edges: DataFrame,
      excludeExisting: Boolean = true,
      maxWedgeDegree: Long = Long.MaxValue): DataFrame = {
    import graft.util.Caching.CacheSyntax
    val und = edges.select(
        least(col("src").cast("string"), col("dst").cast("string")).as("a"),
        greatest(col("src").cast("string"), col("dst").cast("string")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .scopedPersist()
    val deg = und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .scopedPersist()
    // symmetric adjacency (z, n) with z's degree attached once, capped for wedging
    val adj = und.select(col("a").as("z"), col("b").as("n"))
      .unionAll(und.select(col("b").as("z"), col("a").as("n")))
      .join(deg.select(col("node").as("z"), col("degree").as("dz")), Seq("z"))
      .filter(col("dz") <= maxWedgeDegree)
      .scopedPersist()
    val pairs = adj.alias("l")
      .join(adj.alias("r"), col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .groupBy(col("l.n").as("a"), col("r.n").as("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(lit(1.0) / log(col("l.dz"))).as("aa_raw"))
    val fresh =
      if (excludeExisting) pairs.join(und, Seq("a", "b"), "left_anti") else pairs
    fresh
      .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common_neighbors"),
        round(col("common_neighbors") /
          (col("da") + col("db") - col("common_neighbors")), 6).as("jaccard"),
        round(col("aa_raw"), 6).as("adamic_adar"))
  }
}
