package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact bounded-radius neighborhood sizes — the local-expansion statistic of
  * the neighborhood-function literature (ANF, Palmer et al. 2002; HyperBall,
  * Boldi & Vigna 2013 approximate it with HLL at web scale): for every node,
  * how many DISTINCT nodes sit within 1 and within 2 hops. On a document/host
  * link graph this separates well-embedded pages from near-isolated ones — a
  * structural quality prior next to PageRank and clustering coefficients.
  *
  * Scale shape: 1-hop is ONE degree aggregation; 2-hop is ONE wedge self-join
  * (Σ deg² candidate rows) + distinct + count — the same frontier the triangle
  * counter walks, but UNORIENTED, so hub skew hits harder. `maxDegree` caps the
  * wedge like [[LinkPrediction]]'s `maxWedgeDegree`: nodes above the cap stop
  * RELAYING 2-hop paths (their neighbors still count them as 1-hop); at 100 TB
  * the exact count is for capped/moderate graphs, and the HLL register path
  * (`metrics/Sketches`) is the uncapped estimate.
  */
object Neighborhood {

  /** @param edges (`src`, `dst`), treated undirected; self-loops dropped
    * @param maxDegree relay cap for the wedge join (None = exact everywhere)
    * @return (node, reach_1, reach_2): distinct neighbors within ≤1 / ≤2 hops,
    *         self excluded
    */
  def twoHopReach(edges: DataFrame, maxDegree: Option[Int] = None): DataFrame = {
    import graft.util.Caching.CacheSyntax
    val e0 = edges.select(col("src").cast("string").as("src"),
        col("dst").cast("string").as("dst"))
      .filter(col("src") =!= col("dst"))
    val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().scopedPersist()
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("reach_1"))
    val relay = maxDegree match {
      case None => sym
      case Some(cap) =>
        sym.join(deg.filter(col("reach_1") <= cap).select(col("node").as("dst")),
          Seq("dst"), "left_semi")
    }
    // paths a→m→c through a relaying midpoint m; c may also be a direct
    // neighbor, so union with 1-hop BEFORE the distinct — never double-counted
    val twoHop = relay.select(col("src").as("a"), col("dst").as("m"))
      .join(sym.select(col("src").as("m"), col("dst").as("c")), Seq("m"))
      .filter(col("a") =!= col("c"))
      .select(col("a").as("node"), col("c").as("other"))
    val reach2 = sym.select(col("src").as("node"), col("dst").as("other"))
      .unionByName(twoHop).distinct()
      .groupBy("node").agg(count(lit(1)).as("reach_2"))
    deg.join(reach2, Seq("node"))
  }
}
