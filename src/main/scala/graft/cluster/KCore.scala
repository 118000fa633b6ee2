package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction over an undirected view of a link graph: iteratively peel
  * nodes of degree < k until the remaining subgraph is the k-core (Seidman 1983).
  * In a curation pipeline the core distinguishes densely cross-referenced
  * content from peripheral leaves — a cheap cohesion filter that, unlike
  * PageRank, needs no damping parameters and converges in few rounds.
  *
  * Scale design: each peel round is one degree aggregation + two semi-joins on
  * the surviving node set — all hash-partitioned by node id, no windows. Each
  * round's edge set is checkpoint-rotated (round i's blocks freed as soon as
  * round i+1 materializes), and the loop early-stops on the first round that
  * removes nothing — one cheap `count()` action per round, the same control the
  * connected-components loop uses. Rounds needed = peel depth, typically
  * O(10) even on web graphs.
  */
object KCore {

  private def undirected(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src").cast("string"), col("dst").cast("string")).as("a"),
        greatest(col("src").cast("string"), col("dst").cast("string")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  private def degrees(und: DataFrame): DataFrame =
    und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  private def peelOnce(und: DataFrame, k: Int): DataFrame = {
    val keep = degrees(und).filter(col("degree") >= k).select("node")
    und.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
      .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
      .select("a", "b")
  }

  /** Exactly `iters` peel rounds, no convergence check — the closed-form variant
    * the DuckDB oracle replays. Output: surviving (node, degree).
    */
  def peel(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val tracker = new graft.util.CheckpointTracker(edges.sparkSession)
    var cur = tracker.rotate(undirected(edges))
    (1 to iters).foreach(_ => cur = tracker.rotate(peelOnce(cur, k)))
    degrees(cur)
  }

  /** The full k-core: peel until fixpoint (early stop when a round removes no
    * edge), capped at `maxIters`. Output: (node, degree) within the k-core —
    * every degree is >= k by construction. Fails loudly if `maxIters` rounds did
    * not reach the fixpoint: a truncated peel would keep sub-k degrees and
    * silently violate the contract (e.g. a long path at k=2 sheds only its two
    * endpoints per round, needing ~n/2 rounds). Peeling removes >= 1 node per
    * non-converged round, so `maxIters` >= the graph's node count always suffices.
    */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tracker = new graft.util.CheckpointTracker(edges.sparkSession)
    var cur = tracker.rotate(undirected(edges))
    var size = cur.count()
    var it = 0
    var done = size == 0L
    while (!done && it < maxIters) {
      val nxt = tracker.rotate(peelOnce(cur, k))
      val nsize = nxt.count()
      done = nsize == size || nsize == 0L
      cur = nxt
      size = nsize
      it += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge within maxIters=$maxIters rounds " +
          s"($size edges still shrinking); raise maxIters — the result would " +
          "contain sub-k degrees")
    degrees(cur)
  }
}
