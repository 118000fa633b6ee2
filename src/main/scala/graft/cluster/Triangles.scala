package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and local clustering coefficients over an undirected view of a
  * link graph — the cohesion signals (spam farms are triangle-dense, organic link
  * neighborhoods are sparse) that complement the spectral family
  * ([[PageRank]]/[[PageRank.hits]]).
  *
  * Scale design — the standard degree-ordered orientation (Cohen 2009, "Graph Twiddling
  * in a MapReduce World"; the compact-forward algorithm): canonicalize to distinct
  * undirected edges, then orient every edge from its LOWER-degree endpoint to the
  * higher ((deg, node) lexicographic, so orientation is a total order and acyclic).
  * Every triangle then has exactly ONE wedge at its minimum-degree corner, and the
  * wedge join's fan-out per node is bounded by its ORIENTED out-degree ≤ O(√m) —
  * the join never explodes on celebrity nodes the way a naive neighbor self-join
  * does. Three hash joins + aggregations total; no iteration.
  */
object Triangles {

  /** Per-node triangle count and local clustering coefficient
    * `2·T(v) / (deg(v)·(deg(v)−1))` over the undirected simple graph (self-loops
    * and duplicate/reverse edges collapse). Nodes of degree ≤ 1 get coefficient 0.
    *
    * Output: (node, degree, triangles, clustering_coeff round 6).
    */
  def nodeTriangles(edges: DataFrame): DataFrame = {
    import graft.util.Caching.CacheSyntax
    // canonical undirected simple edges: a < b
    val und = edges.select(
        least(col("src").cast("string"), col("dst").cast("string")).as("a"),
        greatest(col("src").cast("string"), col("dst").cast("string")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .scopedPersist()
    val deg = und.select(col("a").as("node")).unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
      .scopedPersist()
    // orient from lower (deg, node) to higher — total order, one direction per edge
    val oriented = und
      .join(deg.select(col("node").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("degree").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("lo"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("hi"))
      .scopedPersist()
    // wedges at the minimum corner: (u→v, u→w) with v < w; triangle iff v—w oriented
    val wedges = oriented.alias("e1")
      .join(oriented.alias("e2"), col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("u"), col("e1.hi").as("v"), col("e2.hi").as("w"))
    // the closing edge v—w may be oriented either way (its own degree order decides)
    val closing = oriented.select(col("lo").as("v"), col("hi").as("w"))
      .unionAll(oriented.select(col("hi").as("v"), col("lo").as("w")))
    val tri = wedges.join(closing, Seq("v", "w"))
      .scopedPersist() // each triangle appears exactly ONCE here; read 3× below
    val perNode = tri.select(col("u").as("node"))
      .unionAll(tri.select(col("v").as("node")))
      .unionAll(tri.select(col("w").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering_coeff",
        round(when(col("degree") > 1,
          lit(2.0) * col("triangles") / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)), 6))
  }

  /** Global triangle count: Σ per-node / 3 computed directly from the single-count
    * triangle table (1-row result).
    */
  def totalTriangles(edges: DataFrame): Long = {
    val r = nodeTriangles(edges).agg((sum("triangles") / 3).cast("long")).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
