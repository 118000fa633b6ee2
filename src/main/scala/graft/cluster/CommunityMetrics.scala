package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-quality metrics over a node→community assignment (Newman & Girvan
  * 2004 modularity; conductance, the cut-quality measure of Shi–Malik / Leskovec
  * et al.) — the audit a curation pipeline runs after community detection
  * ([[LabelPropagation]]) before trusting the groups for mixing or dedup
  * decisions, and the same shape the reference's cluster-stats red-flag report
  * takes for entity clusters (`splink` graph metrics; see
  * [[ConnectedComponents.clusterStats]]).
  *
  * All metrics are closed forms over three bounded aggregations:
  *   - degrees: ONE hash agg over the canonical edge set;
  *   - per-community volume: labels ⋈ degrees, ONE community-keyed agg;
  *   - internal/cut edge counts: edges ⋈ labels on BOTH endpoints (two
  *     node-keyed equi-joins — the label vector is N rows, co-partitioned with
  *     the edge shuffle), then ONE community-keyed agg (cut edges contribute to
  *     both sides via a 2-row explode).
  * Nothing is quadratic in nodes or communities; no sort windows. Modularity
  * folds the ≤C community table once more:  Q = Σ_c (L_c/m − (D_c/2m)²).
  */
object CommunityMetrics {

  /** Canonical undirected simple edges (a<b, self-loops dropped, distinct). */
  def canonicalEdges(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"))
      .filter(col("src") =!= col("dst"))
    e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
  }

  /** Per-community quality report.
    *
    * @param edges  directed or undirected edge list (`src`, `dst`); canonicalized
    * @param labels (`node`, `label`) covering every edge endpoint
    * @return (community, n_nodes, internal_edges, cut_edges, volume,
    *         conductance) — conductance = cut / min(vol, 2m − vol), 0.0 for a
    *         partition side with empty complement volume
    */
  def communityQuality(edges: DataFrame, labels: DataFrame): DataFrame = {
    import graft.util.Caching.CacheSyntax
    val canon = canonicalEdges(edges).scopedPersist()
    val lab = labels.select(col("node"), col("label").cast("string").as("label"))
    val m = canon.count()

    val deg = canon.select(col("a").as("node"))
      .unionByName(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val sizeVol = lab.join(deg, Seq("node"), "left")
      .na.fill(0L, Seq("degree"))
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum("degree").as("volume"))

    // left joins + raise_error instead of silent inner joins: an edge endpoint
    // the label table misses would otherwise drop the edge from internal/cut
    // counts while m (counted over ALL canonical edges) still includes it,
    // silently skewing conductance and modularity — fail loudly instead,
    // matching the repo convention (cf. mixtureWeights, rocAuc)
    val labeled = canon
      .join(lab.select(col("node").as("a"), col("label").as("la")), Seq("a"), "left")
      .join(lab.select(col("node").as("b"), col("label").as("lb")), Seq("b"), "left")
      .select(col("a"), col("b"),
        when(col("la").isNull || col("lb").isNull, raise_error(concat(
          lit("communityQuality: edge endpoint without a label (edge "),
          col("a").cast("string"), lit(" -- "), col("b").cast("string"),
          lit("); the label table must cover every edge endpoint"))))
          .otherwise(col("la")).as("la"),
        col("lb"))
    // an internal edge belongs to its one community; a cut edge to both sides
    val perEdge = labeled.select(explode(when(col("la") === col("lb"),
        array(struct(col("la").as("community"), lit(1L).as("internal"), lit(0L).as("cut"))))
      .otherwise(array(
        struct(col("la").as("community"), lit(0L).as("internal"), lit(1L).as("cut")),
        struct(col("lb").as("community"), lit(0L).as("internal"), lit(1L).as("cut"))))).as("x"))
      .select(col("x.community"), col("x.internal"), col("x.cut"))
      .groupBy("community")
      .agg(sum("internal").as("internal_edges"), sum("cut").as("cut_edges"))

    sizeVol.join(perEdge, Seq("community"), "left")
      .na.fill(0L, Seq("internal_edges", "cut_edges"))
      .withColumn("conductance",
        when(least(col("volume"), lit(2L * m) - col("volume")) === 0, lit(0.0))
          .otherwise(round(col("cut_edges") /
            least(col("volume"), lit(2L * m) - col("volume")), 6)))
      .select("community", "n_nodes", "internal_edges", "cut_edges", "volume",
        "conductance")
  }

  /** Global partition summary: Newman modularity + coverage (intra-edge share).
    *
    * @return ONE row (n_communities, m_edges, coverage, modularity)
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val q = communityQuality(edges, labels)
    // m from the community table itself: Σ internal + Σ cut/2 (each cut edge
    // was counted on both sides) — avoids re-scanning the edge set
    q.agg(
        count(lit(1)).as("n_communities"),
        (sum("internal_edges") + sum("cut_edges") / 2).cast("long").as("m_edges"),
        sum("internal_edges").cast("double").as("li"),
        sum(col("volume") * col("volume")).cast("double").as("vol_sq"))
      .select(col("n_communities"), col("m_edges"),
        round(col("li") / col("m_edges"), 6).as("coverage"),
        round(col("li") / col("m_edges") -
          col("vol_sq") / (lit(4.0) * col("m_edges") * col("m_edges")), 6)
          .as("modularity"))
  }
}
