package graft

/** Mirrors the driver's t1 smoke gate: the flagship entry must produce rows at sf0.001. */
class EntrySpec extends SparkSpec {
  test("flagship entry returns non-empty clusters on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet === Set("cluster_id", "cluster_size"))
  }

  test("every query name has either an oracle or a documented rows-only reason") {
    val rowsOnly = Set(
      "j5_em_train",          // iterative EM — pinned by LinkageSpec
      "ep1_e2e_dedupe",       // trained pipeline — pinned by MetricsSpec
      "ep1_auto_link",        // adaptive search — pinned by MetricsSpec
      "ep1_auto_link_two_tables", // link-mode search loop — pinned by MetricsSpec
      "ann_lsh_topk",         // approximate — recall pinned by TextOpsSpec
      "ann_ivf_topk",         // approximate — recall pinned by TextOpsSpec
      "ann_pq_topk",          // approximate IVF-PQ — recall + ADC fixture pinned by TextOpsSpec
      "sim_pca_project",      // iterative eigensolve — hand-computed eigensystem pinned by TextOpsSpec
      "ml_quality_train",     // iterative GD — accuracy/loss pinned by CurationSpec
      "dedup_semantic",       // iterative Lloyd — subset/recall pinned by TextOpsSpec
      "curation_bpe_merges")  // iterative merge loop — pinned by CurationSpec (Sennrich fixture)
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle or justification: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
