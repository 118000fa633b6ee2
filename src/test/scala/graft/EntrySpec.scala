package graft

/** Mirrors the driver's t1 smoke gate: the flagship entry must produce rows at sf0.001. */
class EntrySpec extends SparkSpec {
  test("flagship entry returns non-empty clusters on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet === Set("cluster_id", "cluster_size"))
  }

  test("every query name has either an oracle or a documented rows-only reason") {
    // EXACT set, not an upper bound: a query silently losing its oracle (or a new
    // rows-only query slipping in without a justification here) must fail this.
    // Each of these is iterative/search-driven and carries a pinned-step or
    // property gate instead (r6: the ANN family, SemDeDup, the Newton agg, and
    // BPE merge 1 all graduated to full oracles and left this list).
    val rowsOnly = Set(
      "j5_em_train",          // iterative EM — j5_em_one/two_iter pin the updates + loop
      "ep1_e2e_dedupe",       // trained pipeline — ep10_fs_cluster pins the serve path
      "ep1_auto_link",        // adaptive search — pinned by MetricsSpec
      "ep1_auto_link_two_tables", // link-mode search loop — pinned by MetricsSpec
      "sim_pca_project",      // iterative eigensolve — sim_covariance pins the distributed core
      "ml_quality_train",     // iterative IRLS — ml_quality_newton_agg pins the per-step agg
      "curation_bpe_merges",  // iterative merge loop — curation_bpe_first_merge + Sennrich fixture
      "curation_unigram_lm",  // Viterbi-EM loop — curation_unigram_seed pins the corpus-sized step
      "curation_unigram_encode", // segmentation DP has no SQL form — exhaustive-Viterbi spec pin
      "sim_mmr_rerank",       // greedy MMR loop has no SQL form — reimplementation spec pin;
                              // ep12_diverse_retrieval full-oracles the cluster-diversity sibling
      "graph_pagerank",       // iterative — graph_pagerank_one/two_iter pin update + loop
      "graph_lpa",            // iterative — graph_lpa_two_iter pins the frequency-argmax
                              // update + loop; GraphSpec pins planted communities
      "graph_ppr",            // iterative — graph_ppr_two_iter pins the seeded update
                              // + loop; GraphSpec pins mass/reachability invariants
      "graph_hits",           // iterative — graph_hits_two_iter pins the alternating
                              // normalized sums; GraphSpec pins roles on a directory graph
      "graph_kcore",          // peel-until-fixpoint — graph_kcore_two_peel pins the
                              // round; GraphSpec pins fixpoint ≡ brute-force peel
    "mm_cdc_dedup")         // gear rolling hash is a sequential prefix scan with no
                              // SQL form — CdcChunks property-pinned in ExpressionsSpec
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual === rowsOnly,
      s"rows-only drift — no longer rows-only: ${rowsOnly -- actual}; " +
        s"new without justification: ${actual -- rowsOnly}")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
