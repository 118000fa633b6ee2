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
      "ep1_e2e_dedupe",       // trained pipeline — ep10_fs_cluster pins the serve path
      "ep1_auto_link",        // adaptive search — pinned by MetricsSpec;
                              // ep1_auto_link_one_trial full-oracles the trial body
      "ep1_auto_link_two_tables", // link-mode search loop — pinned by MetricsSpec
      "sim_pca_project")      // Jacobi eigensolve: ~2000 data-dependent-pivot
                              // rotations per sweep — not unrollable; sim_covariance
                              // + sim_pca_one_iter pin the distributed core
    // r8 graduated twelve more to GENERATED full oracles (fixed-iteration /
    // freeze-on-convergence / binary-lifting chains — see SCALING.md round-8
    // notes): the five graph kernels, BPE merges, both unigram-LM queries, the
    // MMR re-rank, IRLS training, converged EM, and gear-hash CDC dedup.
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual === rowsOnly,
      s"rows-only drift — no longer rows-only: ${rowsOnly -- actual}; " +
        s"new without justification: ${actual -- rowsOnly}")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
