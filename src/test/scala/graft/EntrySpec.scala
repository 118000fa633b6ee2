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
    // The three remaining rows-only entries are DEFAULT-CONFIG smokes (hash
    // shuffle + data-derived candidate rules + TPE) whose exact control flow now
    // has a hash-green pinned twin: ep1_e2e_dedupe_pinned (same pipeline,
    // uid-ordered u pairing), ep1_auto_link_two_trials (dedupe search loop),
    // ep1_auto_link_two_table_trials (link-mode loop incl. the Y10 mapping).
    val rowsOnly = Set(
      "ep1_e2e_dedupe",
      "ep1_auto_link",
      "ep1_auto_link_two_tables")
    // r8 graduated twelve to GENERATED full oracles (fixed-iteration /
    // freeze-on-convergence / binary-lifting chains — see SCALING.md round-8
    // notes): the five graph kernels, BPE merges, both unigram-LM queries, the
    // MMR re-rank, IRLS training, converged EM, and gear-hash CDC dedup; r9
    // added the converged PCA projection and the three pinned twins above.
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual === rowsOnly,
      s"rows-only drift — no longer rows-only: ${rowsOnly -- actual}; " +
        s"new without justification: ${actual -- rowsOnly}")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
