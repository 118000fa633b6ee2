package graft

/** Mirrors the driver's t1 smoke gate: the flagship entry must produce rows at sf0.001. */
class EntrySpec extends SparkSpec {
  test("flagship entry returns non-empty clusters on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet === Set("cluster_id", "cluster_size"))
  }

  test("every query name has a full DuckDB oracle") {
    // EXACT invariant since r10: zero rows-only queries. The former three
    // default-config loop smokes (ep1_e2e_dedupe, ep1_auto_link,
    // ep1_auto_link_two_tables) now run their seeded oracle-replayable configs
    // directly (AutoLinkOracle / E2eOracle); the default configs (data-derived
    // P4 rules, TPE, hash u pairing) remain spec smokes in MetricsSpec and the
    // EntrySpec flagship. A query slipping in without an oracle must fail here.
    val actual = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(actual.isEmpty, s"queries without an oracle: $actual")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }
}
