package graft

/** Plan-shape regression net over the ENTIRE driver surface: every query's executed
  * plan is audited for the two patterns that kill 100 TB runs — cartesian products
  * (never acceptable) and nested-loop broadcast joins (acceptable only where one side
  * is bounded by construction and an equi-key genuinely doesn't exist).
  */
class PlanAuditSpec extends SparkSpec {

  /** Nested-loop joins with a BOUNDED broadcast side, by design:
    * - ann_cosine_topk: brute-force baseline broadcasts the (small, caller-bounded)
    *   query set against the corpus — there is no equi-key in exact top-k.
    * - ep9_hybrid_retrieval: its semantic arm is the SAME bounded brute-force
    *   broadcast (10 query vectors against the embedded corpus); the exact-cosine
    *   ranking is what the full DuckDB oracle replicates. The scale path swaps in
    *   lshTopK/Ivf.topKFromIndex, which plan equi-joins.
    * - ann_sq_topk: the SQ8 ADC scan broadcasts the same caller-bounded query-code
    *   set; the corpus side reads the compact code column, and only the bounded
    *   refine·k shortlist touches raw vectors.
    * - sim_mmr_rerank: candidate generation is the same caller-bounded broadcast
    *   brute-force scan as ann_cosine_topk; the MMR stage itself plans only an
    *   id-keyed equi-join + per-query aggregation.
    * - sketch_hll_overlap: the a<b pairing of DISTINCT GROUP labels (5 sources →
    *   ≤25 candidate rows) — register and data joins are all equi-joins.
    * - sim_margin_bitext: the oracle fixture runs marginBitext on the documented
    *   exact-recall brute-force baseline (two bounded broadcast top-k scans); the
    *   corpus-scale path swaps Ivf.ivfTopK's partition-pruned equi-join index, as
    *   the operator's Scaladoc states. Everything downstream of the top-k lists
    *   plans equi-joins and hash aggregates.
    * - eval_annotator_agreement: final crossJoin of TWO 1-row aggregate results
    *   (Cohen summary × Fleiss summary) — 1×1, bounded by construction.
    * - prof_expectations: the per-check report rows are 1-row aggregate branches
    *   cross-joined onto 1-row totals before the union — every side is a scalar.
    * - sim_mmr_two_step: the k=2 full-oracle sibling of sim_mmr_rerank — identical
    *   caller-bounded brute-force candidate broadcast.
    * - sim_pca_one_iter: Pca.powerIteration attaches the 1-row norm aggregate to
    *   the d-row iterate by broadcast crossJoin — scalar by construction.
    * - curation_quantile_norm: the rank-grid build is a theta-join of two
    *   BOUNDED tables (bins x distinct-bins, <= 100x100 rows) — the row-scale
    *   pass joins the grid by EQUALITY afterwards.
    * - graph_hits / graph_hits_two_iter: the final L2 norms are 1-row broadcast
    *   aggregates attached on a constant key (folded to a trivially-true join
    *   condition); r8's raw-sum checkpointing moved them from inside the
    *   (invisible) per-iteration checkpoints into the final plan — same bounded
    *   scalar class as eval_annotator_agreement.
    */
  private val boundedNestedLoop =
    Set("ann_cosine_topk", "ep9_hybrid_retrieval", "ann_sq_topk", "sim_mmr_rerank",
      "sketch_hll_overlap", "sim_margin_bitext", "eval_annotator_agreement",
      "prof_expectations", "sim_mmr_two_step", "sim_pca_one_iter",
      "graph_hits", "graph_hits_two_iter", "curation_quantile_norm",
      // ks_drift's grid densify: distinct-groups × bins broadcast cross join,
      // both sides bounded (≤ groups·bins rows) by construction
      "prof_ks_drift",
      // pr_curve's recall denominator: a 1-row positives total broadcast onto
      // the ≤ bins-row threshold grid — scalar by construction
      "ml_pr_curve")

  test("no query plans a cartesian; nested-loop joins only where a side is bounded") {
    val dir = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct"))
          failures += s"$name: CartesianProduct"
        if (!boundedNestedLoop(name) && plan.contains("BroadcastNestedLoopJoin"))
          failures += s"$name: BroadcastNestedLoopJoin outside the bounded allowlist"
      } catch {
        case e: Throwable => failures += s"$name: failed to build plan: ${e.getMessage}"
      }
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    assert(failures.isEmpty, s"plan audit failures:\n${failures.mkString("\n")}")
  }

  test("chat-JSON plans keep at most 2 from_json instances (Generate barrier holds)") {
    // Regression net for the r9 lesson (SCALING.md round-9 addendum): from_json
    // is non-codegen and projection collapse + filter inlining duplicate it into
    // EVERY referencing column — ep15's plan once carried 66 parses/row (31 s).
    // ChatOps.validateChat pins evaluation to once per row behind an
    // explode(array(...)) Generate barrier; if a future rewrite lets the
    // optimizer collapse through it, the parse count explodes silently — this
    // counts the instances in the executed plan so that can't happen. Counted on
    // the expression TREES, not plan.toString — toString truncates wide field
    // lists at spark.sql.debug.maxToStringFields (default 25), which is exactly
    // how a 66-copy projection could hide from a string count.
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def countParses(p: SparkPlan): Int = p.collect {
      case a: AdaptiveSparkPlanExec => countParses(a.executedPlan)
      case node => node.expressions.map(_.collect { case _: JsonToStructs => 1 }.sum).sum
    }.sum
    val dir = "/root/testdata/sf0.001"
    Seq("curation_chat_validate", "ep15_sft_corpus").foreach { name =>
      val parses = countParses(
        SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan)
      assert(parses <= 2, s"$name: $parses JsonToStructs instances in the physical " +
        "plan (expected <= 2) — the Generate barrier in ChatOps.validateChat collapsed")
    }
  }

  test("CheckpointTracker caps inherited size-estimate growth across self-join rounds") {
    // localCheckpoint's LogicalRDD inherits the source plan's sizeInBytes; a
    // self-joining iterate squares it every round, so the BigInt's bit-length
    // doubles and Catalyst's stats visitor ends up burning minutes per round in
    // BigInt multiplication (observed: 11.5M bits by round 12, ~1000 s/round).
    // Bridge.capCheckpointStats resets past-2^128 estimates to the conf default.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (1 to 100).toDF("j").withColumn("x", lit(1.0))
    val tracker = new graft.util.CheckpointTracker(spark)
    var v = base
    var capped = false
    (1 to 6).foreach { _ =>
      val doubled = v.as("a").join(v.as("b"), "j")
        .select(col("j"), (col("a.x") + col("b.x")).as("x"))
      v = tracker.rotate(doubled)
      val bits = v.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      if (bits <= 128) capped = true // reset to the constant-width conf default
      assert(bits <= 300, s"checkpointed stats grew unbounded: $bits bits")
    }
    assert(capped, "cap never engaged — self-join rounds should cross 2^128")
    assert(v.agg(sum("x")).as[Double].head() === 100 * math.pow(2, 6))
    tracker.close() // free the final checkpoint only after the consumer materialized
  }
}
