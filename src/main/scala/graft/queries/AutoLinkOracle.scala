package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.auto.AutoLinker
import graft.model.ComparisonSpec
import graft.train.Estimation

/** EP1 — FULL oracle for the trained auto-link search loop (reference:
  * AutoLinker.auto_link, autolinker.py:688-847), two trials end-to-end.
  *
  * The only reason the trained loop ever lacked a SQL form is the seeded RNG and
  * the data-dependent candidate-rule list. Both collapse for a ≤3-trial search:
  * every strategy draws UNIFORMLY during the warmup, so with an explicit
  * candidate-rule list the whole draw sequence (comparison specs, blocking rule,
  * Y6 training rules per trial) depends on the seed alone —
  * [[AutoLinker.warmupDraws]] replays it without data, and this generator embeds
  * the drawn constants. Everything DATA-dependent is recomputed by the SQL
  * itself, per trial:
  *
  *   - J3 prior λ0 = 1/N;
  *   - J4 u-estimation over the shared uid-ordered ring pairing (offsets 1..4 —
  *     `uTargetPairs = min(4N, 100000)` gives exactly 4 for N ≤ 25 000, which
  *     covers the driver's sf0.01 check and the sf0.1 bench);
  *   - J5 EM per training rule: 25 freeze-on-convergence iterations (the
  *     `j5_em_train` done-flag chain), λ chained across the trial's three
  *     sessions, empty-block sessions passing through their inputs exactly as
  *     `emFromPatterns` does;
  *   - the m/u averaging `Estimation.train` applies across sessions and the
  *     sampled u;
  *   - J6 predict under the drawn blocking rule with weights computed from the
  *     TRAINED parameter CTEs (not constants);
  *   - J7 clustering via the recursive transitive closure at the serve threshold;
  *   - Y8 information-gain power-ratio trial metric and the best-trial argmax
  *     (first trial wins ties, as the loop's strict `>` does).
  */
object AutoLinkOracle {

  private[queries] val Seed = 7L
  private[queries] val Attrs = Seq("c_name", "c_mktsegment", "c_nationkey")
  private[queries] val RuleChoices = Seq(
    "l.c_nationkey = r.c_nationkey AND l.c_mktsegment = r.c_mktsegment",
    "l.c_nationkey = r.c_nationkey")
  private val NTrials = 2
  private val Threshold = 0.01

  private val draws = AutoLinker.warmupDraws(Seed, Attrs, RuleChoices, NTrials)

  /** The Spark side: the REAL `autoLink` loop, two trials, with the two
    * oracle-enabling knobs (explicit candidate rules, uid-ordered u pairing) and
    * cleaning off so the SQL replays raw columns.
    */
  def twoTrialsQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").cast("string").as("uid"),
        col("c_name"), col("c_mktsegment"),
        col("c_nationkey").cast("string").as("c_nationkey"))
    val res = AutoLinker.autoLink(df, uidCol = "uid",
      attributeColumns = Some(Attrs), maxEvals = NTrials, seed = Seed,
      clusterThreshold = Threshold, cleaningMode = "none",
      candidateRuleOverride = Some(RuleChoices), uDeterministicOrder = true)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    res.trials.zipWithIndex.map { case (t, i) =>
      (i + 1L, t.blockingRule, r6(t.model.lambda), r6(t.metric),
        t.asInstanceOf[AnyRef] eq res.best.asInstanceOf[AnyRef])
    }.toDF("trial", "blocking_rule", "lambda", "trial_metric", "is_best")
  }

  // ---- generated DuckDB oracle --------------------------------------------

  private def d(x: Double): String = graft.util.Render.sqlDouble(x)
  private val G = 3 // gamma levels 0..2 (−1 = null handled by the ladders' ELSE)

  private case class SessionPlan(blocked: Seq[String], freeIdx: Int)
  private case class TrialPlan(
      t: Int,
      specs: Seq[ComparisonSpec],
      rule: String,
      ruleCols: Seq[String],
      sessions: Seq[SessionPlan])

  private val plans: Seq[TrialPlan] = draws.zipWithIndex.map {
    case ((specs, rule, trules), i) =>
      val parsed = graft.blocking.BlockingRule.parse(rule)
      require(parsed.branches.size == 1, "oracle covers single-branch rules only")
      val sessions = trules.map { tr =>
        val blocked = graft.blocking.BlockingRule.parse(tr).columns
        val free = Attrs.indices.filter(ix => !blocked.contains(Attrs(ix)))
        require(free.size == 1,
          s"oracle expects exactly one free column per training rule, got $free for $tr")
        SessionPlan(blocked, free.head)
      }
      TrialPlan(i + 1, specs, rule, parsed.branches.head, sessions)
  }

  /** J4: per-trial sampled-u one-row CTE `u_t(u_<col>_<gamma> …)` over the shared
    * ring pairing, with `estimateUFromPairs`' exact floors (cnt / max(total, 1),
    * then the 1e-9 floor).
    */
  private def uCtes(p: TrialPlan): String = {
    val gs = Attrs.zipWithIndex.map { case (c, i) =>
      s"(${LinkageQueries.gammaPairSql(s"${c}_l", s"${c}_r", p.specs(i)).replace('\n', ' ')}) AS g$i"
    }.mkString(",\n    ")
    val cols = Attrs.indices.flatMap { i =>
      (0 until G).map { g =>
        s"GREATEST(SUM(CASE WHEN g$i = $g THEN 1 ELSE 0 END)::DOUBLE / " +
          s"GREATEST(SUM(CASE WHEN g$i >= 0 THEN 1 ELSE 0 END)::DOUBLE, 1.0), 1e-9) AS u_${i}_$g"
      }
    }.mkString(",\n    ")
    s"""ug_${p.t} AS MATERIALIZED (
       |  SELECT
       |    $gs
       |  FROM up
       |), u_${p.t} AS MATERIALIZED (
       |  SELECT
       |    $cols
       |  FROM ug_${p.t}
       |)""".stripMargin
  }

  private def lam0Expr(t: Int, k: Int): String =
    if (k == 1) "(SELECT 1.0 / n FROM nr)" else s"(SELECT lam FROM e_${t}_${k - 1})"

  /** J5: one EM session — pattern table over the training-rule block, a 25-step
    * freeze-on-convergence chain, and the `emFromPatterns` empty-block pass-through.
    */
  private def sessionCtes(p: TrialPlan, k: Int): String = {
    val sp = p.sessions(k - 1)
    val f = sp.freeIdx
    val id = s"${p.t}_$k"
    val joinCond = sp.blocked.map(c => s"l.$c = r.$c").mkString(" AND ")
    val gammaExpr = LinkageQueries
      .gammaPairSql(s"l.${Attrs(f)}", s"r.${Attrs(f)}", p.specs(f)).replace('\n', ' ')
    val pat =
      s"""pat_$id AS MATERIALIZED (
         |  SELECT ($gammaExpr) AS g0, COUNT(*)::DOUBLE AS cnt
         |  FROM b l JOIN b r ON $joinCond AND l.uid < r.uid
         |  GROUP BY 1
         |), pc_$id AS (SELECT COUNT(*) AS npat FROM pat_$id)""".stripMargin
    val p0 = {
      val ms = (0 until G).map(g => s"${d(Estimation.DefaultM(g))} AS m_$g").mkString(", ")
      val us = (0 until G).map(g => s"(SELECT u_${f}_$g FROM u_${p.t}) AS u_$g").mkString(", ")
      s"""p_${id}_0 AS (
         |  SELECT ${lam0Expr(p.t, k)} AS lam, $ms, $us, FALSE AS done
         |)""".stripMargin
    }
    def iter(j: Int): String = {
      val pv = s"p_${id}_${j - 1}"
      def ladder(pfx: String) = "(CASE pat.g0 " +
        (0 until G).map(g => s"WHEN $g THEN p.${pfx}_$g").mkString(" ") + " ELSE 1.0 END)"
      val sums = (0 until G).flatMap(g => Seq(
        s"SUM(CASE WHEN g0 = $g THEN cnt * (num / (num + den)) ELSE 0.0 END) AS mw_$g",
        s"SUM(CASE WHEN g0 = $g THEN cnt * (1.0 - num / (num + den)) ELSE 0.0 END) AS uw_$g"))
        .mkString(",\n    ")
      def refit(pfx: String, out: String) = {
        val tot = (0 until G).map(g => s"${pfx}_$g").mkString(" + ")
        (0 until G).map(g =>
          s"GREATEST(${pfx}_$g / GREATEST($tot, 1e-9), 1e-9) AS ${out}_$g").mkString(",\n    ")
      }
      val allParams = "lam" +: (0 until G).flatMap(g => Seq(s"m_$g", s"u_$g"))
      val frozen = allParams.map(c =>
        s"CASE WHEN d.done THEN d.$c ELSE n.$c END AS $c").mkString(",\n    ")
      val delta = allParams.map(c => s"ABS(n.$c - d.$c)").mkString("GREATEST(", ", ", ")")
      s"""w_${id}_$j AS (
         |  SELECT pat.g0, pat.cnt,
         |    (p.lam * ${ladder("m")}) AS num,
         |    ((1.0 - p.lam) * ${ladder("u")}) AS den
         |  FROM pat_$id pat, $pv p
         |), s_${id}_$j AS (
         |  SELECT SUM(cnt) AS total, SUM(cnt * (num / (num + den))) AS sumw,
         |    $sums
         |  FROM w_${id}_$j
         |), n_${id}_$j AS (
         |  SELECT LEAST(GREATEST(sumw / total, 1e-9), 1.0 - 1e-9) AS lam,
         |    ${refit("mw", "m")},
         |    ${refit("uw", "u")}
         |  FROM s_${id}_$j
         |), p_${id}_$j AS MATERIALIZED (
         |  SELECT
         |    $frozen,
         |    (d.done OR $delta <= 0.01) AS done
         |  FROM $pv d, n_${id}_$j n
         |)""".stripMargin
    }
    val eCte = {
      val guard = s"(SELECT npat FROM pc_$id) = 0"
      val ms = (0 until G).map(g =>
        s"CASE WHEN $guard THEN ${d(Estimation.DefaultM(g))} ELSE p.m_$g END AS m_$g")
      val us = (0 until G).map(g =>
        s"CASE WHEN $guard THEN (SELECT u_${f}_$g FROM u_${p.t}) ELSE p.u_$g END AS u_$g")
      val lam = s"CASE WHEN $guard THEN ${lam0Expr(p.t, k)} ELSE p.lam END AS lam"
      s"""e_$id AS (
         |  SELECT ${(lam +: ms) ++ us mkString ",\n    "}
         |  FROM p_${id}_25 p
         |)""".stripMargin
    }
    (Seq(pat, p0) ++ (1 to 25).map(iter) :+ eCte).mkString(",\n")
  }

  /** `Estimation.train`'s averaging: per column, m over the sessions that freed it
    * (DefaultM when none), u over the sampled estimate plus those sessions.
    */
  private def modelCte(p: TrialPlan): String = {
    val cols = Attrs.indices.flatMap { i =>
      val ks = p.sessions.zipWithIndex.collect { case (s, k0) if s.freeIdx == i => k0 + 1 }
      (0 until G).flatMap { g =>
        val mExpr =
          if (ks.isEmpty) d(Estimation.DefaultM(g))
          else ks.map(k => s"(SELECT m_$g FROM e_${p.t}_$k)")
            .mkString("(", " + ", s") / ${d(ks.size.toDouble)}")
        val uExpr = (s"(SELECT u_${i}_$g FROM u_${p.t})" +:
          ks.map(k => s"(SELECT u_$g FROM e_${p.t}_$k)"))
          .mkString("(", " + ", s") / ${d((ks.size + 1).toDouble)}")
        Seq(s"$mExpr AS m_${i}_$g", s"$uExpr AS u_${i}_$g")
      }
    }
    s"""fp_${p.t} AS (
       |  SELECT (SELECT lam FROM e_${p.t}_${p.sessions.size}) AS lam,
       |    ${cols.mkString(",\n    ")}
       |)""".stripMargin
  }

  /** J6 predict + J7 closure + Y8 metric for one trial, parameters read from the
    * trained CTEs. Weight arithmetic mirrors `FellegiSunter.score` exactly:
    * log2(λ/(1−λ)) + Σ log2(m[γ]/u[γ]) with γ∈{−1, unmatched} contributing 0, and
    * p = 1/(1+2^−w).
    */
  private def trialTail(p: TrialPlan): String = {
    val t = p.t
    val gammas = Attrs.zipWithIndex.map { case (c, i) =>
      s"(${LinkageQueries.gammaPairSql(s"l.$c", s"r.$c", p.specs(i)).replace('\n', ' ')}) AS g$i"
    }.mkString(",\n    ")
    val joinCond = p.ruleCols.map(c => s"l.$c = r.$c").mkString(" AND ")
    val bfs = Attrs.indices.map { i =>
      "(CASE pp.g" + i + " " +
        (0 until G).map(g =>
          s"WHEN $g THEN LN(fp.m_${i}_$g / fp.u_${i}_$g) / LN(2.0)").mkString(" ") +
        " ELSE 0.0 END)"
    }
    val weight = (s"(LN(fp.lam / (1.0 - fp.lam)) / LN(2.0))" +: bfs).mkString(" + ")
    // NULLIF keeps LOG10 off zero when a trial yields NO non-singleton clusters
    // (cNum = 0): the NULL rides through is/ia and POWER, and the final COALESCE
    // lands 1.0 — exactly the driver's pow(0, 0) for an all-singleton clustering
    // (empty-aggregation entropies read back as 0.0 in dualBaseEntropy).
    def whole(c: String, base: String) =
      s"""((SELECT -COALESCE(SUM(pr*LOG10(pr)), 0.0) FROM (
         |  SELECT COUNT(*)::DOUBLE/(SELECT COUNT(*) FROM matched_$t) AS pr
         |  FROM matched_$t GROUP BY $c)) / LOG10(NULLIF($base, 0.0)))""".stripMargin
    def byCl(c: String, base: String) =
      s"""((WITH pc AS (SELECT cluster_id, $c AS v, COUNT(*)::DOUBLE AS cc
         |  FROM matched_$t GROUP BY 1, 2),
         |tot AS (SELECT cluster_id, SUM(cc) AS tt FROM pc GROUP BY 1),
         |e AS (SELECT pc.cluster_id, -SUM((cc/tt)*LOG10(cc/tt)) AS ent
         |      FROM pc JOIN tot USING (cluster_id) GROUP BY 1)
         |SELECT AVG(ent) FROM e) / LOG10(NULLIF($base, 0.0)))""".stripMargin
    val cNum = s"(SELECT COUNT(*)::DOUBLE FROM sz_$t WHERE szc > 1)"
    val uBase = Attrs.map(c => s"(SELECT COUNT(DISTINCT $c) FROM b)")
      .mkString("GREATEST(", ", ", ")::DOUBLE")
    val is = Attrs.map(c => s"(${whole(c, cNum)} - ${byCl(c, cNum)})").mkString(" + ")
    val ia = Attrs.map(c => s"(${whole(c, uBase)} - ${byCl(c, uBase)})").mkString(" + ")
    s"""pp_$t AS MATERIALIZED (
       |  SELECT l.uid AS uid_l, r.uid AS uid_r,
       |    $gammas
       |  FROM b l JOIN b r ON $joinCond AND l.uid < r.uid
       |), pw_$t AS (
       |  SELECT uid_l, uid_r, ($weight) AS mw
       |  FROM pp_$t pp, fp_$t fp
       |), m_$t AS MATERIALIZED (
       |  SELECT uid_l, uid_r FROM pw_$t
       |  WHERE 1.0 / (1.0 + POWER(2.0, -mw)) >= ${d(Threshold)}
       |), edges_$t AS (
       |  SELECT uid_l AS ea, uid_r AS eb FROM m_$t
       |  UNION ALL
       |  SELECT uid_r, uid_l FROM m_$t
       |), reach_$t(node, r) AS (
       |  SELECT uid, uid FROM b
       |  UNION
       |  SELECT e.eb, reach_$t.r FROM reach_$t JOIN edges_$t e ON e.ea = reach_$t.node
       |), cl_$t AS MATERIALIZED (
       |  SELECT node, MIN(r) AS cluster_id FROM reach_$t GROUP BY node
       |), sz_$t AS (
       |  SELECT cluster_id, COUNT(*) AS szc FROM cl_$t GROUP BY cluster_id
       |), matched_$t AS MATERIALIZED (
       |  SELECT cl.cluster_id, ${Attrs.map(c => s"b.$c").mkString(", ")}
       |  FROM cl_$t cl JOIN b ON b.uid = cl.node
       |  JOIN sz_$t sz ON sz.cluster_id = cl.cluster_id
       |  WHERE sz.szc > 1
       |), sm_$t AS (
       |  SELECT (SELECT lam FROM fp_$t) AS lam,
       |    COALESCE(POWER($is, $ia), 1.0) AS metric_raw
       |)""".stripMargin
  }

  /** The full generated statement. */
  val twoTrialsSql: String = {
    val offsets = (1 to 4).map { off =>
      val sel = Attrs.flatMap(c => Seq(s"l.$c AS ${c}_l", s"r.$c AS ${c}_r"))
        .mkString(", ")
      s"""  SELECT $sel
         |  FROM ur l CROSS JOIN nr JOIN ur r ON r.rn = (l.rn + $off) % nr.n""".stripMargin
    }.mkString("\n  UNION ALL\n")
    def lit(s: String) = s.replace("'", "''")
    val perTrial = plans.map { p =>
      (Seq(uCtes(p)) ++ (1 to p.sessions.size).map(k => sessionCtes(p, k)) ++
        Seq(modelCte(p), trialTail(p))).mkString(",\n")
    }.mkString(",\n")
    s"""WITH RECURSIVE b AS MATERIALIZED (
       |  SELECT CAST(c_custkey AS VARCHAR) AS uid, c_name, c_mktsegment,
       |         CAST(c_nationkey AS VARCHAR) AS c_nationkey
       |  FROM customer
       |), nr AS (SELECT COUNT(*)::BIGINT AS n FROM b
       |), ur AS MATERIALIZED (
       |  SELECT uid, ${Attrs.mkString(", ")}, ROW_NUMBER() OVER (ORDER BY uid) - 1 AS rn
       |  FROM b
       |), up AS MATERIALIZED (
       |$offsets
       |),
       |$perTrial
       |SELECT CAST(1 AS BIGINT) AS trial, '${lit(plans(0).rule)}' AS blocking_rule,
       |  ROUND(s1.lam, 6) AS lambda, ROUND(s1.metric_raw, 6) AS trial_metric,
       |  (s1.metric_raw >= s2.metric_raw) AS is_best
       |FROM sm_1 s1, sm_2 s2
       |UNION ALL
       |SELECT CAST(2 AS BIGINT), '${lit(plans(1).rule)}',
       |  ROUND(s2.lam, 6), ROUND(s2.metric_raw, 6),
       |  (s2.metric_raw > s1.metric_raw)
       |FROM sm_1 s1, sm_2 s2
       |ORDER BY trial""".stripMargin
  }
}
