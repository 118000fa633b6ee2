package graft.blocking

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — candidate-pair generation from blocking rules (reference semantics: Splink 3.9.4
  * blocking, invoked with the rules ARC passes at autolinker.py:519-521,545).
  *
  * For each OR branch (an AND of column equalities) we run one equi-join; branches are
  * unioned and deduped on the pair key. SQL `=` semantics mean null block keys never
  * match. Dedupe mode self-joins with `uid_l < uid_r` so mirror pairs collapse.
  *
  * Scale design: each branch is a shuffled equi-join on its block key (sort-merge or,
  * with AQE, shuffled-hash; a small link-side is broadcast by Catalyst automatically);
  * the final `dropDuplicates` is one more hash shuffle on the pair key. Attribute
  * columns are carried through the join (suffixed `_l`/`_r`) so downstream gamma
  * computation needs no extra join back to the inputs.
  */
object PairGenerator {

  /** Dedupe mode: candidate pairs within one table. Output columns: `uid_l`, `uid_r`,
    * and `<attr>_l` / `<attr>_r` for every attribute column.
    */
  def dedupePairs(
      df: DataFrame,
      uid: String,
      attributes: Seq[String],
      rules: Seq[BlockingRule]): DataFrame = {
    val l = sideProjection(df, uid, attributes, "_l").alias("l")
    val r = sideProjection(df, uid, attributes, "_r").alias("r")
    val branches = rules.flatMap(_.branches).distinct
    val joined = branches.map { branch =>
      val cond = branch
        .map(c => col(s"l.${c}_l") === col(s"r.${c}_r"))
        .reduce(_ && _) && col(s"l.uid_l") < col(s"r.uid_r")
      l.join(r, cond, "inner")
    }
    // a single equi-join branch cannot emit duplicate pairs — skip the dedup shuffle
    if (joined.size == 1) joined.head
    else joined.reduce(_ unionByName _).dropDuplicates("uid_l", "uid_r")
  }

  /** Link mode: candidate pairs across two tables (same schema after Y10 matching). */
  def linkPairs(
      left: DataFrame,
      right: DataFrame,
      uid: String,
      attributes: Seq[String],
      rules: Seq[BlockingRule]): DataFrame = {
    val l = sideProjection(left, uid, attributes, "_l").alias("l")
    val r = sideProjection(right, uid, attributes, "_r").alias("r")
    val branches = rules.flatMap(_.branches).distinct
    val joined = branches.map { branch =>
      val cond = branch
        .map(c => col(s"l.${c}_l") === col(s"r.${c}_r"))
        .reduce(_ && _)
      l.join(r, cond, "inner")
    }
    if (joined.size == 1) joined.head
    else joined.reduce(_ unionByName _).dropDuplicates("uid_l", "uid_r")
  }

  /** Skew-balanced dedupe pairs: same output as [[dedupePairs]], but each block key is
    * salted `saltFactor` ways — the left side gets `salt = hash(uid) % s`, the right
    * side is replicated across all salts — so one giant block spreads over `s` tasks
    * instead of pinning a single reducer. Output cardinality is unchanged (salting
    * balances the quadratic block work, it cannot reduce it); AQE's skew-join handles
    * moderate skew automatically, this is the explicit control for pathological keys.
    */
  def dedupePairsSalted(
      df: DataFrame,
      uid: String,
      attributes: Seq[String],
      rules: Seq[BlockingRule],
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1)
    // pair joins are EXPANSION joins: tiny inputs, huge output, and the gamma
    // ladder pipelines into the join stage — so join parallelism IS scoring
    // parallelism. Left to itself the planner broadcasts one tiny side and
    // streams the other at its scan partitioning (often 1 file = 1 task), and
    // AQE's size-based coalescing makes it worse (input bytes are tiny; output
    // work is not). Pin the shape instead: both sides explicitly hash-
    // repartitioned on (block key, salt) to defaultParallelism — a numbered
    // user repartition AQE never coalesces — and a merge-join hint so the join
    // reuses exactly those exchanges.
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val l0 = sideProjection(df, uid, attributes, "_l")
      .withColumn("_salt", pmod(xxhash64(col("uid_l")), lit(saltFactor)))
    val r0 = sideProjection(df, uid, attributes, "_r")
      .withColumn("_salt", explode(array((0 until saltFactor).map(lit): _*)))
    val branches = rules.flatMap(_.branches).distinct
    val joined = branches.map { branch =>
      val l = l0.repartition(parallelism,
        (branch.map(c => col(s"${c}_l")) :+ col("_salt")): _*).alias("l")
      val r = r0.repartition(parallelism,
        (branch.map(c => col(s"${c}_r")) :+ col("_salt")): _*).alias("r")
      val cond = (branch.map(c => col(s"l.${c}_l") === col(s"r.${c}_r")) :+
        (col("l._salt") === col("r._salt"))).reduce(_ && _) &&
        col(s"l.uid_l") < col(s"r.uid_r")
      l.hint("merge").join(r, cond, "inner").drop("_salt")
    }
    // the l-side salt is a FUNCTION of uid_l, so within one branch every pair
    // lands in exactly one salt bucket — a single branch needs no dedup shuffle
    // (same reasoning as the unsalted path above)
    if (joined.size == 1) joined.head
    else joined.reduce(_ unionByName _).dropDuplicates("uid_l", "uid_r")
  }

  private def sideProjection(
      df: DataFrame,
      uid: String,
      attributes: Seq[String],
      suffix: String): DataFrame =
    df.select(
      (col(uid).cast("string").as(s"uid$suffix") +:
        attributes.map(a => col(a).cast("string").as(s"$a$suffix"))): _*)
}
