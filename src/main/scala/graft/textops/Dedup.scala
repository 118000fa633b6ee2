package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, token/n-gram Jaccard,
  * MinHash+LSH, SimHash. Designed scale-first:
  *
  *   - exact dedup is one hash aggregation on the content hash;
  *   - Jaccard pair scans require explicit blocking columns — never an all-pairs join;
  *   - MinHash/LSH replaces the quadratic candidate step with `bands` equi-joins on
  *     band signatures (the standard shingle→minhash→band→bucket-join pipeline), so
  *     work scales with collisions, not corpus²;
  *   - hashes are md5-based (portable: any engine reproduces them, incl. the DuckDB
  *     correctness oracle).
  */
object Dedup {

  /** Exact dedup on content: one row per distinct text with the keeper id (minimum)
    * and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  private def jaccardSim(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  /** Pairs within the same block whose distinct-token Jaccard ≥ threshold. */
  def tokenJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCols: Seq[Column],
      threshold: Double): DataFrame =
    setJaccardPairs(df, idCol, TextOps.distinctTokens(col(textCol)), blockCols, threshold)

  /** Pairs within the same block whose word n-gram (shingle) Jaccard ≥ threshold. */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      blockCols: Seq[Column],
      threshold: Double): DataFrame =
    setJaccardPairs(df, idCol, array_distinct(TextOps.shingles(col(textCol), n)),
      blockCols, threshold)

  private def setJaccardPairs(
      df: DataFrame,
      idCol: String,
      setExpr: Column,
      blockCols: Seq[Column],
      threshold: Double): DataFrame = {
    val prepped = df.select(
      (col(idCol).as("id") +: setExpr.as("toks") +:
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk$i") }): _*)
    val keys = blockCols.indices.map(i => s"blk$i")
    val l = prepped.select(
      (Seq(col("id").as("id_l"), col("toks").as("toks_l")) ++ keys.map(col)): _*)
    val r = prepped.select(
      (Seq(col("id").as("id_r"), col("toks").as("toks_r")) ++ keys.map(col)): _*)
    l.join(r, keys)
      .filter(col("id_l") < col("id_r"))
      .withColumn("jaccard", jaccardSim(col("toks_l"), col("toks_r")))
      .filter(col("jaccard") >= threshold)
      .select("id_l", "id_r", "jaccard")
  }

  /** MinHash signature over word `n`-gram shingles: `k` portable hash functions
    * `h_j(s) = md5(j || ':' || s)`, minimum per document. One explode + one grouped
    * aggregation (k `min`s, single shuffle).
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      explode(array_distinct(TextOps.shingles(col(textCol), shingleN))).as("s"))
    sh.groupBy("id")
      .agg(
        min(md5(concat(lit("0:"), col("s")))).as("mh0"),
        (1 until k).map(j => min(md5(concat(lit(s"$j:"), col("s")))).as(s"mh$j")): _*)
  }

  /** LSH banding over the minhash signature: `k/bandSize` bands, band key = concat of
    * its rows. Documents sharing any band key become candidate pairs; candidates are
    * verified with exact shingle Jaccard and filtered at `threshold`.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      k: Int = 8,
      bandSize: Int = 2,
      shingleN: Int = 3): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, k, shingleN)
    val nBands = k / bandSize
    val bands = sigs.select(col("id"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          concat((0 until bandSize).map(i => col(s"mh${b * bandSize + i}")): _*).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val candidates = bands.alias("l")
      .join(bands.alias("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"))
      .distinct()
    val sets = df.select(col(idCol).as("id"),
      array_distinct(TextOps.shingles(col(textCol), shingleN)).as("toks"))
    candidates
      .join(sets.select(col("id").as("id_l"), col("toks").as("toks_l")), "id_l")
      .join(sets.select(col("id").as("id_r"), col("toks").as("toks_r")), "id_r")
      .withColumn("jaccard", jaccardSim(col("toks_l"), col("toks_r")))
      .filter(col("jaccard") >= threshold)
      .select("id_l", "id_r", "jaccard")
  }

  /** 16-bit SimHash over the distinct-token set, from the first 4 md5 nibbles of each
    * token (portable hex-nibble parse). Bit p is set when the signed sum over tokens
    * of (±1 by token-bit p) is non-negative. One explode + one 16-sum aggregation.
    */
  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextOps.distinctTokens(col(textCol))).as("t"))
      .withColumn("h", md5(col("t")))
    val withNibbles = (0 until 4).foldLeft(toks) { (acc, j) =>
      acc.withColumn(s"nib$j",
        (instr(lit("0123456789abcdef"), substring(col("h"), j + 1, 1)) - 1).cast("int"))
    }
    val sums = withNibbles.groupBy("id").agg(
      sum(bitTerm(0)).as("s0"),
      (1 until 16).map(p => sum(bitTerm(p)).as(s"s$p")): _*)
    val sig = (0 until 16).map(p =>
      when(col(s"s$p") >= 0, lit(1 << p)).otherwise(lit(0)))
      .reduce(_ + _)
    sums.select(col("id"), sig.as("simhash"))
  }

  private def bitTerm(p: Int): Column = {
    val nib = col(s"nib${p / 4}")
    when(shiftright(nib, p % 4).bitwiseAND(lit(1)) === 1, lit(1)).otherwise(lit(-1))
  }

  /** Near-duplicate pairs by embedding cosine ≥ threshold. Brute-force all-pairs —
    * use only on bounded corpora or behind an LSH prefilter
    * ([[Similarity.hyperplaneSignature]]) at scale.
    */
  def embeddingPairs(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    v.alias("l").join(v.alias("r"), col("l.id") < col("r.id"))
      .withColumn("cosine", Similarity.cosine(col("l.v"), col("r.v")))
      .filter(col("cosine") >= threshold)
      .select(col("l.id").as("id_l"), col("r.id").as("id_r"), col("cosine"))
  }
}
