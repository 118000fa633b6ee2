package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.textops.{QualityClassifier, TextOps}

/** SparkEntry query + oracle entries for the quality classifier: scoring with a fixed
  * pretrained weight vector is DuckDB-oracle-checked (identical feature arithmetic and
  * left-associative dot product on both sides); training is iterative and rows-only,
  * pinned by CurationSpec accuracy/loss tests.
  */
object MlQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Feature names, index-aligned with [[QualityClassifier.textFeatures]]. */
  private val FeatureNames: Seq[String] =
    Seq("bias", "len_sat", "punct_ratio", "stop_ratio") ++
      TextOps.LangMarkers.map { case (lang, _) => s"marker_$lang" }

  /** A fixed "pretrained" quality model: rewards stopword/English-marker density and
    * length, penalizes punctuation and non-English markers.
    */
  private val ScoreWeights: Array[Double] =
    Array(-3.0, 1.0, -2.0, 4.0, 3.0, -2.0, -2.0, -2.0, -2.0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_quality_score" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
          round(QualityClassifier.score(
            QualityClassifier.textFeatures(col("text")), ScoreWeights), 6)
            .as("p_quality"))
        .orderBy("doc_id")
    },
    "ml_quality_train" -> { (s, dir) =>
      // distill the rule-based quality score into a logistic model (the label is a
      // linear threshold over the features, so IRLS separates it) — iterative Newton
      // (one agg job per step), rows-only; accuracy + loss pinned by CurationSpec
      val d = docs(s, dir)
      val model = QualityClassifier.fit(d,
        QualityClassifier.textFeatures(col("text")),
        (TextOps.qualityScore(col("text")) >= 0.54).cast("int"),
        dim = FeatureNames.length, iters = 8)
      import s.implicits._
      FeatureNames.zip(model.weights).toDF("feature", "weight")
        .select(col("feature"), round(col("weight"), 3).as("weight"))
        .orderBy("feature")
    })

  // ---- oracle SQL ----------------------------------------------------------

  private def toksSql(textExpr: String) = TextQueries.toksSql(textExpr)

  private def inList(words: Seq[String]) = TextQueries.inList(words)

  private def ratioSql(words: Seq[String]) =
    s"""CASE WHEN len(toks) = 0 THEN 0.0
       |ELSE len(list_filter(toks, t -> t IN ${inList(words)}))::DOUBLE / len(toks) END"""
      .stripMargin.replace("\n", " ")

  val oracleSql: Map[String, String] = Map(
    "ml_quality_score" -> {
      val feats = Seq(
        "1.0",
        "LEAST(1.0, len(toks)::DOUBLE / 100.0)",
        """CASE WHEN length(text) = 0 THEN 0.0
          |ELSE length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))::DOUBLE / length(text) END"""
          .stripMargin.replace("\n", " "),
        ratioSql(TextOps.EnglishStopwords)) ++
        TextOps.LangMarkers.map { case (_, ms) => ratioSql(ms) }
      // left-associative sum, same accumulation order as the ArrayDot loop
      val dot = ScoreWeights.zip(feats)
        .map { case (w, f) => s"($w) * ($f)" }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM documents)
         |SELECT doc_id, ROUND(1.0 / (1.0 + exp(-($dot))), 6) AS p_quality
         |FROM t ORDER BY doc_id""".stripMargin
    })
}
