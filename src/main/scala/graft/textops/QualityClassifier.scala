package graft.textops

import org.apache.commons.math3.linear.{Array2DRowRealMatrix, ArrayRealVector, LUDecomposition}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastText-style quality classifier for corpus curation: logistic regression over
  * cheap text features, trained by distributed Newton / IRLS — per iteration ONE
  * aggregation job computes the gradient, the Hessian's upper triangle, and the loss
  * as `dim·(dim+3)/2 + 2` partial sums, and the driver solves the dim×dim system
  * (dim ≈ 10, so the solve is microseconds).
  *
  * Scale posture: the featurized (label, features) projection is persisted once; each
  * iteration is map-side partial aggregation with no row shuffle and no UDFs, so
  * 100 TB feasibility = "can you afford ~8 cached-scan aggregations" — and Newton
  * needs no learning-rate tuning, unlike first-order GD, which oscillates or crawls
  * depending on feature scaling.
  */
object QualityClassifier {

  /** Fixed text feature vector (all ∈ [0,1]): bias, length saturation, punctuation
    * ratio, English-stopword ratio, and one marker-word ratio per language — the
    * standard cheap signals for pretraining quality/language filters.
    */
  def textFeatures(c: Column): Column = {
    val langRatios = TextOps.LangMarkers.map { case (_, ms) => TextOps.wordSetRatio(c, ms) }
    array(Seq(
      lit(1.0),
      least(lit(1.0), TextOps.tokenCount(c).cast("double") / lit(100.0)),
      TextOps.punctRatio(c),
      TextOps.wordSetRatio(c, TextOps.EnglishStopwords)) ++ langRatios: _*)
  }

  /** σ(w·x) with a literal weight vector — one codegen'd primitive-loop dot per row. */
  def score(features: Column, weights: Array[Double]): Column =
    lit(1.0) / (lit(1.0) +
      exp(-graft.functions.array_dot(features, typedLit(weights.toSeq))))

  final case class Model(weights: Array[Double], losses: Seq[Double])

  /** Newton/IRLS on logistic loss with a small ridge for stability (also bounds the
    * weights when the classes are linearly separable). `labelCol` must be 0/1-valued.
    */
  def fit(
      df: DataFrame,
      featuresCol: Column,
      labelCol: Column,
      dim: Int,
      iters: Int = 8,
      ridge: Double = 1e-4): Model = {
    val staged = df.select(labelCol.cast("double").as("y"), featuresCol.as("x")).persist()
    try {
      var w = Array.fill(dim)(0.0)
      val losses = Seq.newBuilder[Double]
      val upper = for (j <- 0 until dim; l <- j until dim) yield (j, l)
      for (_ <- 0 until iters) {
        val p = score(col("x"), w)
        val scored = staged.select(col("y"), col("x"), p.as("p"))
        // clamp only inside the loss: saturated probabilities would log(0)
        val pc = least(greatest(col("p"), lit(1e-12)), lit(1.0 - 1e-12))
        val aggs =
          (0 until dim).map(j =>
            sum((col("p") - col("y")) * element_at(col("x"), j + 1)).as(s"g$j")) ++
          upper.map { case (j, l) =>
            sum(col("p") * (lit(1.0) - col("p")) *
              element_at(col("x"), j + 1) * element_at(col("x"), l + 1)).as(s"h${j}_$l")
          } ++
          Seq(sum(-(col("y") * log(pc) + (lit(1.0) - col("y")) * log(lit(1.0) - pc)))
            .as("loss"),
            count(lit(1)).as("n"))
        val row = scored.agg(aggs.head, aggs.tail: _*).first()
        val n = row.getLong(aggs.size - 1).toDouble
        val g = Array.tabulate(dim)(j => row.getDouble(j) / n)
        val h = new Array2DRowRealMatrix(dim, dim)
        upper.zipWithIndex.foreach { case ((j, l), i) =>
          val v = row.getDouble(dim + i) / n
          h.setEntry(j, l, v)
          h.setEntry(l, j, v)
        }
        (0 until dim).foreach(j => h.addToEntry(j, j, ridge))
        val step = new LUDecomposition(h).getSolver.solve(new ArrayRealVector(g))
        w = Array.tabulate(dim)(j => w(j) - step.getEntry(j))
        losses += row.getDouble(aggs.size - 2) / n
      }
      Model(w, losses.result())
    } finally staged.unpersist()
  }

  /** Adds `p_quality` = σ(w·features). */
  def predict(df: DataFrame, featuresCol: Column, model: Model): DataFrame =
    df.withColumn("p_quality", score(featuresCol, model.weights))
}
