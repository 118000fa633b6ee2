package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY §2 to a DataFrame program over
  * the testdata tables; `oracleSql` holds the DuckDB-equivalent SQL for each (omitted
  * only for genuinely non-SQL-expressible iterative ops, which are pinned by ScalaTest
  * oracles instead).
  */
object SparkEntry {

  /** Flagship: the end-to-end unsupervised dedupe pipeline on sf0.001
    * (clean → block → gammas → u/EM training → Fellegi-Sunter predict → cluster).
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.e2eDedupe(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExpressionQueries.queries ++ LinkageQueries.queries ++ MetricQueries.queries ++
      PipelineQueries.queries ++ TextQueries.queries ++ CurationQueries.queries ++ MlQueries.queries ++ LinkQueries.queries ++ SourceQueries.queries ++ SketchQueries.queries ++ GraphQueries.queries

  def oracleSql: Map[String, String] =
    ExpressionQueries.oracleSql ++ LinkageQueries.oracleSql ++ MetricQueries.oracleSql ++
      PipelineQueries.oracleSql ++ TextQueries.oracleSql ++ CurationQueries.oracleSql ++ MlQueries.oracleSql ++ LinkQueries.oracleSql ++ SourceQueries.oracleSql ++ SketchQueries.oracleSql ++ GraphQueries.oracleSql
}
