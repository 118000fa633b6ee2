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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("e3_entropy_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExpressionQueries.queries ++ LinkageQueries.queries

  def oracleSql: Map[String, String] =
    ExpressionQueries.oracleSql ++ LinkageQueries.oracleSql
}
