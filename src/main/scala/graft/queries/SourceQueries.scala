package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.BucketedTables

/** SparkEntry query + oracle entries for the source/sink layer: bucketed co-located
  * joins (shuffle moved to write time), JSONL corpus interchange.
  */
object SourceQueries {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/$name"

  /** Per-JVM token for scratch paths — concurrent harness runs must not collide. */
  private val RunToken = java.util.UUID.randomUUID().toString.take(8)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_bucketed_join" -> { (s, dir) =>
      // stage both sides bucketed on the join key, then join + aggregate; the join
      // itself reads co-located buckets (no Exchange — pinned by SourcesSpec)
      val customer = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"))
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
      BucketedTables.writeBucketed(customer, "graft_bkt_customer",
        tmp("customer"), "c_custkey", 8, Seq("c_custkey"))
      BucketedTables.writeBucketed(orders, "graft_bkt_orders",
        tmp("orders"), "c_custkey", 8, Seq("c_custkey"))
      BucketedTables.colocatedJoin(s, "graft_bkt_customer", "graft_bkt_orders",
          Seq("c_custkey"))
        // exact integer cents so the double-summation order can't drift vs the oracle
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        .orderBy("c_mktsegment")
    },
    "src_jsonl_roundtrip" -> { (s, dir) =>
      // JSONL is the de-facto LLM-corpus interchange format: write the documents
      // table as gzip JSONL, read it back with an EXPLICIT schema (schema inference
      // costs a full extra pass at corpus scale), and prove the round-trip lossless
      // by aggregating content hashes of what is actually on disk
      val docs = s.read.parquet(s"$dir/documents.parquet")
      // per-JVM token (concurrent-run safe) + delete-at-exit (no tmp accumulation)
      val path = graft.util.Scratch.deleteOnExit(
        s"${System.getProperty("java.io.tmpdir")}/graft_jsonl/$RunToken") + "/documents"
      docs.write.mode("overwrite").option("compression", "gzip").json(path)
      val back = s.read.schema(docs.schema).json(path)
      back.groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("n_chars"),
          count_distinct(md5(col("text"))).as("n_unique"))
        .orderBy("lang")
    })

  val oracleSql: Map[String, String] = Map(
    "src_bucketed_join" ->
      """SELECT c_mktsegment,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // the oracle reads the PARQUET originals: equality proves the JSONL round-trip
    // preserved every document byte-for-byte
    "src_jsonl_roundtrip" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  COUNT(DISTINCT md5(text)) AS n_unique
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
}
