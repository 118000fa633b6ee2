package graft

import org.apache.spark.sql.functions._

import graft.sources.BucketedTables

class SourcesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join with no Exchange and match the direct parquet join") {
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_spec"
    BucketedTables.writeBucketed(customer, "spec_bkt_customer",
      s"$base/customer", "c_custkey", 4, Seq("c_custkey"))
    BucketedTables.writeBucketed(orders, "spec_bkt_orders",
      s"$base/orders", "c_custkey", 4, Seq("c_custkey"))

    val conf = spark.conf
    val (aqe, bcast) = (conf.get("spark.sql.adaptive.enabled"),
      conf.get("spark.sql.autoBroadcastJoinThreshold"))
    try {
      // forbid broadcast + AQE so the plan must stand on bucketing alone
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = BucketedTables.colocatedJoin(spark,
        "spec_bkt_customer", "spec_bkt_orders", Seq("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(3000)}")

      val viaBuckets = joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted
      val direct = customer.join(orders, Seq("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), r.getLong(1))).sorted
      assert(viaBuckets === direct)
    } finally {
      conf.set("spark.sql.adaptive.enabled", aqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql("DROP TABLE IF EXISTS spec_bkt_customer")
      spark.sql("DROP TABLE IF EXISTS spec_bkt_orders")
    }
  }
}
