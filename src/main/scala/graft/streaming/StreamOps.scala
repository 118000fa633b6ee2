package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured-streaming operators over the events stream. The reference is batch-only;
  * these cover the streaming leg a large-scale ingest pipeline needs: windowed
  * aggregation with watermarking, executed on the same code path a `readStream` from
  * Kafka/files would use. For verification the file source drives the stream to
  * completion synchronously (memory sink + processAllAvailable).
  */
object StreamOps {

  /** Tumbling 1-hour windows per event type: count + value sum. Runs the streaming
    * query to completion over the parquet-backed source and returns the result table.
    */
  def windowedEventCounts(spark: SparkSession, eventsPath: String): DataFrame = {
    val schema = spark.read.parquet(eventsPath).schema
    val name = s"stream_agg_${System.nanoTime()}"
    // the streaming file source wants a directory: stream the parent dir with a
    // filename glob so only the events file feeds the query
    val dir = new java.io.File(eventsPath).getParent
    val fileName = new java.io.File(eventsPath).getName
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", fileName)
      .parquet(dir)
    // ts may arrive as long nanos (legacy parquet nanos) — normalize to timestamp
    val withTs = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros((col("ts") / 1000).cast("long")))
      case _ => raw
    }
    val stream = withTs
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("value_sum"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"),
        round(col("value_sum"), 4).as("value_sum"))
  }
}
