package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
    // update mode: the watermark purges closed-window state (complete mode never
    // purges — unbounded state on a real stream), yet unlike append the still-open
    // final windows are emitted too, so a bounded drive yields the full result.
    // Each window's LAST update (highest cnt) is the final value.
    val q = stream.writeStream
      .outputMode("update")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .groupBy(col("w"), col("event_type"))
      .agg(max("cnt").as("cnt"), expr("max_by(value_sum, cnt)").as("value_sum"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("cnt"),
        round(col("value_sum"), 4).as("value_sum"))
  }

  /** Streaming exact dedup: `dropDuplicates` on the content hash holds every seen
    * hash in state, so duplicates arriving in ANY later micro-batch are dropped —
    * the ingest-time shape of training-data dedup (batch equivalent:
    * [[graft.textops.Dedup.exact]]). Emits per-`lang` unique-document counts.
    *
    * On a real unbounded stream the state needs an eviction contract:
    * `dropDuplicatesWithinWatermark` bounds it to the dedup horizon (requires an
    * event-time column; the documents corpus has none, so the test path keeps full
    * state, which is exact and bounded by #unique documents).
    */
  def streamingExactDedup(spark: SparkSession, corpusDir: String): DataFrame = {
    val schema = spark.read.parquet(corpusDir).schema
    val name = s"stream_dedup_${System.nanoTime()}"
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // one file per micro-batch: dedup must cross batches
      .parquet(corpusDir)
      .withColumn("h", md5(col("text")))
      .dropDuplicates("h")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_unique"))
    val q = stream.writeStream
      .outputMode("complete") // tiny keyed aggregate (one row per lang), not raw state
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Streaming corpus curation: the codegen'd quality/language expressions run
    * unchanged under Structured Streaming (stateless projection + filter, then a tiny
    * keyed aggregate) — the ingest-time filter shape for a training-data feed. Emits
    * per predicted language: surviving doc count + token sum.
    */
  def streamingQualityFilter(spark: SparkSession, docsPath: String): DataFrame = {
    import graft.textops.TextOps
    val schema = spark.read.parquet(docsPath).schema
    val name = s"stream_quality_${System.nanoTime()}"
    val dir = new java.io.File(docsPath).getParent
    val fileName = new java.io.File(docsPath).getName
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", fileName)
      .parquet(dir)
      .select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        round(TextOps.qualityScore(col("text")), 6).as("quality"),
        TextOps.langId(col("text")).as("pred_lang"))
      .filter(col("pred_lang") =!= "und" && col("n_tokens") >= 5 && col("quality") >= 0.3)
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
    val q = stream.writeStream
      .outputMode("complete") // tiny keyed aggregate (≤ #languages rows)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark` evicts a
    * key's state once the watermark passes its event time + `delay`, so state holds
    * only the dedup horizon — the production shape for unbounded streams (plain
    * `dropDuplicates` state grows forever). Expects `ts` as long nanoseconds (the
    * events schema); dedup key = (user_id, event_type, ts). Emits the deduplicated
    * rows (append mode — each key exactly once).
    */
  def streamingDedupWithinWatermark(
      spark: SparkSession,
      eventsDir: String,
      delay: String = "365 days"): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    val name = s"stream_dedup_wm_${System.nanoTime()}"
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1) // duplicates arrive in later micro-batches
      .parquet(eventsDir)
      .withColumn("k", concat_ws("|", col("user_id"), col("event_type"), col("ts")))
      .withColumn("event_ts", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_ts", delay)
      .dropDuplicatesWithinWatermark("k")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  case class UserTotal(user_id: Long, n_events: Long, value_sum: Double)

  /** Custom streaming state via `mapGroupsWithState`: per-user running totals held in
    * `GroupState` across micro-batches (the building block for sessionization /
    * per-entity accumulators). Drives the stream to completion and returns the final
    * per-user totals — equal to the batch aggregate, which is the correctness oracle.
    */
  def statefulUserTotals(spark: SparkSession, eventsPath: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(eventsPath).schema
    val dir = new java.io.File(eventsPath).getParent
    val fileName = new java.io.File(eventsPath).getName
    val name = s"stream_state_${System.nanoTime()}"
    val raw = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", fileName)
      .parquet(dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("value").cast("double").as("value"))
      .as[(Long, Double)]
    val totals = raw
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotal]) =>
          val prev = state.getOption.getOrElse(UserTotal(user, 0L, 0.0))
          val next = rows.foldLeft(prev) { case (acc, (_, v)) =>
            UserTotal(user, acc.n_events + 1, acc.value_sum + v)
          }
          state.update(next)
          next
      }
    val q = totals.writeStream
      .outputMode(OutputMode.Update)
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // keep the last update per user (a single-batch file source emits one each)
    spark.table(name)
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("value_sum").as("value_sum"))
      .select(col("user_id"), col("n_events"),
        round(col("value_sum"), 4).as("value_sum"))
  }
}
