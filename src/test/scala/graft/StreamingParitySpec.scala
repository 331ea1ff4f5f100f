package graft

import java.nio.file.Files
import graft.util.Tables
import graft.util.D
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Batch/stream parity (SURVEY §2.10, §5.5): the same window expressions
  * produce identical aggregates under Structured Streaming micro-batches —
  * proving the "stream table" capability without declaring an un-oracle-able
  * streaming query. */
class StreamingParitySpec extends SparkSpec {

  /** Watermarks require session-zoned TIMESTAMP (ntz is rejected by
    * EventTimeWatermark in Spark 4.1); session TZ is UTC so the cast
    * changes no values. */
  private def stagedEventsDir(): String = {
    val dir = Files.createTempDirectory("graft_stream_").toString
    val ev = Tables.events(spark, sf0001)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    // four chunks → four micro-batches under maxFilesPerTrigger=1
    (0 until 4).foreach { i =>
      ev.filter(pmod(col("event_id"), lit(4)) === i)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  test("tumbling 1h aggregation: streaming result == batch result") {
    val dir = stagedEventsDir()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val agg = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
    val q = agg.writeStream.format("memory").queryName("stream_tumbling")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("stream_tumbling")
      .select(col("window.start").cast("timestamp_ntz").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("bucket"),
        col("event_type"), col("n"), col("sum_value"))
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
    assert(batch.count() > 0)
  }

  test("stateful streaming dedup == batch row_number dedup on full replay") {
    val dir = stagedEventsDir()
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    // chunks are split by event_id, not time, so each micro-batch spans the
    // whole month — the watermark delay must exceed the span or rows in
    // later batches are (correctly) dropped as late
    val deduped = stream
      .withColumn("minute", date_trunc("minute", col("ts")))
      .withWatermark("ts", "60 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "minute")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // Streaming keeps the FIRST-seen row per key; chunk order is not time
    // order, so only the kept KEY SET must match the batch dedup.
    val streamedKeys = spark.table("stream_dedup")
      .select("user_id", "event_type", "minute")
    val batchKeys = spark.read.parquet(dir)
      .select(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("minute")).distinct()
    assert(streamedKeys.count() == batchKeys.count())
    assert(streamedKeys.except(batchKeys).count() == 0)
  }
}
