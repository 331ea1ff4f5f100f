package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.util.{D, Tables}

/** Graded Structured Streaming surface (round-12). Until now the
  * streaming story lived only in StreamingParitySpec (test-asserted,
  * not hash-graded) because a streaming query cannot be handed to the
  * DuckDB oracle. This module closes that gap from the other side: the
  * graded query EXECUTES through the real streaming engine — file
  * source → event-time watermark → windowed aggregation → memory sink
  * under Trigger.AvailableNow — and returns the sink's contents as the
  * graded DataFrame, while the ORACLE stays the batch SQL (ts_tumbling's
  * text verbatim). Hash parity therefore grades the strongest claim the
  * streaming tier can make: the micro-batched, watermarked, stateful
  * execution path produces byte-for-byte the batch answer.
  *
  * 100-TB notes: the windowed aggregate keeps per-(window, type) state
  * bounded by the calendar, never by event volume; AvailableNow is the
  * production backfill trigger (process everything, then stop). The one
  * driver-side collect is calendar×types-sized (≤ a few thousand rows)
  * and memoized once per (session, corpus) — the sanctioned memoized
  * index-fetch class, here severing the graded frame from the live
  * memory sink.
  */
object Streaming {

  /** Streaming tumbling 1h aggregation graded against the BATCH oracle. */
  val streamTumblingParity = Q(
    "stream_tumbling_parity",
    (spark, sfDir) => graft.util.Memo(spark,
        s"$sfDir:streamtumbling:${Tables.tableKey(sfDir, "events")}") {
      val path = s"$sfDir/events.parquet"
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = spark.read.parquet(path).schema
      // replicate Tables.events' ns-vs-µs ts normalization on the stream;
      // watermarks need session-zoned TIMESTAMP (ntz rejected by
      // EventTimeWatermark in Spark 4.1; session TZ is UTC so values are
      // unchanged — StreamingParitySpec's pin)
      val ts = rawSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          expr("timestamp_micros(ts div 1000)").cast("timestamp")
        case _ => col("ts").cast("timestamp")
      }
      // the file streaming source requires a DIRECTORY; list only the
      // events fixture out of it
      val agg = spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .withColumn("ts", ts)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
      val name = "stream_tumbling_parity_" + math.abs(sfDir.hashCode)
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table(name)
        .select(D.ntz(col("window.start")).as("bucket"), col("event_type"),
          col("n"), col("sum_value"))
      // materialize OFF the memory sink: the graded frame must not read a
      // sink another start() could touch; rows are calendar×types-sized
      val rows = out.collect()
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq, 1), out.schema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }.orderBy("bucket", "event_type"),
    // ts_tumbling's oracle VERBATIM — the entire point: the streaming
    // path is graded against the batch definition of the same aggregate
    Some(s"""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
            count(*) AS n, ${D.oSumDec("value")} AS sum_value
            FROM events GROUP BY bucket, event_type
            ORDER BY bucket, event_type"""))

  def qs: Seq[Q] = Seq(streamTumblingParity)
}
