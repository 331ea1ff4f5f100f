package graft

import graft.queries.Registry
import graft.util.{D, Memo, Tables}
import org.apache.spark.sql.functions._

/** Round-16 pins: the transformWithState parity key must have TEETH (a
  * nonempty second wave folding into RESTORED state for at least one
  * user, or the restart grades nothing), its max_by recovery premise
  * must hold, and the session must come back with the state-store
  * provider conf it entered with. Plus the ADVICE-r15 items: the cents
  * helpers' documented magnitude bounds get a loud tripwire, and
  * ml_pack_bucketed's high-bits batch key must decompose collision-free.
  */
class Round16OpsSpec extends SparkSpec {

  test("stream_tws_parity: both waves nonempty and ≥1 user spans the restart at every SF") {
    for (sf <- allSfs) {
      val ev = Tables.events(spark, sf)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      val midMs = mm.getTimestamp(0).getTime +
        (mm.getTimestamp(1).getTime - mm.getTimestamp(0).getTime) / 2
      val split = new java.sql.Timestamp(midMs)
      val w1 = ev.filter(col("ts") <= lit(split))
      val w2 = ev.filter(col("ts") > lit(split))
      assert(w1.count() >= 1, s"$sf: empty wave 1 — nothing to snapshot")
      assert(w2.count() >= 1, s"$sf: empty wave 2 — restart folds nothing")
      val spanning = w1.select("user_id").distinct()
        .join(w2.select("user_id").distinct(), "user_id").count()
      assert(spanning >= 1,
        s"$sf: no user in both waves — restored-state fold untested")
    }
  }

  test("stream_tws_parity graded frame == independently recomputed batch census (sf0.001)") {
    val out = Registry.byName("stream_tws_parity").build(spark, sf0001)
    val expected = Tables.events(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * lit(100), 0).cast("bigint")).as("sum_cents"))
      .orderBy("user_id")
    assert(out.collect().toSeq == expected.collect().toSeq)
    Memo.clear(spark)
  }

  test("stream_tws_parity restores the state-store provider conf it scoped") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    Registry.byName("stream_tws_parity").build(spark, sf0001).count()
    assert(spark.conf.getOption(key) == before,
      "RocksDB provider conf leaked out of the memoized build")
    Memo.clear(spark)
  }

  test("stream_state_reader_parity: sink files and retained state PARTITION the batch aggregate (sf0.001)") {
    val state = Registry.byName("stream_state_reader_parity").build(spark, sf0001)
    val files = Registry.byName("stream_file_sink_parity").build(spark, sf0001)
    val batch = Tables.events(spark, sf0001)
      .groupBy(window(col("ts").cast("timestamp"), "1 hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
      .select(D.ntz(col("window.start")).as("bucket"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("bucket", "event_type")
    val union = state.unionByName(files).orderBy("bucket", "event_type")
    assert(union.collect().toSeq == batch.collect().toSeq,
      "state ∪ files must reproduce the batch aggregate exactly")
    val overlap = state.select("bucket", "event_type")
      .join(files.select("bucket", "event_type"), Seq("bucket", "event_type"))
      .count()
    assert(overlap == 0L, s"$overlap buckets live in BOTH the files and the store")
    assert(state.count() >= 1L, "no retained bucket — the retention grade is vacuous")
    Memo.clear(spark)
  }

  test("stream_timer_parity == stream_session_parity graded frames: user timers reproduce the built-in session engine (sf0.001)") {
    val timers = Registry.byName("stream_timer_parity").build(spark, sf0001)
    val builtin = Registry.byName("stream_session_parity").build(spark, sf0001)
    assert(timers.collect().toSeq == builtin.collect().toSeq)
    Memo.clear(spark)
  }

  test("stream_timer_parity: ≥1 session emits ONLY via a restart-restored timer at every SF") {
    // a session wholly inside wave 1 (session_end ≤ split) whose close
    // (end + 30 min) is past wave 1's committed watermark (max₁ − 10 min)
    // cannot emit in wave 1 — its presence in the final output proves the
    // armed timer survived the checkpoint restart and fired in wave 2
    for (sf <- allSfs) {
      val ev = Tables.events(spark, sf)
        .select(col("ts").cast("timestamp").as("ts"))
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      val midMs = mm.getTimestamp(0).getTime +
        (mm.getTimestamp(1).getTime - mm.getTimestamp(0).getTime) / 2
      val split = new java.sql.Timestamp(midMs)
      val max1 = ev.filter(col("ts") <= lit(split))
        .agg(max(col("ts"))).head().getTimestamp(0)
      val wm1 = new java.sql.Timestamp(max1.getTime - 10 * 60 * 1000L)
      val out = Registry.byName("stream_timer_parity").build(spark, sf)
      val viaRestoredTimer = out.filter(
        col("session_end") <= lit(split).cast("timestamp_ntz") &&
          col("session_end") + expr("INTERVAL 30 MINUTES") >
            lit(wm1).cast("timestamp_ntz")).count()
      assert(viaRestoredTimer >= 1,
        s"$sf: no session emitted via a restart-restored timer — that path is untested")
    }
    Memo.clear(spark)
  }

  test("cents-bound tripwire: corpus-total cents magnitudes sit far under the documented limits (ADVICE-r15)") {
    // D.cents()/sumCents/sumNetCents are exact only while the ×100 round
    // trick stays below ~2^51/100 per value and the per-group cents sum
    // below ~2^46 (the floor((s+50)/100.0) half-up emulation). No group
    // any key forms can exceed the UNGROUPED corpus total, so pinning
    // the totals at the largest fixture SF turns a silent future
    // divergence into a loud failure here first.
    val lim = 1L << 46
    val li = Tables.lineitem(spark, sf01)
      .agg(sum(round(col("l_extendedprice") * lit(100), 0).cast("bigint")))
      .head().getLong(0)
    val evs = Tables.events(spark, sf01)
      .agg(sum(abs(round(col("value") * lit(100), 0).cast("bigint"))))
      .head().getLong(0)
    val net = Tables.lineitem(spark, sf01)
      .agg(sum(round(col("l_extendedprice") * lit(100), 0).cast("bigint") *
        (lit(100L) - round(col("l_discount") * lit(100), 0).cast("bigint"))))
      .head().getLong(0)
    assert(li < lim, s"lineitem cents total $li breaches 2^46")
    assert(evs < lim, s"events cents total $evs breaches 2^46")
    // net rides at 1e-4 units pre-floor; its bound is 2^53 (double-exact)
    assert(net < (1L << 53), s"net 1e-4-units total $net breaches 2^53")
  }

  test("ml_pipeline_mllib identity contract: fitted-Pipeline output == expression-form recompute (sf0.001)") {
    // the ε-contract precedent collapsed to identity: the REAL fitted
    // MLlib stages must reproduce the expression semantics exactly
    val out = Registry.byName("ml_pipeline_mllib").build(spark, sf0001)
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("value"))
    val labels = ev.groupBy(col("event_type").as("lbl_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("lbl_type"),
        (dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("lbl_type"))) - 1)
          .cast("bigint").as("label"))
    val mm = ev.agg(min("value").as("mn"), max("value").as("mx"))
    val expected = ev.crossJoin(broadcast(mm))
      .join(broadcast(labels), col("event_type") === col("lbl_type"))
      .select((col("event_id") +:
        round((col("value") - col("mn")) /
          nullif(col("mx") - col("mn"), lit(0.0)), 6).as("f_norm") +:
        col("label") +:
        (0 to 4).map(i =>
          when(col("label") === i, 1).otherwise(0).as(s"oh_$i"))): _*)
      .orderBy("event_id")
    assert(out.collect().toSeq == expected.collect().toSeq)
    Memo.clear(spark)
  }

  test("ml_pipeline_mllib: StringIndexer labels match ml_label_index's (frequency DESC, value ASC) rule at every SF") {
    for (sf <- allSfs) {
      val joined = Registry.byName("ml_pipeline_mllib").build(spark, sf)
        .join(Tables.events(spark, sf).select("event_id", "event_type"),
          "event_id")
        .select("event_type", "label").distinct()
      val fromKey = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val fromRule = Registry.byName("ml_label_index").build(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(fromKey == fromRule, s"$sf: $fromKey vs $fromRule")
      Memo.clear(spark)
    }
  }

  test("ml_pack_bucketed: high-bits batch key decomposes collision-free (sf0.01)") {
    val d = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("t"))
      .withColumn("q",
        when(col("t") < 32, 0L).when(col("t") < 64, 1L)
          .when(col("t") < 96, 2L).otherwise(3L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q").orderBy("t", "doc_id")
    val keyed = d.withColumn("rn", row_number().over(w))
      .withColumn("batch", expr("CAST((rn - 1) DIV 16 AS BIGINT)"))
      .withColumn("b", col("q") * lit(1L << 40) + col("batch"))
    // bijective: q and batch recover exactly from the packed key, and
    // distinct (q, batch) pairs == distinct packed keys
    val bad = keyed.filter(
      shiftright(col("b"), 40) =!= col("q") ||
        (col("b") - col("q") * lit(1L << 40)) =!= col("batch")).count()
    assert(bad == 0L, s"$bad rows fail high-bits key recovery")
    val pairs = keyed.select("q", "batch").distinct().count()
    val keys = keyed.select("b").distinct().count()
    assert(pairs == keys, s"collision: $pairs pairs vs $keys packed keys")
  }
}
