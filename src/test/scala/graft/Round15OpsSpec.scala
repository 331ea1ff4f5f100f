package graft

import graft.queries.Registry
import graft.util.{Memo, Tables}
import org.apache.spark.sql.functions._

/** Round-15 pins: the two new graded streaming keys must have TEETH at
  * every fixture SF — the outer join must actually exercise all three
  * emission classes (matched, null-emitted, withheld), and the late-drop
  * key's second wave must be nonempty and genuinely behind the committed
  * watermark — otherwise their hash parity grades a vacuous contract. */
class Round15OpsSpec extends SparkSpec {

  test("stream_outer_join_parity exercises matched, null-emitted AND withheld clicks at every SF") {
    for (sf <- allSfs) {
      val ev = Tables.events(spark, sf)
        .select(col("event_id"), col("event_type"), col("user_id"),
          col("ts").cast("timestamp").as("ts"))
      // replay the key's emission rule in batch: final watermark is the
      // min over both sides of (max event time − 10 min)
      val mx = ev.groupBy("event_type").agg(max("ts").as("m"))
        .filter(col("event_type").isin("click", "purchase"))
        .agg(min("m")).head().getTimestamp(0)
      val w = new java.sql.Timestamp(mx.getTime - 10 * 60 * 1000L)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cu"),
          col("ts").as("cts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
          col("ts").as("pts"))
      val joined = clicks.join(purchases,
        col("cu") === col("pu") && col("pts") > col("cts") &&
          col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"), "left")
      val matched = joined.filter(col("purchase_id").isNotNull).count()
      val nullEmit = joined.filter(col("purchase_id").isNull &&
        col("cts") + expr("INTERVAL 1 HOUR") < lit(w)).count()
      val withheld = joined.filter(col("purchase_id").isNull &&
        !(col("cts") + expr("INTERVAL 1 HOUR") < lit(w))).count()
      assert(matched >= 1, s"$sf: no matched pair — inner emission untested")
      assert(nullEmit >= 1, s"$sf: no expired unmatched click — null-side emission untested")
      assert(withheld >= 1,
        s"$sf: no still-awaited click — the 'younger rows never appear' half is untested")
    }
  }

  test("stream_outer_join_parity census: matched + null rows partition the emitted set") {
    // On the graded frame itself: every emitted row is exactly one of
    // matched / null-emitted, and distinct clicks never exceed rows.
    val out = Registry.byName("stream_outer_join_parity").build(spark, sf0001)
    val bad = out.filter(
      col("n_matched") + col("n_null_emitted") =!= col("n_rows") ||
        col("n_clicks_seen") > col("n_rows")).count()
    assert(bad == 0L)
    Memo.clear(spark)
  }

  test("stream_late_drop_parity's late wave is nonempty and fully behind the committed watermark at every SF") {
    for (sf <- allSfs) {
      val ev = Tables.events(spark, sf)
        .select(col("ts").cast("timestamp").as("ts"))
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      val (loMs, hiMs) = (mm.getTimestamp(0).getTime, mm.getTimestamp(1).getTime)
      // the key's own split rule (hour-floored midpoint, Long arithmetic)
      val splitMs = (loMs + (hiMs - loMs) / 2) / 3600000L * 3600000L
      val split = new java.sql.Timestamp(splitMs)
      val late = ev.filter(col("ts") <= lit(split)).count()
      val onTime = ev.filter(col("ts") > lit(split)).count()
      assert(late >= 1, s"$sf: empty late wave — the drop contract is vacuous")
      assert(onTime >= 1, s"$sf: empty on-time wave — no watermark to commit")
      // every late row's 1h window must close strictly below the final
      // watermark (max − 10 min), or a late row could legitimately merge
      // and the key would no longer grade a pure drop
      val lastLateWindowEndMs = (splitMs / 3600000L + 1) * 3600000L
      val watermarkMs = hiMs - 10 * 60 * 1000L
      assert(lastLateWindowEndMs < watermarkMs,
        s"$sf: late wave's newest window (end $lastLateWindowEndMs) not behind watermark $watermarkMs")
    }
  }

  test("stream_dedup_parity: event_id unique (oracle premise) and all three dup classes nonempty at every SF") {
    import graft.util.Tables
    for (sf <- allSfs) {
      val ev = Tables.events(spark, sf)
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"))
      // the oracle is the bare events table — only sound if event_id is a key
      val n = ev.count()
      assert(ev.select(countDistinct(col("event_id"))).head().getLong(0) == n,
        s"$sf: event_id not unique — the bare-table oracle would be wrong")
      // replay the key's wave/watermark arithmetic and check each injected
      // duplicate class is nonempty, so all three drop mechanisms are graded
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      val midMs = mm.getTimestamp(0).getTime +
        (mm.getTimestamp(1).getTime - mm.getTimestamp(0).getTime) / 2
      val split = new java.sql.Timestamp(midMs)
      val wave1 = ev.filter(col("ts") <= lit(split))
      val max1 = wave1.agg(max(col("ts"))).head().getTimestamp(0)
      val wm1 = new java.sql.Timestamp(max1.getTime - 10L * 60 * 1000)
      val lateCut = new java.sql.Timestamp(wm1.getTime - 3600L * 1000)
      assert(wave1.filter(col("event_id") % 3 === 0).count() >= 1,
        s"$sf: no in-batch duplicate — first-occurrence-wins untested")
      assert(wave1.filter(col("ts") > lit(wm1)).count() >= 1,
        s"$sf: no live-state duplicate — cross-restart state suppression untested")
      assert(wave1.filter(col("ts") < lit(lateCut)).count() >= 1,
        s"$sf: no late duplicate — the late-row drop path untested")
    }
  }

  // ---- Finding-1 conversions (VERDICT-r14 #4): the three DataFrame-tier
  // keys whose group count scales with the fact table now sum in integer
  // cents. Each pin computes BOTH formulations in ONE aggregation pass
  // over the key's own grouping and asserts zero per-group divergence —
  // the Spark-side half of the bit-identical proof (the cross-engine half
  // is the unchanged DECIMAL oracle in the parity gate).

  test("ml_pack_bucketed: premises hold and bucketing strictly reduces waste at every SF") {
    import graft.util.Tables
    for (sf <- allSfs) {
      val d = Tables.documents(spark, sf)
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("t"))
      // arrival scheme's premise: doc_id is the dense 0..N-1 arrival order
      val n = d.count()
      val mm = d.agg(min("doc_id"), max("doc_id"),
        countDistinct(col("doc_id"))).head()
      assert(mm.getLong(0) == 0L && mm.getLong(1) == n - 1 &&
        mm.getLong(2) == n, s"$sf: doc_id not dense 0..N-1")
      // every token band populated, or the bucketed scheme grades a
      // degenerate partition
      val bands = d.select(
        sum(when(col("t") < 32, 1).otherwise(0)),
        sum(when(col("t") >= 32 && col("t") < 64, 1).otherwise(0)),
        sum(when(col("t") >= 64 && col("t") < 96, 1).otherwise(0)),
        sum(when(col("t") >= 96, 1).otherwise(0))).head()
      for (i <- 0 until 4)
        assert(bands.getLong(i) >= 1, s"$sf: token band $i empty")
      // the claim the key exists to quantify: bucketed waste < arrival
      val out = Registry.byName("ml_pack_bucketed").build(spark, sf)
        .orderBy("scheme").collect()
      val (arr, buck) = (out(0), out(1))
      assert(arr.getString(0) == "arrival" && buck.getString(0) == "bucketed")
      assert(buck.getDouble(4) < arr.getDouble(4),
        s"$sf: bucketed waste ${buck.getDouble(4)} !< arrival ${arr.getDouble(4)}")
      // same corpus on both sides: used tokens identical
      assert(arr.getLong(3) == buck.getLong(3))
    }
  }

  test("converted keys' physical plans carry NO decimal sum — the cents form stays primitive") {
    // the point of the conversion: the hash aggregate's buffer is a
    // BIGINT sum, not Spark's precision-28 decimal (finding 1); a future
    // edit that reintroduces sum(cast(... as decimal)) in these plans is
    // a silent 7x CPU regression at scale. agg_gini_revenue is pinned by
    // its equivalence test instead: its per-custkey sum is cents-BIGINT,
    // but the downstream GLOBAL Σ i·cents keeps a deliberate
    // DECIMAL(38,0) — one group (groupBy()), so no per-group buffer
    // pathology, and the n²-growing rank products genuinely need the
    // 38-digit headroom BIGINT lacks at scale.
    for (name <- Seq("sort_limit_topk", "ts_session", "ml_shuffle_batch")) {
      val p = Registry.byName(name).build(spark, sf0001)
        .queryExecution.executedPlan.toString.toLowerCase
      // the cents form is sum(cast(round(x * 100, 0) as bigint)) — only a
      // DECIMAL-typed sum buffer is the regression being pinned out
      assert(!"sum\\([^)]*decimal".r.findFirstIn(p).isDefined,
        s"$name: plan still carries a decimal sum")
    }
    graft.util.Memo.clear(spark)
  }

  test("sort_limit_topk: cents revenue == decimal revenue on every (orderkey, date) group at every SF") {
    import graft.util.{D, Tables}
    for (sf <- allSfs) {
      val cutoff = lit("1998-06-01").cast("timestamp_ntz")
      val bad = Tables.lineitem(spark, sf).filter(col("l_shipdate") > cutoff)
        .join(Tables.orders(spark, sf).filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(D.sumNetCents(col("l_extendedprice"), col("l_discount")).as("nu"),
          D.sumDec4(D.net(col("l_extendedprice"), col("l_discount"))).as("old"))
        .filter(col("nu") =!= col("old")).count()
      assert(bad == 0L, s"$sf: $bad groups diverge between cents and decimal revenue")
    }
  }

  test("ts_session: cents sum_value == decimal sum_value on every (user, session) group at every SF") {
    import graft.util.{D, Tables}
    for (sf <- allSfs) {
      val bad = Tables.events(spark, sf)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(D.sumCents(col("value")).as("nu"), D.sumDec(col("value")).as("old"))
        .filter(col("nu") =!= col("old")).count()
      assert(bad == 0L, s"$sf: $bad sessions diverge between cents and decimal sums")
    }
  }

  test("agg_gini_revenue: BIGINT cents == decimal-sum×100 cents on every customer at every SF") {
    import graft.util.{D, Tables}
    for (sf <- allSfs) {
      val bad = Tables.orders(spark, sf)
        .groupBy("o_custkey")
        .agg(D.sumAsCents(col("o_totalprice")).as("nu"),
          (sum(D.dec(col("o_totalprice"))).cast(D.Money) * lit(100))
            .cast("bigint").as("old"))
        .filter(col("nu") =!= col("old")).count()
      assert(bad == 0L, s"$sf: $bad customers diverge between cents and decimal revenue")
    }
  }

  test("ml_shuffle_batch: cents sum_value == decimal sum_value on every 64-row batch at every SF") {
    import graft.util.{D, Tables}
    // 64-row batches over a deterministic ordinal; the exact md5-shuffled
    // batch mapping is graded by the key's unchanged DECIMAL oracle — this
    // pins the two sum formulations on batch-sized groups of fixture values.
    for (sf <- allSfs) {
      val bad = Tables.events(spark, sf)
        .withColumn("batch_id", (col("event_id") / lit(64)).cast("bigint"))
        .groupBy("batch_id")
        .agg(D.sumCents(col("value")).as("nu"), D.sumDec(col("value")).as("old"))
        .filter(col("nu") =!= col("old")).count()
      assert(bad == 0L, s"$sf: $bad batches diverge between cents and decimal sums")
    }
  }
}
