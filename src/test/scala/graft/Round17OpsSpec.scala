package graft

import graft.queries.{Registry, Streaming}
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round-17 pins: the two user-state APIs must agree byte-for-byte
  * (fmgws vs tws), the three state-source keys must decompose the batch
  * aggregate exactly (time-travel = latest-state ∪ sink-files), the
  * kill-proof temp sweep must reclaim dead-JVM dirs and spare live ones,
  * the ml_pipeline_mllib fixture-shape fixes must match MLlib's actual
  * conventions (constant column → 0.5, short one-hot → 0 not NULL), and
  * the TmSessionizer's late-but-in-gap guard must keep a session from
  * collapsing when a row arrives behind the open session's end. */
class Round17OpsSpec extends SparkSpec {

  test("stream_fmgws_parity == stream_tws_parity byte-for-byte (two user-state APIs, two backends, sf0.001)") {
    val fmgws = Registry.byName("stream_fmgws_parity").build(spark, sf0001)
      .orderBy("user_id").collect().toSeq
    val tws = Registry.byName("stream_tws_parity").build(spark, sf0001)
      .orderBy("user_id").collect().toSeq
    assert(fmgws.nonEmpty, "empty census — nothing graded")
    assert(fmgws == tws,
      "flatMapGroupsWithState (HDFS store) and transformWithState " +
        "(RocksDB) diverged on the identical census fold")
  }

  test("state time-travel = latest state ∪ sink files (exact batch-0/batch-1 decomposition, sf0.001)") {
    // batch-0 snapshot holds EVERYTHING; batch 1 then splits it into
    // evicted-and-emitted (files) vs retained (latest state) — the three
    // frames must tile with no overlap and no loss.
    def rows(name: String) =
      Registry.byName(name).build(spark, sf0001)
        .select("bucket", "event_type", "n", "sum_value")
        .collect().map(_.toSeq).toSet
    val full = rows("stream_state_timetravel")
    val open = rows("stream_state_reader_parity")
    val closed = rows("stream_file_sink_parity")
    assert(open.nonEmpty && closed.nonEmpty,
      "degenerate fixture: one side of the decomposition is empty")
    assert((open intersect closed).isEmpty,
      "a bucket is both retained in state and emitted to files")
    assert(open.union(closed) == full,
      "batch-0 snapshot != latest-state ∪ emitted-files")
  }

  test("sweepStaleTmp reclaims dead-JVM dirs, spares live-JVM dirs and pid-less fresh dirs") {
    val tmp = new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val dead = new java.io.File(tmp, "graft_stream_p999999999_r17spec")
    val live = new java.io.File(tmp,
      s"graft_stream_p${ProcessHandle.current().pid()}_r17spec")
    val fresh = new java.io.File(tmp, "graft_stream_r17spec_nopid")
    try {
      Seq(dead, live, fresh).foreach(d => assert(d.mkdir(), s"mkdir $d"))
      Streaming.sweepStaleTmp()
      assert(!dead.exists(), "dead-pid dir survived the sweep")
      assert(live.exists(), "sweep deleted a LIVE JVM's dir")
      assert(fresh.exists(),
        "sweep deleted a fresh pid-less dir (age guard must hold it 30 min)")
    } finally Seq(dead, live, fresh).foreach(_.delete())
  }

  test("MinMaxScaler constant-column convention is 0.5 (the ml_pipeline_mllib oracle's CASE branch)") {
    import org.apache.spark.ml.feature.{MinMaxScaler, VectorAssembler}
    import org.apache.spark.ml.functions.vector_to_array
    val df = spark.range(3).select(lit(7.5).as("value"))
    val va = new VectorAssembler().setInputCols(Array("value"))
      .setOutputCol("v")
    val m = new MinMaxScaler().setInputCol("v").setOutputCol("s")
      .fit(va.transform(df))
    val out = m.transform(va.transform(df))
      .select(vector_to_array(col("s")).getItem(0)).collect()
    assert(out.forall(_.getDouble(0) == 0.5),
      "MinMaxScaler no longer emits 0.5 for a constant column — " +
        "realign the ml_pipeline_mllib oracle's CASE WHEN mx = mn branch")
  }

  test("one-hot slots past the fitted width read 0 (not NULL) under the coalesce decode") {
    import org.apache.spark.ml.feature.{OneHotEncoder, StringIndexer}
    import org.apache.spark.ml.functions.vector_to_array
    // only TWO categories: slots 2..4 are beyond the fitted vector width
    val df = spark.createDataFrame(Seq((1L, "a"), (2L, "b"), (3L, "a")))
      .toDF("id", "cat")
    val idx = new StringIndexer().setInputCol("cat").setOutputCol("d")
      .setStringOrderType("frequencyDesc").fit(df)
    val oh = new OneHotEncoder().setInputCol("d").setOutputCol("oh")
      .setDropLast(false).fit(idx.transform(df))
    // NB: bare getItem(i) THROWS out-of-bounds under Spark 4's ANSI
    // default (SparkArrayIndexOutOfBoundsException) — get() is the
    // NULL-tolerant access the decode must use
    val out = oh.transform(idx.transform(df))
      .select((0 to 4).map(i =>
        coalesce(get(vector_to_array(col("oh")), lit(i)), lit(0.0))
          .cast("int").as(s"oh_$i")): _*)
      .collect()
    assert(out.forall(r => (0 to 4).forall(i => !r.isNullAt(i))),
      "coalesce decode leaked a NULL one-hot slot")
    assert(out.forall(r => (0 to 4).map(r.getInt).sum == 1),
      "each row must one-hot exactly one slot")
  }

  test("TmSessionizer: late-but-in-gap row widens the open session instead of moving its end backwards") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import org.apache.spark.sql.Encoders
    import graft.queries.Streaming.{TmIn, TmOut}
    // wave 1: user 1 at t=100min and t=120min (open session [100,120]);
    // committed watermark = 120 − 10 = 110.
    // wave 2: t=115 (admitted: > wm; in-gap: 120−115 ≤ 30 — but BEHIND
    // the restored open end) then t=148. With the min/max guard the open
    // session stays [100,148] (148−120 = 28 ≤ 30); the pre-fix blind
    // replace set end←115, then 148−115 = 33 > 30 split it in two.
    // wave 2 also carries user 2 at t=300 to push the final watermark
    // past 148+30 so the single session actually emits.
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val wave1 = Seq(TmIn(1L, 1L, t(100), 1.0), TmIn(1L, 2L, t(120), 1.0))
    val wave2 = Seq(TmIn(1L, 3L, t(115), 1.0), TmIn(1L, 4L, t(148), 1.0),
      TmIn(2L, 5L, t(300), 1.0))
    val base = Streaming.tempDir("graft_stream_r17tm_")
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val inEnc = Encoders.product[TmIn]
      def stage(rows: Seq[TmIn]): Unit =
        spark.createDataset(rows).coalesce(1)
          .write.mode("append").parquet(s"$base/src")
      def runOnce(): Unit = {
        val in = spark.readStream
          .schema(org.apache.spark.sql.Encoders.product[TmIn].schema)
          .parquet(s"$base/src")
          .withWatermark("ts", "10 minutes")
          .as[TmIn]
        val q = in.groupByKey(_.user_id)(Encoders.scalaLong)
          .transformWithState(new Streaming.TmSessionizer,
            TimeMode.EventTime(), OutputMode.Append())(
            Encoders.product[TmOut])
          .writeStream.format("parquet")
          .option("path", s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      stage(wave1); runOnce()
      stage(wave2); runOnce()
      val sessions = spark.read.parquet(s"$base/out")
        .filter(col("user_id") === 1L)
        .orderBy("session_start").collect()
      assert(sessions.length == 1,
        s"user 1 must emit ONE widened session, got ${sessions.length}: " +
          sessions.mkString("; "))
      val s = sessions.head
      assert(s.getTimestamp(1) == t(100) && s.getTimestamp(2) == t(148) &&
        s.getLong(3) == 4L,
        s"expected session [100,148] n=4, got $s")
    } finally prevProv match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
