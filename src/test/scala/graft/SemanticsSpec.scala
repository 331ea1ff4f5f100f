package graft

import java.sql.Timestamp
import graft.queries.{Joins, TimeSeries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the cross-engine boundary semantics SURVEY §7.5 ranks as the top
  * hash-match risks: the =30min session gap, the =ts as-of boundary, and
  * the md5 split byte boundary. In-memory frames with hand-computed
  * expectations. */
class SemanticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** events-shaped frame; ts arrives as TimestampType then is cast to ntz
    * (session TZ is UTC so values are unchanged — same as the real reader). */
  private def eventsDf(rows: Seq[(Long, String, Long, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, u, et, v) => (id, ts(t), u, et, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
  }

  test("session window: a gap of exactly 30min stays IN-session; 30min+1µs starts a new one") {
    val ev = eventsDf(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0),
      (2L, "2024-01-01 00:30:00", 1L, "click", 1.0),          // exactly 30:00 → SAME (closed interval)
      (3L, "2024-01-01 01:00:00.000001", 1L, "click", 1.0),   // 30:00.000001 → NEW
      (4L, "2024-01-01 01:29:00", 1L, "click", 1.0)))         // 28:59.999999 → same as 3
    val sessions = TimeSeries.sessionize(ev).orderBy("session_start").collect()
    assert(sessions.length == 2)
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(1).getAs[Long]("n_events") == 2)
    assert(sessions(1).getAs[java.time.LocalDateTime]("session_start").toString
      == "2024-01-01T01:00:00.000001")
  }

  test("session window matches the gaps-and-islands (oracle) formulation on fixtures") {
    // Re-implements the DuckDB oracle's lag/break/running-sum sessionization
    // in Spark and checks it agrees with session_window on real data.
    import org.apache.spark.sql.expressions.Window
    val ev = graft.util.Tables.events(spark, sf0001)
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = ev
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(byUser) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(runs))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
    val viaSessionWindow = TimeSeries.sessionize(ev)
      .select("user_id", "session_start", "session_end", "n_events")
    assert(viaSessionWindow.except(islands).count() == 0)
    assert(islands.except(viaSessionWindow).count() == 0)
  }

  test("as-of join: an event AT the signup timestamp matches it (inclusive)") {
    val ev = eventsDf(Seq(
      (1L, "2024-01-01 09:59:00", 1L, "click", 1.0),   // before any signup → null
      (2L, "2024-01-01 10:00:00", 1L, "signup", 1.0),  // the signup event itself
      (3L, "2024-01-01 10:00:00", 1L, "click", 1.0),   // same instant → matches
      (4L, "2024-01-01 11:00:00", 1L, "click", 1.0),   // after → matches
      (5L, "2024-01-01 09:00:00", 2L, "click", 1.0)))  // other user, no signup → null
    val out = Joins.asofLastSignup(ev).orderBy("event_id").collect()
    def sig(i: Int) = Option(out(i).getAs[java.time.LocalDateTime]("last_signup_ts"))
    assert(sig(0).isEmpty)
    assert(sig(1).map(_.toString).contains("2024-01-01T10:00"))
    assert(sig(2).map(_.toString).contains("2024-01-01T10:00"))
    assert(sig(3).map(_.toString).contains("2024-01-01T10:00"))
    assert(sig(4).isEmpty)
  }

  test("forward as-of join: an event AT the signup timestamp matches it; later events get null") {
    val ev = eventsDf(Seq(
      (1L, "2024-01-01 09:59:00", 1L, "click", 1.0),   // before → next signup 10:00
      (2L, "2024-01-01 10:00:00", 1L, "signup", 1.0),  // the signup event itself
      (3L, "2024-01-01 10:00:00", 1L, "click", 1.0),   // same instant → matches (inclusive)
      (4L, "2024-01-01 11:00:00", 1L, "click", 1.0),   // after the last signup → null
      (5L, "2024-01-01 09:00:00", 2L, "click", 1.0)))  // other user, no signup → null
    val out = Joins.asofNextSignup(ev).orderBy("event_id").collect()
    def sig(i: Int) = Option(out(i).getAs[java.time.LocalDateTime]("next_signup_ts"))
    assert(sig(0).map(_.toString).contains("2024-01-01T10:00"))
    assert(sig(1).map(_.toString).contains("2024-01-01T10:00"))
    assert(sig(2).map(_.toString).contains("2024-01-01T10:00"))
    assert(sig(3).isEmpty)
    assert(sig(4).isEmpty)
  }

  test("tolerance as-of: exactly 1 day old matches; 1 day + 1µs is refused as stale") {
    val ev = eventsDf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 1.0),
      (2L, "2024-01-02 10:00:00", 1L, "click", 1.0),          // exactly +1 day → matches (closed)
      (3L, "2024-01-02 10:00:00.000001", 1L, "click", 1.0),   // +1 day +1µs → NULL (stale)
      (4L, "2024-01-01 10:00:00", 2L, "click", 1.0)))         // no signup for user → NULL
    val out = graft.queries.Registry.byName("join_asof_tolerance")
      .build(spark, sf0001)
    // the graded query reads the fixture dir; drive the formulation
    // directly on the boundary frame instead
    val res = Joins.asofLastSignup(ev)
      .withColumn("signup_within_1d",
        when(col("last_signup_ts").isNotNull &&
          col("ts") <= col("last_signup_ts") + expr("INTERVAL 1 DAY"),
          col("last_signup_ts")))
      .orderBy("event_id").collect()
    def sig(i: Int) = Option(res(i).getAs[java.time.LocalDateTime]("signup_within_1d"))
    assert(sig(0).map(_.toString).contains("2024-01-01T10:00")) // signup row matches itself
    assert(sig(1).map(_.toString).contains("2024-01-01T10:00"))
    assert(sig(2).isEmpty, "a match 1µs beyond tolerance must be refused")
    assert(sig(3).isEmpty)
    // and the graded build at least analyzes against the fixture schema
    assert(out.schema.fieldNames.contains("signup_within_1d"))
  }

  test("md5 split: boundary byte 'cc' goes to test, 'cb' to train; ratio ~80/20") {
    // engine-independent reference: JVM MD5 over the same salted key
    val md = java.security.MessageDigest.getInstance("MD5")
    def prefix(id: Long): String =
      md.digest(s"ev$id".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
    val ids = (0L until 2000L)
    val expectTrain = ids.count(prefix(_) < "cc")
    import spark.implicits._
    val df = ids.toDF("event_id")
      .select(col("event_id"),
        when(substring(md5(concat(lit("ev"), col("event_id").cast("string"))), 1, 2) < "cc",
          "train").otherwise("test").as("split"))
    val sparkTrain = df.filter(col("split") === "train").count()
    assert(sparkTrain == expectTrain)
    assert(sparkTrain > 1400 && sparkTrain < 1800) // ~79.7% of 2000
    // at least one id sits exactly on each side of the boundary in 0..1999
    assert(ids.exists(prefix(_) == "cc") || ids.exists(prefix(_) == "cb"))
  }

  test("ts_dedup is deterministic and idempotent") {
    val q = graft.queries.TimeSeries.tsDedup
    val once = q.build(spark, sf0001)
    val twice = q.build(spark, sf0001)
    assert(once.collect().toSeq == twice.collect().toSeq)
    val n = once.count()
    assert(n > 0 && n <= 1000)
  }

  test("ccFixpoint converges on a diameter-4 chain the 2-round depth provably mislabels") {
    // VERDICT-r10 #1's red case: chain 0-1-2-3-4 (diameter 4), pair 10-11,
    // singleton 20. Fixed 2-round min-label propagation (the depth
    // vec_dup_clusters / text_dedup_survivors use) leaves node 4 at label
    // 2 (labels walk one hop per round: r1 -> 3, r2 -> 2); the fixpoint
    // iteration must reach the true component minimum 0 and say so.
    import spark.implicits._
    import graft.ops.Ops
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("d1", "d2")
    val edges = pairs.unionByName(
      pairs.select(col("d2").as("d1"), col("d1").as("d2")))
    val fix = Ops.ccFixpoint(nodes, col("id"), edges, col("d1"), col("d2"))
    val fixed = fix.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(Seq(0L, 1L, 2L, 3L, 4L).forall(n => fixed(n)._1 == 0L),
      s"chain must collapse to label 0, got $fixed")
    assert(fixed(10L)._1 == 10L && fixed(11L)._1 == 10L && fixed(20L)._1 == 20L)
    assert(fixed.values.forall(_._2), "fixpoint run must report converged")
    fix.unpersist()
    val two = Ops.ccFixpoint(nodes, col("id"), edges, col("d1"), col("d2"),
      maxRounds = 2)
    val bounded = two.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(bounded(4L)._1 == 2L,
      "2-round depth must stall one label short of the true minimum")
    assert(bounded.values.forall(!_._2),
      "a run cut off by maxRounds must report converged=false")
    two.unpersist()
  }
}
