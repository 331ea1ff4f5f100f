package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{D, Tables}

/** Time-series / windowed aggregation over the events stream table, batch
  * semantics (SURVEY §2.9). The same window()/session_window() expressions
  * run unchanged under Structured Streaming (see the streaming parity
  * tests) — this is the batch face of the streaming surface.
  *
  * 100-TB notes: tumbling/sliding windows are plain hash aggregations on
  * (bucket, type) — partial+final agg, shuffle carries combined partials.
  * Session windows and dedup partition by user_id (high cardinality) —
  * state per key is bounded by per-user event counts, never global.
  */
object TimeSeries {

  /** 1h tumbling count + decimal sum per event type. */
  val tsTumbling = Q(
    "ts_tumbling",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
        .select(D.ntz(col("window.start")).as("bucket"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("bucket", "event_type"),
    Some(s"""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
            count(*) AS n, ${D.oSumDec("value")} AS sum_value
            FROM events GROUP BY bucket, event_type
            ORDER BY bucket, event_type"""))

  /** 1h windows sliding every 30m — each event lands in exactly two
    * windows. Oracle reconstructs the two disjoint bucket families
    * (:00-aligned and :30-offset) with time_bucket. */
  val tsSliding = Q(
    "ts_sliding",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), D.sumDec(col("value")).as("sum_value"))
        .select(D.ntz(col("window.start")).as("bucket"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("bucket", "event_type"),
    Some(s"""SELECT bucket, event_type, n, sum_value FROM (
              SELECT time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
                     count(*) AS n, ${D.oSumDec("value")} AS sum_value
              FROM events GROUP BY bucket, event_type
              UNION ALL
              SELECT time_bucket(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTES) AS bucket, event_type,
                     count(*) AS n, ${D.oSumDec("value")} AS sum_value
              FROM events GROUP BY bucket, event_type)
            ORDER BY bucket, event_type"""))

  /** Per-user session windows with a 30-minute inactivity gap. Spark's
    * session interval is CLOSED at [ts, ts+gap]: an event arriving exactly
    * gap after the previous one stays in the SAME session (pinned by
    * SemanticsSpec), so the gaps-and-islands oracle breaks strictly on
    * `> INTERVAL 30 MINUTES`. */
  /** Core sessionization, factored out so the =30min gap tie is unit-
    * testable on in-memory frames (SemanticsSpec). */
  def sessionize(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), D.sumDec(col("value")).as("sum_value"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")

  val tsSession = Q(
    "ts_session",
    (spark, sfDir) =>
      sessionize(Tables.events(spark, sfDir))
        .orderBy("user_id", "session_start"),
    Some(s"""WITH flagged AS (
              SELECT user_id, ts, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS brk
              FROM events),
            numbered AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged)
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events, ${D.oSumDec("value")} AS sum_value
            FROM numbered GROUP BY user_id, sid
            ORDER BY user_id, session_start"""))

  /** Keyed dedup keeping the first event per (user, type, minute) —
    * row_number()=1, NOT dropDuplicates (which keeps an arbitrary row per
    * key under shuffle and would be nondeterministic). */
  val tsDedup = Q(
    "ts_dedup",
    (spark, sfDir) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"), date_trunc("minute", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(spark, sfDir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type, ts, value FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id, event_type, date_trunc('minute', ts)
                ORDER BY ts, event_id) AS rn
              FROM events)
            WHERE rn = 1 ORDER BY event_id"""))

  /** Calendar gap-fill: a dense hourly (bucket × event_type) grid over the
    * observed span, zero-filled where no events landed. The grid is built
    * from a 1-row bounds aggregate crossed with the distinct type set —
    * both tiny at any data scale, so the cross join is safe. */
  val tsGapFill = Q(
    "ts_gap_fill",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
        .withColumn("bucket", date_trunc("hour", col("ts")))
      val counts = ev.groupBy("bucket", "event_type").agg(count(lit(1)).as("cnt"))
      val buckets = ev.agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("INTERVAL 1 HOUR")))
          .as("bucket"))
      val types = ev.select("event_type").distinct()
      buckets.crossJoin(types)
        .join(counts, Seq("bucket", "event_type"), "left")
        .select(col("bucket"), col("event_type"),
          coalesce(col("cnt"), lit(0L)).as("n"))
        .orderBy("bucket", "event_type")
    },
    Some("""WITH b AS (SELECT unnest(generate_series(
                         date_trunc('hour', (SELECT min(ts) FROM events)),
                         date_trunc('hour', (SELECT max(ts) FROM events)),
                         INTERVAL 1 HOUR)) AS bucket),
                 t AS (SELECT DISTINCT event_type FROM events),
                 c AS (SELECT date_trunc('hour', ts) AS bucket, event_type,
                              count(*) AS cnt
                       FROM events GROUP BY bucket, event_type)
            SELECT b.bucket, t.event_type, coalesce(c.cnt, CAST(0 AS BIGINT)) AS n
            FROM b CROSS JOIN t
            LEFT JOIN c ON b.bucket = c.bucket AND t.event_type = c.event_type
            ORDER BY b.bucket, t.event_type"""))

  /** Hourly OHLC candles per event type — open/close picked by
    * row_number over the unique (ts, event_id) order (not first()/last(),
    * whose result depends on partition order), high/low as plain min/max.
    * One window pass + one hash agg, both partitioned on (bucket, type):
    * at 100 TB the window state is bounded per bucket-hour, never global. */
  val tsOhlc = Q(
    "ts_ohlc",
    (spark, sfDir) => {
      val wa = Window.partitionBy("bucket", "event_type")
        .orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy("bucket", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(spark, sfDir)
        .select(date_trunc("hour", col("ts")).as("bucket"), col("event_type"),
          col("ts"), col("event_id"), col("value"))
        .withColumn("rn_a", row_number().over(wa))
        .withColumn("rn_d", row_number().over(wd))
        .groupBy("bucket", "event_type")
        .agg(
          max(when(col("rn_a") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rn_d") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"))
        .orderBy("bucket", "event_type")
    },
    Some("""WITH b AS (SELECT date_trunc('hour', ts) AS bucket, event_type,
                              ts, event_id, value FROM events),
                 r AS (SELECT *,
                   row_number() OVER (PARTITION BY bucket, event_type
                                      ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (PARTITION BY bucket, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn_d
                   FROM b)
            SELECT bucket, event_type,
                   max(CASE WHEN rn_a = 1 THEN value END) AS open,
                   max(value) AS high, min(value) AS low,
                   max(CASE WHEN rn_d = 1 THEN value END) AS close,
                   count(*) AS n
            FROM r GROUP BY bucket, event_type
            ORDER BY bucket, event_type"""))

  /** Linear resampling: per-user value interpolated onto a 30-minute grid
    * spanning that user's own observed range. The prev/next observation at
    * each grid point comes from ONE union + two windows (the as-of trick,
    * both directions; an observation exactly ON a grid point is both its
    * prev and next → interpolation degenerates to the exact value). The
    * interpolated value is left unrounded: both engines evaluate the
    * identical +,-,*,/ expression over identical operands, which IEEE
    * makes bit-exact — rounding would only add a midpoint hazard.
    * Capped to user_id < 20 to bound the graded output; the plan is
    * per-user-partitioned windows + an explode, linear at any scale. */
  val tsResampleInterp = Q(
    "ts_resample_interp",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("value"), col("event_id"))
      val grid = ev.groupBy("user_id")
        .agg(date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
        .select(col("user_id"),
          explode(sequence(col("t0"), col("t1"), expr("INTERVAL 30 MINUTES")))
            .as("ts"))
      // event_id rides along as the FINAL window tiebreaker: (ts, tag)
      // alone is not a total order when two observations share a
      // timestamp, which would make last(v) partition-order-dependent.
      // Grid rows get -1 (not NULL — Spark and DuckDB default to opposite
      // NULL sort ends), but grid timestamps are unique per user so the
      // value never actually compares against an observation's.
      val unioned = ev.select(col("user_id"), col("ts"), lit(0).as("tag"),
          col("value").as("v"), col("event_id"))
        .unionByName(grid.select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("double").as("v"), lit(-1L).as("event_id")))
      val wPrev = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val obsTs = when(col("tag") === 0, col("ts"))
      unioned
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pts", last(obsTs, ignoreNulls = true).over(wPrev))
        .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nts", last(obsTs, ignoreNulls = true).over(wNext))
        .filter(col("tag") === 1)
        .select(col("user_id"), col("ts").as("grid_ts"),
          when(col("pts").isNull, col("nv"))
            .when(col("nts").isNull, col("pv"))
            .when(col("nts") === col("pts"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((unix_micros(col("ts").cast("timestamp"))
                - unix_micros(col("pts").cast("timestamp"))).cast("double")
                / (unix_micros(col("nts").cast("timestamp"))
                  - unix_micros(col("pts").cast("timestamp"))).cast("double")))
            .as("v_interp"))
        .orderBy("user_id", "grid_ts")
    },
    Some("""WITH ev AS (SELECT user_id, ts, value, event_id
                        FROM events WHERE user_id < 20),
                 grid AS (SELECT user_id, unnest(generate_series(
                            date_trunc('hour', min(ts)), max(ts),
                            INTERVAL 30 MINUTE)) AS ts
                          FROM ev GROUP BY user_id),
                 u AS (SELECT user_id, ts, 0 AS tag, value AS v, event_id FROM ev
                       UNION ALL
                       SELECT user_id, ts, 1 AS tag, NULL AS v, -1 AS event_id
                       FROM grid),
                 m AS (SELECT *,
                   last_value(v IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY ts, tag, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
                   last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY ts, tag, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pts,
                   last_value(v IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY ts DESC, tag, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv,
                   last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER
                     (PARTITION BY user_id ORDER BY ts DESC, tag, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nts
                   FROM u)
            SELECT user_id, ts AS grid_ts,
                   CASE WHEN pts IS NULL THEN nv
                        WHEN nts IS NULL THEN pv
                        WHEN nts = pts THEN pv
                        ELSE pv + (nv - pv) *
                          (CAST(epoch_us(ts) - epoch_us(pts) AS DOUBLE)
                           / CAST(epoch_us(nts) - epoch_us(pts) AS DOUBLE))
                   END AS v_interp
            FROM m WHERE tag = 1
            ORDER BY user_id, grid_ts"""))

  /** Rolling z-score anomaly detection: each event's value against the
    * mean/stddev of its trailing 5-row window per user (total order:
    * ts, event_id). The frame sums run in EXACT DECIMAL — a double frame
    * sum would depend on the engine's add/evict evaluation order inside
    * sliding frames — then mean/variance/z are derived by double
    * arithmetic over identical finished operands (IEEE-identical; sqrt is
    * correctly rounded). Sample variance, n−1; z is NULL for n < 2 or a
    * zero-variance window. Capped to user_id < 50 to bound graded output;
    * per-user sliding frames are linear at any scale. */
  val tsMovingZscore = Q(
    "ts_moving_zscore",
    (spark, sfDir) =>
      graft.ops.Ops.movingZscore(
          Tables.events(spark, sfDir).filter(col("user_id") < 50)
            .select("event_id", "user_id", "ts", "value"),
          col("user_id"), Seq(col("ts"), col("event_id")), col("value"),
          frameRows = 5)
        .select("event_id", "user_id", "value", "n", "z")
        .orderBy("event_id"),
    Some(s"""SELECT event_id, user_id, value, CAST(win_n AS BIGINT) AS n,
                   CASE WHEN win_n > 1.0 AND win_var > 0.0
                        THEN (value - win_sum / win_n) / sqrt(win_var)
                   END AS z
            FROM (SELECT event_id, user_id, value, win_sum, win_sumsq, win_n,
                         CASE WHEN win_n > 1.0 THEN
                           (win_sumsq - win_sum * win_sum / win_n)
                             / (win_n - 1.0) END AS win_var
                  FROM (SELECT event_id, user_id, value,
                               ${D.oDbl(s"CAST(sum(${D.oDec("value")}) OVER w AS DECIMAL(18,2))")} AS win_sum,
                               ${D.oDbl(s"CAST(sum(CAST(${D.oDec("value")} * ${D.oDec("value")} AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4))")} AS win_sumsq,
                               CAST(count(*) OVER w AS DOUBLE) AS win_n
                        FROM events WHERE user_id < 50
                        WINDOW w AS (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)))
            ORDER BY event_id"""))

  def qs: Seq[Q] = Seq(tsTumbling, tsSliding, tsSession, tsDedup, tsGapFill,
    tsOhlc, tsResampleInterp, tsMovingZscore)
}
