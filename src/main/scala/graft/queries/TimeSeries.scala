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
    * testable on in-memory frames (SemanticsSpec). The STREAMING form —
    * event-time timers emitting each session exactly once when the
    * watermark passes its close — is mirrored in StreamingParitySpec
    * (round-11) and proven equal to this operator on watermark-closed
    * sessions. */
  def sessionize(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      // (user, session) group count scales WITH the event table
      // (BASELINE.md finding 1): integer-cents sum (D.sumCents,
      // bit-identical to sumDec; the gaps-and-islands DECIMAL oracle is
      // unchanged, so parity proves the equivalence).
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), D.sumCents(col("value")).as("sum_value"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")

  val tsSession = Q(
    "ts_session",
    (spark, sfDir) =>
      sessionize(Tables.events(spark, sfDir))
        .orderBy("user_id", "session_start"),
    Some(s"""WITH flagged AS (
              SELECT user_id, ts, event_id, value,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                               > INTERVAL 30 MINUTES THEN 1 ELSE 0 END AS brk
              FROM events),
            numbered AS (
              SELECT user_id, ts, value,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
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

  /** Truncated EWMA (α = 0.3, last 8 observations) per user: a lag-chain
    * with fixed (1−α)^j weights, renormalized over the lags that exist —
    * identical expression trees on both engines, so bit-exact. The un-
    * truncated recursive EWMA needs a running product that neither engine's
    * window frames express; 8 taps carry (1−α)^8 ≈ 5.8% residual weight.
    * One partitioned window per user — same scale shape as win_lead_lag. */
  val tsEwma = Q(
    "ts_ewma",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wts = Seq(0.7, 0.49, 0.343, 0.2401, 0.16807, 0.117649, 0.0823543)
      val lags = wts.zipWithIndex.map { case (wt, i) =>
        (lag("value", i + 1).over(w), wt)
      }
      val num = lags.foldLeft(col("value") * 1.0) { case (acc, (l, wt)) =>
        acc + coalesce(l, lit(0.0)) * wt
      }
      val den = lags.foldLeft(lit(1.0)) { case (acc, (l, wt)) =>
        acc + when(l.isNull, 0.0).otherwise(wt)
      }
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          round(num / den, 4).as("ewma"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""WITH e AS (
              SELECT user_id, ts, event_id, value,
                     lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
                     lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
                     lag(value, 5) OVER w AS l5, lag(value, 6) OVER w AS l6,
                     lag(value, 7) OVER w AS l7
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, ts, event_id, value,
                   round((value * 1.0 + coalesce(l1,0)*0.7 + coalesce(l2,0)*0.49
                          + coalesce(l3,0)*0.343 + coalesce(l4,0)*0.2401
                          + coalesce(l5,0)*0.16807 + coalesce(l6,0)*0.117649
                          + coalesce(l7,0)*0.0823543)
                         / (1.0 + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.7 END
                            + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.49 END
                            + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.343 END
                            + CASE WHEN l4 IS NULL THEN 0.0 ELSE 0.2401 END
                            + CASE WHEN l5 IS NULL THEN 0.0 ELSE 0.16807 END
                            + CASE WHEN l6 IS NULL THEN 0.0 ELSE 0.117649 END
                            + CASE WHEN l7 IS NULL THEN 0.0 ELSE 0.0823543 END), 4)
                     AS ewma
            FROM e ORDER BY user_id, ts, event_id"""))

  /** Robust anomaly detection: flag events more than 3 scaled-MADs from
    * their user's median (MAD·1.4826 ≈ σ under normality). Median and MAD
    * are EXACT interpolated percentiles — two grouped aggregations joined
    * back, both keyed on user_id, so the whole detector is three shuffles
    * on the same high-cardinality key. The 3σ comparison uses the 4-dp
    * ROUNDED med/mad on both sides so the flag can't flip on a last-ulp
    * percentile-interpolation difference between engines. */
  val tsAnomalyMad = Q(
    "ts_anomaly_mad",
    (spark, sfDir) => {
      // Round-18 single-exchange form (guide §2.4: windows over the same
      // key share one shuffle): med and mad are per-user PERCENTILE
      // aggregates, so both ride as window aggregates over ONE
      // hashpartitioning(user_id) exchange — the old shape aggregated
      // events twice (two full shuffles) and re-joined the results back
      // through two more joins over three scans of the fact. Values are
      // identical: the same percentile over the same per-user multiset,
      // same round(·,4), broadcast to each row of the group either way.
      // Plan diff: 3 Exchange + 2 joins → 1 Exchange, 1 scan, no joins.
      val ev = Tables.events(spark, sfDir)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      ev.withColumn("med", round(expr("percentile(value, 0.5)").over(w), 4))
        .withColumn("mad",
          round(expr("percentile(abs(value - med), 0.5)").over(w), 4))
        .filter(abs(col("value") - col("med")) > lit(3.0) * 1.4826 * col("mad"))
        .select("event_id", "user_id", "value", "med", "mad")
        .orderBy("event_id")
    },
    Some("""WITH med AS (
              SELECT user_id, round(quantile_cont(value, 0.5), 4) AS med
              FROM events GROUP BY user_id),
            mad AS (
              SELECT e.user_id, round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad
              FROM events e JOIN med m USING (user_id) GROUP BY e.user_id)
            SELECT e.event_id, e.user_id, e.value, m.med, d.mad
            FROM events e JOIN med m USING (user_id) JOIN mad d ON e.user_id = d.user_id
            WHERE abs(e.value - m.med) > 3.0 * 1.4826 * d.mad
            ORDER BY e.event_id"""))

  /** Ordered conversion funnel view → click → purchase: per user, the
    * first view, the first click strictly after it, the first purchase
    * strictly after that — then the stage-survivor counts. Each stage is
    * a grouped min joined to the next filter; all three shuffles key on
    * user_id, and the stage tables only shrink, so the funnel costs three
    * self-joins of decreasing size at any scale. */
  val tsFunnel = Q(
    "ts_funnel",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.join(s1, Seq("user_id"))
        .filter(col("event_type") === "click" && col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.join(s2, Seq("user_id"))
        .filter(col("event_type") === "purchase" && col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      val one = (df: org.apache.spark.sql.DataFrame, name: String) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      one(s1, "1_view").unionAll(one(s2, "2_click")).unionAll(one(s3, "3_purchase"))
        .orderBy("stage")
    },
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN s1 ON e.user_id = s1.user_id
                   WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                   JOIN s2 ON e.user_id = s2.user_id
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
            SELECT stage, n_users FROM (
              SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s1
              UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
              UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3)
            ORDER BY stage"""))

  /** Weekly retention cohorts: users grouped by the ISO week of their
    * first event; for each (cohort, week-offset) the count of users active
    * that week. Two user-keyed aggregates and one join — the cohort table
    * is one row per user, the activity table one row per (user, week);
    * both truncations are exact Monday boundaries in both engines. */
  val tsRetentionCohort = Q(
    "ts_retention_cohort",
    (spark, sfDir) =>
      graft.ops.Ops.retentionCohort(Tables.events(spark, sfDir),
          col("user_id"), col("ts"))
        .orderBy("cohort_week", "week_offset"),
    Some("""WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                       FROM events GROUP BY user_id),
            act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events)
            SELECT CAST(f.cohort AS TIMESTAMP) AS cohort_week,
                   CAST(datediff('day', f.cohort, a.wk) / 7 AS BIGINT) AS week_offset,
                   CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users
            FROM f JOIN act a USING (user_id)
            GROUP BY f.cohort, week_offset
            ORDER BY cohort_week, week_offset"""))

  /** Naive changepoint detection: rows where the mean of the next 4
    * observations shifts from the mean of the previous 4 by more than 60 —
    * both frame sums in EXACT DECIMAL (ts_moving_zscore precedent: a double
    * sliding-frame sum depends on the engine's add/evict order), divisions
    * in IEEE doubles over identical operands. Only full 4+4 windows are
    * eligible, so the boundary rows can't produce spurious shifts. */
  val tsChangepoint = Q(
    "ts_changepoint",
    (spark, sfDir) => {
      val base = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wb = base.rowsBetween(-4, -1)
      val wa = base.rowsBetween(0, 3)
      val dec = graft.util.D.dec(col("value"))
      Tables.events(spark, sfDir)
        .withColumn("sb", sum(dec).over(wb))
        .withColumn("nb", count(lit(1)).over(wb))
        .withColumn("sa", sum(dec).over(wa))
        .withColumn("na", count(lit(1)).over(wa))
        .filter(col("nb") === 4 && col("na") === 4)
        .withColumn("mean_before", col("sb").cast("double") / 4)
        .withColumn("mean_after", col("sa").cast("double") / 4)
        .filter(abs(col("mean_after") - col("mean_before")) > 60.0)
        .select(col("user_id"), col("ts"), col("event_id"),
          round(col("mean_before"), 4).as("mean_before"),
          round(col("mean_after"), 4).as("mean_after"),
          round(col("mean_after") - col("mean_before"), 4).as("shift"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""WITH w AS (
              SELECT user_id, ts, event_id,
                     sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS sb,
                     count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS nb,
                     sum(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sa,
                     count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS na
              FROM events)
            SELECT user_id, ts, event_id,
                   round(CAST(sb AS DOUBLE) / 4, 4) AS mean_before,
                   round(CAST(sa AS DOUBLE) / 4, 4) AS mean_after,
                   round(CAST(sa AS DOUBLE) / 4 - CAST(sb AS DOUBLE) / 4, 4) AS shift
            FROM w
            WHERE nb = 4 AND na = 4
              AND abs(CAST(sa AS DOUBLE) / 4 - CAST(sb AS DOUBLE) / 4) > 60.0
            ORDER BY user_id, ts, event_id"""))

  /** Lag-1 autocorrelation of `value` per user — the stationarity probe a
    * forecasting pipeline runs first. One lag window + one grouped corr,
    * both keyed on user_id. corr is the one sample statistic here computed
    * by the engines' own co-moment updates; round(4) absorbs the partial-
    * aggregation order difference (precedent: agg_percentile_corr at 6dp
    * over larger magnitudes). */
  val tsAutocorr = Q(
    "ts_autocorr",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, sfDir)
        .withColumn("pv", lag("value", 1).over(w))
        .filter(col("pv").isNotNull)
        .groupBy("user_id")
        // D.nz: a tiny-negative corr rounds to -0.0 in DuckDB but +0.0 in
        // Spark (sf5 sweep, round-10) — normalize after the round
        .agg(count(lit(1)).as("n_pairs"),
          D.nz(round(corr(col("value"), col("pv")), 4)).as("lag1_corr"))
        .orderBy("user_id")
    },
    Some("""WITH l AS (
              SELECT user_id, value,
                     lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv
              FROM events)
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
                   round(corr(value, pv), 4) + 0.0 AS lag1_corr
            FROM l WHERE pv IS NOT NULL
            GROUP BY user_id ORDER BY user_id"""))

  /** Attribution/conversion window: for every `view`, the number of
    * `click`s by the same user in the following 5 minutes — a VALUE-range
    * window frame (microseconds), not a row frame, so co-timed events are
    * handled by value and the result is partition-order independent. The
    * conditional count rides the same user-keyed sort as any lag/lead. */
  val tsConversionWindow = Q(
    "ts_conversion_window",
    (spark, sfDir) =>
      graft.ops.Ops.conversionWindow(Tables.events(spark, sfDir),
          col("user_id"), expr("unix_micros(cast(ts as timestamp))"),
          col("event_type") === "click", fromUs = 1L, toUs = 300000000L)
        .filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("n_in_window").as("n_clicks_5m"))
        .orderBy("event_id"),
    // oracle is the equivalent RANGE JOIN, not the window: DuckDB 1.0's
    // RANGE … FOLLOWING frame drops in-range peers on a handful of rows
    // over the full 10k-row partition-by (verified: the same window over a
    // single user returns the correct count; an explicit >/<= join agrees
    // with Spark on all 1,982 views)
    Some("""WITH e AS (
              SELECT event_id, user_id, ts, event_type, epoch_us(ts) AS us
              FROM events)
            SELECT v.event_id, v.user_id, v.ts,
                   CAST(count(c.event_id) AS BIGINT) AS n_clicks_5m
            FROM e v LEFT JOIN e c
              ON v.user_id = c.user_id AND c.event_type = 'click'
              AND c.us > v.us AND c.us <= v.us + 300000000
            WHERE v.event_type = 'view'
            GROUP BY v.event_id, v.user_id, v.ts
            ORDER BY v.event_id"""))

  /** Hour-of-day seasonality profile per event type — the diurnal-pattern
    * view behind load forecasting and anomaly baselines. One hash agg on
    * (type, hour): 120 groups regardless of corpus size, decimal-exact
    * sums. */
  val tsHourlyProfile = Q(
    "ts_hourly_profile",
    (spark, sfDir) =>
      // avg via EXACT integer arithmetic, truncated at 4dp: sums of 2-dp
      // values divided by hour counts routinely TERMINATE at 5 decimals
      // (e.g. 5514.30/80 = 68.92875) — a genuine 4dp midpoint, the one
      // case where Spark's repr-rounding and DuckDB's bits-rounding of
      // the same double disagree (observed at sf0.001). cents·10⁴ div n
      // is pure BIGINT on both engines; /10⁴ of the same integer is
      // bit-identical.
      Tables.events(spark, sfDir)
        .groupBy(col("event_type"), hour(col("ts")).cast("bigint").as("hr"))
        .agg(count(lit(1)).as("n"),
          (sum(graft.util.D.dec(col("value")) * 100).cast("bigint") * 10000L)
            .as("scaled"))
        // FLOOR division via pmod (Spark's `div` truncates toward zero,
        // DuckDB's `//` floors — they differ on negative sums; subtracting
        // the non-negative pmod first makes the dividend an exact multiple,
        // so `div` == floor for any sign)
        .select(col("event_type"), col("hr"), col("n"),
          (expr("(scaled - pmod(scaled, n)) div n").cast("double") / 10000.0)
            .as("avg_value"))
        .orderBy("event_type", "hr"),
    Some("""SELECT event_type, hr, n,
                   CAST(scaled // n AS DOUBLE) / 10000.0 AS avg_value
            FROM (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
                         CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(CAST(value AS DECIMAL(9,2))) * 100 AS BIGINT)
                           * 10000 AS scaled
                  FROM events GROUP BY event_type, hr)
            ORDER BY event_type, hr"""))

  /** First-touch / last-touch attribution: for every purchase, the user's
    * FIRST view ever (if strictly before the purchase) and the most recent
    * view strictly before it — the two endpoints of the marketing
    * attribution spectrum in one output. first-touch is a per-user min
    * (broadcastable aggregate); last-touch is a per-purchase max over the
    * user-keyed view join, all shuffles on user_id. */
  val tsAttribution = Q(
    "ts_attribution",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val v = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("ts").as("vts"))
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val ft = v.groupBy("vu").agg(min("vts").as("first_view"))
      val lt = p.join(v, col("user_id") === col("vu") && col("vts") < col("ts"))
        .groupBy("event_id").agg(max("vts").as("last_view"))
      p.join(ft, col("user_id") === col("vu") && col("first_view") < col("ts"),
          "left")
        .join(lt, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("first_view"), col("last_view"))
        .orderBy("event_id")
    },
    Some("""WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
            p AS (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase'),
            ft AS (SELECT user_id, min(ts) AS first_view FROM v GROUP BY user_id),
            lt AS (
              SELECT p.event_id, max(v.ts) AS last_view
              FROM p JOIN v ON p.user_id = v.user_id AND v.ts < p.ts
              GROUP BY p.event_id)
            SELECT p.event_id, p.user_id, p.ts, f.first_view, l.last_view
            FROM p
            LEFT JOIN ft f ON p.user_id = f.user_id AND f.first_view < p.ts
            LEFT JOIN lt l ON p.event_id = l.event_id
            ORDER BY p.event_id"""))

  /** Rate of change (dv/dt in units/second) per user — the derivative
    * pass at the heart of sensory-signal processing (velocity from
    * position, throughput from counters). One lag window; rows with no
    * predecessor or zero elapsed time (co-timed readings) are excluded
    * rather than dividing by zero. Identical IEEE ops over identical
    * operands on both engines; round(6) on the quotient. */
  val tsDerivative = Q(
    "ts_derivative",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(spark, sfDir)
        .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
        .withColumn("pv", lag("value", 1).over(w))
        .withColumn("pus", lag("us", 1).over(w))
        .filter(col("pv").isNotNull && col("us") > col("pus"))
        // + 0.0 canonicalizes IEEE -0.0 after rounding a tiny negative rate
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          (round((col("value") - col("pv"))
            / ((col("us") - col("pus")).cast("double") / 1000000.0), 6) + 0.0)
            .as("dv_dt"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""WITH l AS (
              SELECT user_id, ts, event_id, value,
                     lag(value) OVER w AS pv,
                     lag(epoch_us(ts)) OVER w AS pus,
                     epoch_us(ts) AS us
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT user_id, ts, event_id, value,
                   round((value - pv) / (CAST(us - pus AS DOUBLE) / 1000000.0), 6)
                     + 0.0 AS dv_dt
            FROM l WHERE pv IS NOT NULL AND us > pus
            ORDER BY user_id, ts, event_id"""))

  /** Per-user lifetime summary (round-8 addition) — the base table every
    * LTV / engagement / cohort analysis starts from: first and last
    * activity, event count, distinct active days, calendar span, and
    * events-per-active-day intensity. All integer/timestamp arithmetic
    * (the one ratio is integer-double division — exact on both engines);
    * one hash agg keyed on user_id, no windows, no self-joins. */
  val tsUserLifetime = Q(
    "ts_user_lifetime",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy("user_id")
        .agg(min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("n_events"),
          countDistinct(to_date(col("ts"))).as("n_active_days"))
        .withColumn("span_days",
          (datediff(to_date(col("last_ts")), to_date(col("first_ts"))) + 1)
            .cast("bigint"))
        .withColumn("events_per_day",
          round(col("n_events").cast("double") / col("n_active_days"), 4))
        .orderBy("user_id"),
    Some("""SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts,
                   count(*) AS n_events,
                   count(DISTINCT ts::DATE) AS n_active_days,
                   CAST(datediff('day', min(ts)::DATE, max(ts)::DATE) + 1
                        AS BIGINT) AS span_days,
                   round(CAST(count(*) AS DOUBLE)
                         / count(DISTINCT ts::DATE), 4) AS events_per_day
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Event-type Markov transition matrix (round-9) — the behavioral
    * fingerprint a sessionization/abuse pipeline derives per corpus:
    * P(next=to | cur=from) from each user's time-ordered event stream
    * (lead over the (ts, event_id) total order), estimated as
    * c(from,to) / Σ_to c(from,to). Probabilities are emitted UNROUNDED:
    * both engines divide the same exact integers, so the doubles are
    * bit-identical (rounding would re-enter the half-boundary zone —
    * rational c/total CAN land exactly on .5 grid points).
    *
    * 100-TB shape: one partitioned window per user (per-key linear),
    * one (from,to) hash agg over ≤ |types|² rows, the row-normalize
    * window over the tiny aggregate. */
  val tsMarkovTransitions = Q(
    "ts_markov_transitions",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val nxt = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
      val c = nxt.groupBy("from_type", "to_type")
        .agg(count(lit(1)).as("n"))
      val tot = Window.partitionBy("from_type")
      c.select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double")
            / sum(col("n")).over(tot).cast("double")).as("prob"))
        .orderBy("from_type", "to_type")
    },
    Some("""WITH nx AS (SELECT event_type AS from_type,
                               lead(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS to_type
                        FROM events),
                 c AS (SELECT from_type, to_type, count(*) AS n
                       FROM nx WHERE to_type IS NOT NULL
                       GROUP BY from_type, to_type)
            SELECT from_type, to_type, n,
                   CAST(n AS DOUBLE) /
                     CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE)
                     AS prob
            FROM c ORDER BY from_type, to_type"""))

  /** 24-BUCKET rolling correlation between the click and view hourly
    * revenue series (round-9) — the co-movement diagnostic behind
    * metric-anomaly alerting ("did clicks decouple from views this
    * window?"). NOTE (ADVICE-r9): the ROWS frame spans the last 24
    * OBSERVED hourly buckets, not 24 wall-clock hours — with gaps in the
    * series the lookback stretches past a day. Both engines agree
    * (parity-safe by construction); a wall-clock variant is the RANGE
    * INTERVAL frame win_time_range_frame demonstrates, optionally after
    * the ts_gap_fill recipe. Determinism is the ts_moving_zscore recipe:
    * hourly sums
    * and every frame sum run in EXACT DECIMAL (order-free), products at
    * scale 4 with documented width headroom, and the Pearson algebra is
    * double arithmetic over identical finished operands (sqrt is
    * IEEE-correctly-rounded), emitted unrounded; corr is NULL for n < 2
    * or a zero-variance window.
    *
    * 100-TB shape: the corpus-sized work is the (bucket) hash agg; the
    * unpartitioned ORDER BY bucket window runs over the HOURLY AGGREGATE
    * (calendar-sized, ~one row per hour — thousands of rows per year),
    * never the raw events, so the single-task window is bounded by time
    * span, not data volume. */
  val tsRollingCorr = Q(
    "ts_rolling_corr",
    (spark, sfDir) => {
      import org.apache.spark.sql.types.DecimalType
      val d184 = DecimalType(18, 4)
      val hourly = Tables.events(spark, sfDir)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(
          sum(when(col("event_type") === "click", D.dec(col("value")))
            .otherwise(D.dec(lit(0)))).cast(D.Money).as("x"),
          sum(when(col("event_type") === "view", D.dec(col("value")))
            .otherwise(D.dec(lit(0)))).cast(D.Money).as("y"))
      val w = Window.orderBy("bucket").rowsBetween(-23, 0)
      val framed = hourly.select(col("bucket"), col("x"), col("y"),
        count(lit(1)).over(w).cast("double").as("wn"),
        D.dbl(sum(col("x")).over(w).cast(D.Money)).as("sx"),
        D.dbl(sum(col("y")).over(w).cast(D.Money)).as("sy"),
        D.dbl(sum((col("x") * col("y")).cast(d184)).over(w).cast(d184)).as("sxy"),
        D.dbl(sum((col("x") * col("x")).cast(d184)).over(w).cast(d184)).as("sx2"),
        D.dbl(sum((col("y") * col("y")).cast(d184)).over(w).cast(d184)).as("sy2"))
      framed.select(D.ntz(col("bucket")).as("bucket"),
          D.dbl(col("x")).as("x"), D.dbl(col("y")).as("y"), col("wn"),
          when(col("wn") > 1.0
              && (col("wn") * col("sx2") - col("sx") * col("sx")) > 0.0
              && (col("wn") * col("sy2") - col("sy") * col("sy")) > 0.0,
            (col("wn") * col("sxy") - col("sx") * col("sy"))
              / (sqrt(col("wn") * col("sx2") - col("sx") * col("sx"))
                 * sqrt(col("wn") * col("sy2") - col("sy") * col("sy"))))
            .as("corr24"))
        .orderBy("bucket")
    },
    Some(s"""WITH hourly AS (
              SELECT date_trunc('hour', ts) AS bucket,
                     CAST(sum(CASE WHEN event_type = 'click'
                                   THEN ${D.oDec("value")}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END)
                          AS DECIMAL(18,2)) AS x,
                     CAST(sum(CASE WHEN event_type = 'view'
                                   THEN ${D.oDec("value")}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END)
                          AS DECIMAL(18,2)) AS y
              FROM events GROUP BY bucket),
            framed AS (
              SELECT bucket, x, y,
                     CAST(count(*) OVER w AS DOUBLE) AS wn,
                     ${D.oDbl("CAST(sum(x) OVER w AS DECIMAL(18,2))")} AS sx,
                     ${D.oDbl("CAST(sum(y) OVER w AS DECIMAL(18,2))")} AS sy,
                     ${D.oDbl("CAST(sum(CAST(x * y AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4))")} AS sxy,
                     ${D.oDbl("CAST(sum(CAST(x * x AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4))")} AS sx2,
                     ${D.oDbl("CAST(sum(CAST(y * y AS DECIMAL(18,4))) OVER w AS DECIMAL(18,4))")} AS sy2
              FROM hourly
              WINDOW w AS (ORDER BY bucket
                           ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
            SELECT CAST(bucket AS TIMESTAMP) AS bucket,
                   ${D.oDbl("x")} AS x, ${D.oDbl("y")} AS y, wn,
                   CASE WHEN wn > 1.0
                             AND (wn * sx2 - sx * sx) > 0.0
                             AND (wn * sy2 - sy * sy) > 0.0
                        THEN (wn * sxy - sx * sy)
                             / (sqrt(wn * sx2 - sx * sx)
                                * sqrt(wn * sy2 - sy * sy))
                   END AS corr24
            FROM framed ORDER BY bucket"""))

  /** Interval union / coverage (round-9) — "how much wall-clock was this
    * user active, counting overlaps once": per (user, day, event_type)
    * activity intervals [min ts, max ts] are merged across types by the
    * classic sweep — order intervals by (start, end, type), break an
    * island where start exceeds the running max of all PRIOR ends, number
    * islands by the running break count, then sum per-island spans. All
    * arithmetic is exact integer microseconds; the sweep order is a total
    * order, so both engines merge identically.
    *
    * 100-TB shape: the sweep windows partition by (user, day) — state
    * bounded per key (≤ |types| rows), never global; the rest is two
    * hash aggs. The same plan merges billions of intervals if the per-key
    * count stays bounded (it does: types × days). */
  val tsIntervalUnion = Q(
    "ts_interval_union",
    (spark, sfDir) => {
      val iv = Tables.events(spark, sfDir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"),
          col("event_type"))
        .agg(unix_micros(min(col("ts")).cast("timestamp")).as("s_us"),
          unix_micros(max(col("ts")).cast("timestamp")).as("e_us"))
      // delegate the sweep to the generic API (ops/Ops.scala) — the
      // graded query only re-aggregates the per-(user, day) sweep output
      // up to users
      graft.ops.Ops
        .intervalUnion(iv, Seq(col("user_id"), col("day")),
          col("s_us"), col("e_us"), col("event_type"))
        .groupBy("user_id")
        .agg(sum(col("n_intervals")).as("n_intervals"),
          sum(col("n_islands")).as("n_islands"),
          sum(col("covered")).as("covered_us"))
        .orderBy("user_id")
    },
    Some("""WITH iv AS (SELECT user_id, date_trunc('day', ts) AS day,
                               event_type,
                               epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
                        FROM events GROUP BY user_id, day, event_type),
                 sw AS (SELECT user_id, day, event_type, s_us, e_us,
                               max(e_us) OVER (PARTITION BY user_id, day
                                 ORDER BY s_us, e_us, event_type
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                                 AS runmax
                        FROM iv),
                 nb AS (SELECT user_id, day, event_type, s_us, e_us,
                               CASE WHEN runmax IS NULL OR s_us <= runmax
                                    THEN 0 ELSE 1 END AS brk
                        FROM sw),
                 isl AS (SELECT user_id, day, s_us, e_us,
                                sum(brk) OVER (PARTITION BY user_id, day
                                  ORDER BY s_us, e_us, event_type
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                                  AS island
                         FROM nb),
                 g AS (SELECT user_id, day, island,
                              min(s_us) AS is_s, max(e_us) AS is_e,
                              count(*) AS n_iv
                       FROM isl GROUP BY user_id, day, island)
            SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
                   count(*) AS n_islands,
                   CAST(sum(is_e - is_s) AS BIGINT) AS covered_us
            FROM g GROUP BY user_id ORDER BY user_id"""))

  /** LTTB downsampling (round-9) — Largest-Triangle-Three-Buckets
    * (Steinarsson 2013), the standard series-visualization reducer: one
    * representative point per day chosen to maximize the triangle area
    * against the NEIGHBOR BUCKETS' AVERAGES (the parallel formulation:
    * classic LTTB chains on the previously-selected point, a sequential
    * dependency; anchoring on bucket averages keeps per-bucket choices
    * independent — one window pass — at known negligible visual cost).
    * First/last buckets keep their first/last point (the LTTB contract).
    *
    * Determinism: the hourly series is (exact-integer relative µs, exact
    * decimal sum → double); neighbor averages divide exact integer/
    * decimal sums; the area formula then runs on bit-identical doubles
    * in both engines, so even the unrounded area ORDER matches — the cut
    * is row_number over (area DESC, t).
    *
    * 100-TB shape: series build is the tumbling hash agg; bucket
    * averages a second tiny agg; neighbor join by lag/lead over the
    * BUCKET frame (calendar-sized); the per-bucket argmax partitions by
    * day. Nothing touches raw events twice. */
  val tsDownsampleLttb = Q(
    "ts_downsample_lttb",
    (spark, sfDir) => {
      // v_dec stays DECIMAL through the day-average: summing the double
      // form would re-enter partial-order nondeterminism (cents are not
      // binary-exact); only finished values convert (the sumDec recipe).
      val hourly = Tables.events(spark, sfDir)
        .groupBy(date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(D.dec(col("value"))).cast(D.Money).as("v_dec"))
        .withColumn("v", D.dbl(col("v_dec")))
      val base = hourly.agg(
        unix_micros(min(col("bucket")).cast("timestamp")).as("t0"))
      val pts = hourly.crossJoin(broadcast(base))
        .select(col("bucket"),
          date_trunc("day", col("bucket")).as("day"),
          (unix_micros(col("bucket").cast("timestamp")) - col("t0"))
            .as("tr"), col("v"), col("v_dec"))
      val byDay = pts.groupBy("day")
        .agg((sum(col("tr")).cast("double") / count(lit(1)).cast("double"))
            .as("avg_t"),
          (D.dbl(sum(col("v_dec")).cast(D.Money))
            / count(lit(1)).cast("double")).as("avg_v"),
          count(lit(1)).as("n_points"))
      val wDay = Window.orderBy("day")
      val nb = byDay
        .withColumn("tp", lag(col("avg_t"), 1).over(wDay))
        .withColumn("vp", lag(col("avg_v"), 1).over(wDay))
        .withColumn("tn", lead(col("avg_t"), 1).over(wDay))
        .withColumn("vn", lead(col("avg_v"), 1).over(wDay))
      // nb is calendar-sized (one row per day) at ANY corpus size —
      // broadcast it so the neighbor attach is a hash join instead of a
      // sort-merge that sorts+shuffles the pts side (round 18, guide
      // §3.1: stats on the derived frame are unknown, so the planner
      // won't pick the broadcast by itself)
      val scored = pts.join(broadcast(nb), Seq("day"))
        .withColumn("area2",
          when(col("tp").isNull || col("tn").isNull, lit(null))
            .otherwise(abs(
              (col("tr").cast("double") - col("tp")) * (col("vn") - col("vp"))
                - (col("tn") - col("tp"))
                  * (col("v") - col("vp")))))
      val wPick = Window.partitionBy("day").orderBy(
        col("area2").desc_nulls_last, col("tr"))
      val wEdgeAsc = Window.partitionBy("day").orderBy(col("tr"))
      val wEdgeDesc = Window.partitionBy("day").orderBy(col("tr").desc)
      scored
        .withColumn("pick",
          when(col("tp").isNull, row_number().over(wEdgeAsc))
            .when(col("tn").isNull, row_number().over(wEdgeDesc))
            .otherwise(row_number().over(wPick)))
        .filter(col("pick") === 1)
        .select(D.ntz(col("day")).as("day"), D.ntz(col("bucket")).as("bucket"),
          col("v"), col("n_points"))
        .orderBy("day")
    },
    Some("""WITH hourly AS (
              SELECT date_trunc('hour', ts) AS bucket,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v_dec,
                     CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                          AS DOUBLE) AS v
              FROM events GROUP BY bucket),
            base AS (SELECT epoch_us(min(bucket)) AS t0 FROM hourly),
            pts AS (SELECT bucket, date_trunc('day', bucket) AS day,
                           epoch_us(bucket) - t0 AS tr, v, v_dec
                    FROM hourly CROSS JOIN base),
            byday AS (SELECT day,
                             CAST(sum(tr) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_t,
                             CAST(CAST(sum(v_dec) AS DECIMAL(18,2)) AS DOUBLE)
                               / CAST(count(*) AS DOUBLE) AS avg_v,
                             count(*) AS n_points
                      FROM pts GROUP BY day),
            nb AS (SELECT day, n_points,
                          lag(avg_t) OVER (ORDER BY day) AS tp,
                          lag(avg_v) OVER (ORDER BY day) AS vp,
                          lead(avg_t) OVER (ORDER BY day) AS tn,
                          lead(avg_v) OVER (ORDER BY day) AS vn
                   FROM byday),
            scored AS (SELECT p.day, p.bucket, p.tr, p.v, nb.n_points,
                              nb.tp, nb.tn,
                              CASE WHEN nb.tp IS NULL OR nb.tn IS NULL
                                   THEN NULL
                                   ELSE abs((CAST(p.tr AS DOUBLE) - nb.tp)
                                              * (nb.vn - nb.vp)
                                            - (nb.tn - nb.tp)
                                              * (p.v - nb.vp)) END AS area2
                       FROM pts p JOIN nb ON p.day = nb.day),
            picked AS (SELECT day, bucket, v, n_points,
                              CASE WHEN tp IS NULL THEN
                                     row_number() OVER (PARTITION BY day ORDER BY tr)
                                   WHEN tn IS NULL THEN
                                     row_number() OVER (PARTITION BY day ORDER BY tr DESC)
                                   ELSE
                                     row_number() OVER (PARTITION BY day
                                       ORDER BY area2 DESC NULLS LAST, tr)
                              END AS pick
                       FROM scored)
            SELECT CAST(day AS TIMESTAMP) AS day,
                   CAST(bucket AS TIMESTAMP) AS bucket, v, n_points
            FROM picked WHERE pick = 1 ORDER BY day"""))

  /** Naive-forecast error metrics (round-9) — the evaluation face of the
    * forecasting tier (ts_ewma/ts_derivative produce predictions; this
    * scores one): MAE and WAPE of the lag-1 persistence forecast on the
    * hourly revenue series, per event type. Errors are EXACT DECIMAL
    * (|v_t − v_{t−1}| of scale-2 hourly sums is scale-2 exact, summed
    * order-free); the two ratios divide finished decimal-to-double
    * operands — metric-evaluation-as-a-query, like text_lang_confusion
    * for classifiers.
    *
    * 100-TB shape: hourly agg on (type, bucket); lag over per-type
    * calendar-sized windows; final 5-group agg. */
  val tsForecastErrorNaive = Q(
    "ts_forecast_error_naive",
    (spark, sfDir) => {
      val hourly = Tables.events(spark, sfDir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(D.dec(col("value"))).cast(D.Money).as("v"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
      hourly
        .withColumn("prev", lag(col("v"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("abs_err", abs(col("v") - col("prev")).cast(D.Money))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          (D.dbl(sum(col("abs_err")).cast(D.Money))
            / count(lit(1)).cast("double")).as("mae"),
          (D.dbl(sum(col("abs_err")).cast(D.Money))
            / D.dbl(sum(abs(col("v")).cast(D.Money)).cast(D.Money))).as("wape"))
        .orderBy("event_type")
    },
    Some("""WITH hourly AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
              FROM events GROUP BY event_type, bucket),
                 lagged AS (
              SELECT event_type, v,
                     lag(v) OVER (PARTITION BY event_type ORDER BY bucket) AS prev
              FROM hourly),
                 err AS (
              SELECT event_type, v,
                     CAST(abs(v - prev) AS DECIMAL(18,2)) AS abs_err
              FROM lagged WHERE prev IS NOT NULL)
            SELECT event_type, count(*) AS n_hours,
                   CAST(CAST(sum(abs_err) AS DECIMAL(18,2)) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS mae,
                   CAST(CAST(sum(abs_err) AS DECIMAL(18,2)) AS DOUBLE)
                     / CAST(CAST(sum(CAST(abs(v) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
                     AS wape
            FROM err GROUP BY event_type ORDER BY event_type"""))

  /** Local-peak detection (round-9) — the signal-shape primitive behind
    * alerting and event summarization: hours whose revenue strictly
    * exceeds BOTH neighbors on the per-type hourly series, with the
    * lesser rise (min of the two deltas) as a prominence-lite measure.
    * All comparisons and deltas are EXACT DECIMAL on scale-2 hourly sums
    * — strict inequalities cannot sit on a float boundary.
    *
    * 100-TB shape: hourly agg + one per-type lag/lead window over the
    * calendar-sized series. */
  val tsPeakDetect = Q(
    "ts_peak_detect",
    (spark, sfDir) => {
      val hourly = Tables.events(spark, sfDir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(D.dec(col("value"))).cast(D.Money).as("v"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
      hourly
        .withColumn("prev", lag(col("v"), 1).over(w))
        .withColumn("next", lead(col("v"), 1).over(w))
        .filter(col("prev").isNotNull && col("next").isNotNull
          && col("v") > col("prev") && col("v") > col("next"))
        .select(col("event_type"), D.ntz(col("bucket")).as("bucket"),
          D.dbl(col("v")).as("v"),
          D.dbl(least(col("v") - col("prev"), col("v") - col("next"))
            .cast(D.Money)).as("prominence"))
        .orderBy("event_type", "bucket")
    },
    Some("""WITH hourly AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
              FROM events GROUP BY event_type, bucket),
                 n AS (
              SELECT event_type, bucket, v,
                     lag(v) OVER w AS prev, lead(v) OVER w AS next
              FROM hourly
              WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
            SELECT event_type, CAST(bucket AS TIMESTAMP) AS bucket,
                   CAST(v AS DOUBLE) AS v,
                   CAST(CAST(least(v - prev, v - next) AS DECIMAL(18,2)) AS DOUBLE)
                     AS prominence
            FROM n
            WHERE prev IS NOT NULL AND next IS NOT NULL
              AND v > prev AND v > next
            ORDER BY event_type, bucket"""))

  /** Hour-of-week profile with ROLLUP margins (round-9) — calendar-
    * effects analysis: the 7×24 (dow, hour) activity grid PLUS its
    * per-dow subtotals and grand total in one pass (GROUP BY ROLLUP),
    * the weekly-seasonality profile capacity planning reads. Averages
    * use ts_hourly_profile's exact-integer recipe (cents·10⁴ div n is
    * pure BIGINT; /10⁴ of the same integer is bit-identical — sums of
    * 2-dp values over calendar cells routinely terminate ON a 4dp
    * midpoint, where the engines' double roundings disagree). Margin
    * rows surface dow/hr as -1 (COALESCE over the rollup NULLs keeps
    * the output total-orderable).
    *
    * 100-TB shape: ROLLUP is one Expand + hash agg — the grid is
    * calendar-sized regardless of corpus. */
  val tsWeekProfileRollup = Q(
    "ts_week_profile_rollup",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .select(
          (((dayofweek(col("ts")) + 5) % 7) + 1).cast("bigint").as("dow"),
          hour(col("ts")).cast("bigint").as("hr"),
          col("value"))
        .rollup("dow", "hr")
        .agg(count(lit(1)).as("n"),
          ((sum(D.dec(col("value")).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * lit(10000))
            .cast("bigint").cast("double")
            / count(lit(1)).cast("double") / lit(10000.0)).as("avg_value"))
        .select(coalesce(col("dow"), lit(-1L)).as("dow"),
          coalesce(col("hr"), lit(-1L)).as("hr"), col("n"), col("avg_value"))
        .orderBy("dow", "hr"),
    Some("""SELECT coalesce(dow, -1) AS dow, coalesce(hr, -1) AS hr,
                   count(*) AS n,
                   CAST(CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                          AS DECIMAL(18,2)) * 10000 AS BIGINT) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) / 10000.0 AS avg_value
            FROM (SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                         CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr, value
                  FROM events)
            GROUP BY ROLLUP (dow, hr)
            ORDER BY dow, hr"""))

  /** Session-scoped funnel (round-9) — "completed view→click→purchase
    * WITHIN ONE SESSION", the product metric the user-lifetime funnel
    * (ts_funnel) deliberately over-counts: stages must advance inside
    * the same 30-minute-gap session (the ts_session gaps-and-islands
    * sid, spelled identically in both engines), each stage strictly
    * after the previous stage's first completion. Output: sessions
    * surviving each stage.
    *
    * 100-TB shape: the sid window is per-user linear; each stage is a
    * keyed agg + equi-join on (user, sid) — the funnel never leaves the
    * session key. */
  val tsSessionizedFunnel = Q(
    "ts_sessionized_funnel",
    (spark, sfDir) => {
      // Round-18 single-exchange form (guide §2.4): the old shape
      // re-executed the sessionize window THREE times (once per stage
      // subtree) and shuffled three stage aggregates back through two
      // (user, sid)-keyed joins. Every stage threshold is a per-session
      // aggregate, so all three ride as stacked window aggregates over
      // (user_id, sid) — which hashpartitioning(user_id) from the sid
      // window already satisfies (subset rule), so the WHOLE funnel runs
      // on ONE fact exchange; the session-level collapse then needs no
      // exchange either, and only the final 1-row census shuffles.
      // Stage values are identical by construction: t1 = min ts of the
      // session's views (null ⇒ the session is absent from the old s1),
      // t2 = min ts of clicks strictly after t1 (a null t1 nulls the
      // comparison, so such sessions count in neither form), t3 same
      // one step on. Plan diff: 6 Exchange / 2 joins / 3 window
      // re-executions → 2 Exchange, no joins, one window pass.
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wSess = Window.partitionBy("user_id", "sid")
      val ev = Tables.events(spark, sfDir)
        .withColumn("brk",
          when(unix_micros(col("ts").cast("timestamp"))
            - unix_micros(lag(col("ts"), 1).over(wOrd).cast("timestamp"))
            > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .select("user_id", "sid", "event_type", "ts")
      val staged = ev
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(wSess))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") > col("t1"),
            col("ts"))).over(wSess))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
            col("ts"))).over(wSess))
      staged.groupBy("user_id", "sid")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
        .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
          count(col("t3")).as("n3"))
        .select(expr(
          "stack(3, '1_view', n1, '2_click', n2, '3_purchase', n3)")
          .as(Seq("stage", "n_sessions")))
        .orderBy("stage")
    },
    Some("""WITH flagged AS (
              SELECT user_id, ts, event_type, event_id,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) > INTERVAL 30 MINUTES
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            sess AS (
              SELECT user_id, event_type, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged),
            s1 AS (SELECT user_id, sid, min(ts) AS t1 FROM sess
                   WHERE event_type = 'view' GROUP BY user_id, sid),
            s2 AS (SELECT e.user_id, e.sid, min(e.ts) AS t2 FROM sess e
                   JOIN s1 ON e.user_id = s1.user_id AND e.sid = s1.sid
                   WHERE e.event_type = 'click' AND e.ts > s1.t1
                   GROUP BY e.user_id, e.sid),
            s3 AS (SELECT e.user_id, e.sid, min(e.ts) AS t3 FROM sess e
                   JOIN s2 ON e.user_id = s2.user_id AND e.sid = s2.sid
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                   GROUP BY e.user_id, e.sid)
            SELECT stage, n_sessions FROM (
              SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_sessions FROM s1
              UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
              UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3)
            ORDER BY stage"""))

  /** Arrival burstiness (Fano factor) per event type (round-10) — the
    * dispersion diagnostic that separates uniform from bursty arrival
    * (Fano = variance/mean of per-hour event counts; 1 ≈ Poisson, ≫1 =
    * bursty): the capacity-planning and bot-detection primitive.
    * Computed over OBSERVED hourly buckets (hours containing ≥1 event —
    * the ts_rolling_corr bucket convention; a wall-clock variant would
    * gap-fill zeros first, the ts_gap_fill recipe). Determinism: bucket
    * counts are exact integers; sample variance is assembled from the
    * integer sum and sum-of-squares (n·Σx² − (Σx)², exact BIGINT) with
    * one double division; Fano is a division of those finished operands.
    *
    * 100-TB shape: two-level hash agg ((type, hour) then type) — the
    * agg_skew_census shape over time buckets. */
  val tsBurstiness = Q(
    "ts_burstiness",
    (spark, sfDir) => {
      val hourly = Tables.events(spark, sfDir)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("c"))
      hourly.groupBy("event_type")
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("s2"),
          max(col("c")).as("max_hour"))
        .filter(col("n_buckets") > 1)
        .select(col("event_type"), col("n_buckets"), col("max_hour"),
          (col("s").cast("double") / col("n_buckets").cast("double"))
            .as("mean_per_hour"),
          (((col("n_buckets") * col("s2") - col("s") * col("s"))
            .cast("double")
            / (col("n_buckets") * (col("n_buckets") - 1)).cast("double"))
            / (col("s").cast("double") / col("n_buckets").cast("double")))
            .as("fano"))
        .orderBy("event_type")
    },
    Some("""WITH hourly AS (
              SELECT event_type, date_trunc('hour', ts) AS bucket,
                     count(*) AS c
              FROM events GROUP BY event_type, bucket),
                 agg AS (
              SELECT event_type,
                     count(*) AS n_buckets,
                     CAST(sum(c) AS BIGINT) AS s,
                     CAST(sum(c * c) AS BIGINT) AS s2,
                     CAST(max(c) AS BIGINT) AS max_hour
              FROM hourly GROUP BY event_type)
            SELECT event_type, n_buckets, max_hour,
                   CAST(s AS DOUBLE) / CAST(n_buckets AS DOUBLE)
                     AS mean_per_hour,
                   (CAST(n_buckets * s2 - s * s AS DOUBLE)
                    / CAST(n_buckets * (n_buckets - 1) AS DOUBLE))
                   / (CAST(s AS DOUBLE) / CAST(n_buckets AS DOUBLE)) AS fano
            FROM agg WHERE n_buckets > 1
            ORDER BY event_type"""))

  /** Inter-event gap histogram per event type (round-10) — the
    * DISTRIBUTION behind ts_burstiness's Fano scalar: per-user
    * consecutive-event gaps, log-banded by the explicit integer CASE
    * (seconds: <1s, 1s-1m, 1m-30m, 30m-6h, 6h+ — the bands that
    * separate bot bursts / sessions / daily returns), with counts and
    * the band fraction. Gap computation is the ts_derivative lag shape
    * (exact integer microseconds); bands are integer comparisons.
    *
    * 100-TB shape: per-user lag window (user-keyed, linear) + a 5-band
    * hash agg + broadcast total. */
  val tsInterEventHist = Q(
    "ts_inter_event_hist",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = Tables.events(spark, sfDir)
        .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
        .withColumn("pus", lag("us", 1).over(w))
        .filter(col("pus").isNotNull)
        .select(col("event_type"), (col("us") - col("pus")).as("gap_us"))
      val g = col("gap_us")
      val banded = gaps.select(col("event_type"),
        when(g < 1000000L, "0_lt_1s")
          .when(g < 60000000L, "1_1s_1m")
          .when(g < 1800000000L, "2_1m_30m")
          .when(g < 21600000000L, "3_30m_6h")
          .otherwise("4_ge_6h").as("band"))
      val total = banded.agg(count(lit(1)).as("t"))
      banded.groupBy("event_type", "band")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(total))
        .select(col("event_type"), col("band"), col("n"),
          (col("n").cast("double") / col("t").cast("double")).as("frac"))
        .orderBy("event_type", "band")
    },
    Some("""WITH gaps AS (
              SELECT event_type,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
              FROM events),
                 banded AS (
              SELECT event_type,
                     CASE WHEN gap_us < 1000000 THEN '0_lt_1s'
                          WHEN gap_us < 60000000 THEN '1_1s_1m'
                          WHEN gap_us < 1800000000 THEN '2_1m_30m'
                          WHEN gap_us < 21600000000 THEN '3_30m_6h'
                          ELSE '4_ge_6h' END AS band
              FROM gaps WHERE gap_us IS NOT NULL),
                 t AS (SELECT count(*) AS t FROM banded)
            SELECT event_type, band, count(*) AS n,
                   CAST(count(*) AS DOUBLE) / CAST(t AS DOUBLE) AS frac
            FROM banded CROSS JOIN t
            GROUP BY event_type, band, t
            ORDER BY event_type, band"""))

  /** Day-over-day percent change (round-9) — the dashboard primitive:
    * daily revenue per type with absolute and relative change vs the
    * previous day. Deltas are EXACT DECIMAL; the percent is one division
    * of finished identical operands (NULL on first day / zero base).
    *
    * 100-TB shape: daily agg + one per-type lag window over the
    * calendar-sized series. */
  val tsPctChange = Q(
    "ts_pct_change",
    (spark, sfDir) => {
      val daily = Tables.events(spark, sfDir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).as("day"))
        .agg(sum(D.dec(col("value"))).cast(D.Money).as("v"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily
        .withColumn("prev", lag(col("v"), 1).over(w))
        .select(col("event_type"), D.ntz(col("day")).as("day"),
          D.dbl(col("v")).as("v"),
          D.dbl((col("v") - col("prev")).cast(D.Money)).as("delta"),
          when(col("prev").isNotNull && col("prev") =!= lit(0).cast(D.Money),
            D.dbl((col("v") - col("prev")).cast(D.Money))
              / D.dbl(col("prev"))).as("pct_change"))
        .orderBy("event_type", "day")
    },
    Some("""WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
              FROM events GROUP BY event_type, day),
                 lg AS (SELECT event_type, day, v,
                               lag(v) OVER (PARTITION BY event_type
                                            ORDER BY day) AS prev
                        FROM daily)
            SELECT event_type, CAST(day AS TIMESTAMP) AS day,
                   CAST(v AS DOUBLE) AS v,
                   CAST(CAST(v - prev AS DECIMAL(18,2)) AS DOUBLE) AS delta,
                   CASE WHEN prev IS NOT NULL AND prev != 0
                        THEN CAST(CAST(v - prev AS DECIMAL(18,2)) AS DOUBLE)
                             / CAST(prev AS DOUBLE) END AS pct_change
            FROM lg ORDER BY event_type, day"""))

  /** Largest inactivity gap per user (round-9) — the churn/dropout
    * signal: the longest silence between consecutive events, as exact
    * integer microseconds with the gap's endpoints. The per-user argmax
    * is a total-ordered row_number cut (gap DESC, then gap start — two
    * equal gaps resolve to the earlier one identically in both engines).
    *
    * 100-TB shape: one per-user lag window + one per-user cut — linear
    * per key. */
  val tsMaxGap = Q(
    "ts_max_gap",
    (spark, sfDir) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = Tables.events(spark, sfDir)
        .filter(col("user_id") < 200)
        .withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
        .filter(col("prev_ts").isNotNull)
        .select(col("user_id"),
          (unix_micros(col("ts").cast("timestamp"))
            - unix_micros(col("prev_ts").cast("timestamp"))).as("gap_us"),
          D.ntz(col("prev_ts")).as("gap_start"),
          D.ntz(col("ts")).as("gap_end"))
      val wPick = Window.partitionBy("user_id")
        .orderBy(col("gap_us").desc, col("gap_start"))
      gaps.withColumn("rk", row_number().over(wPick))
        .filter(col("rk") === 1)
        .select("user_id", "gap_us", "gap_start", "gap_end")
        .orderBy("user_id")
    },
    Some("""WITH gaps AS (
              SELECT user_id,
                     epoch_us(ts) - epoch_us(prev_ts) AS gap_us,
                     prev_ts AS gap_start, ts AS gap_end
              FROM (SELECT user_id, ts,
                           lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_ts
                    FROM events WHERE user_id < 200)
              WHERE prev_ts IS NOT NULL)
            SELECT user_id, gap_us, gap_start, gap_end FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY gap_us DESC, gap_start) AS rk
              FROM gaps)
            WHERE rk = 1 ORDER BY user_id"""))

  /** DAU / WAU stickiness (round-9) — the product-health ratio: daily
    * distinct actives over trailing-7-day distinct actives, per day.
    * WAU comes from the 7-day-window / 1-day-slide sliding window (each
    * event legitimately counts toward 7 windows — the window() fan-out,
    * exactly like ts_sliding), DAU from the daily tumbling distinct;
    * join on the window END day so both sides describe the same
    * trailing period; stickiness is one identical-integer division.
    * Only windows fully inside the observed span are reported (the
    * leading ramp-up days under-count WAU by construction).
    *
    * 100-TB shape: both sides are distinct aggs on (window, user) —
    * shuffle on the user key; the fan-out multiplies rows by 7, the
    * price every sliding window pays. */
  val tsStickiness = Q(
    "ts_stickiness",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val dau = ev.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = ev
        .groupBy(window(col("ts"), "7 days", "1 day").as("w"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(date_trunc("day", col("w.end") - expr("INTERVAL 1 DAY"))
          .as("day"), col("wau"))
      val bounds = ev.agg(
        date_trunc("day", min(col("ts"))).as("lo"),
        date_trunc("day", max(col("ts"))).as("hi"))
      dau.join(wau, Seq("day"))
        .crossJoin(broadcast(bounds))
        .filter(col("day") >= col("lo") + expr("INTERVAL 6 DAYS")
          && col("day") <= col("hi"))
        .select(D.ntz(col("day")).as("day"), col("dau"), col("wau"),
          (col("dau").cast("double") / col("wau").cast("double"))
            .as("stickiness"))
        .orderBy("day")
    },
    Some("""WITH dau AS (SELECT date_trunc('day', ts) AS day,
                                count(DISTINCT user_id) AS dau
                         FROM events GROUP BY day),
                 offs AS (SELECT unnest(generate_series(0, 6)) AS o),
                 wau AS (SELECT day, count(DISTINCT user_id) AS wau
                         FROM (SELECT date_trunc('day', ts)
                                        + to_days(CAST(o AS INT)) AS day,
                                      user_id
                               FROM events CROSS JOIN offs)
                         GROUP BY day),
                 bounds AS (SELECT date_trunc('day', min(ts)) AS lo,
                                   date_trunc('day', max(ts)) AS hi
                            FROM events)
            SELECT CAST(day AS TIMESTAMP) AS day, dau, wau,
                   CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
            FROM dau JOIN wau USING (day) CROSS JOIN bounds
            WHERE day >= lo + INTERVAL 6 DAYS AND day <= hi
            ORDER BY day"""))

  /** Ingestion-order violations (round-9) — the data-quality audit every
    * event pipeline runs: in each user's stream ordered by event_id
    * (assignment order), count adjacent pairs whose timestamps run
    * BACKWARD (late/clock-skewed arrivals), with the worst regression.
    * Exact integer microseconds; per-user census plus only violating
    * users reported.
    *
    * 100-TB shape: one per-user lag window + one per-user agg. */
  val tsOrderViolations = Q(
    "ts_order_violations",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
      Tables.events(spark, sfDir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .filter(col("prev_ts").isNotNull)
        .select(col("user_id"),
          (unix_micros(col("prev_ts").cast("timestamp"))
            - unix_micros(col("ts").cast("timestamp"))).as("back_us"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("back_us") > 0L, 1L).otherwise(0L)).as("n_violations"),
          max(when(col("back_us") > 0L, col("back_us")).otherwise(0L))
            .as("worst_back_us"))
        .filter(col("n_violations") > 0)
        .orderBy("user_id")
    },
    Some("""WITH lagged AS (
              SELECT user_id,
                     epoch_us(lag(ts) OVER (PARTITION BY user_id
                                            ORDER BY event_id))
                       - epoch_us(ts) AS back_us
              FROM events),
                 g AS (SELECT user_id, count(*) AS n_pairs,
                              CAST(sum(CASE WHEN back_us > 0 THEN 1 ELSE 0 END)
                                   AS BIGINT) AS n_violations,
                              CAST(max(CASE WHEN back_us > 0 THEN back_us
                                            ELSE 0 END) AS BIGINT)
                                AS worst_back_us
                       FROM lagged WHERE back_us IS NOT NULL
                       GROUP BY user_id)
            SELECT user_id, n_pairs, n_violations, worst_back_us
            FROM g WHERE n_violations > 0 ORDER BY user_id"""))

  /** Holt double-exponential smoothing (level + trend) per event type
    * (round-12) — the forecasting face past ts_forecast_error_naive's
    * baseline: daily revenue series smoothed with α=β=0.5 (l' = ½y +
    * ½(l+b); b' = ½(l'−l) + ½b; init l=y₁, b=0), reporting final level,
    * trend, the one-step-ahead forecast l+b, and the in-sample MAE of
    * the one-step forecasts — the trend-aware capacity-planning readout.
    * Determinism: daily totals are order-free DECIMAL sums cast to
    * double ONCE; the recursion is a FIXED-ORDER chain of IEEE +,·½ ops
    * (no libm), so Spark's array fold and DuckDB's recursive CTE run the
    * bit-identical op sequence (ts_ewma's argument, extended to a
    * stateful fold); outputs round at 4.
    *
    * 100-TB shape: one (type, day) hash agg, then a per-type fold over
    * the CALENDAR-sized daily array (collect is bounded by days, never
    * events — the same bounded-collect contract as ts_downsample_lttb);
    * types parallelize across partitions. */
  val tsHoltTrend = Q(
    "ts_holt_trend",
    (spark, sfDir) => {
      val daily = Tables.events(spark, sfDir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("revd"))
      val series = daily
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"),
          col("revd").cast("double").as("y")))).as("s"))
        .select(col("event_type"), size(col("s")).cast("long").as("n_days"),
          aggregate(
            slice(col("s"), lit(2), size(col("s")) - 1),
            struct(element_at(col("s"), 1).getField("y").as("l"),
              lit(0.0).as("b"), lit(0.0).as("sae")),
            (st, e) => {
              val y = e.getField("y")
              val l = st.getField("l"); val b = st.getField("b")
              val lNew = lit(0.5) * y + lit(0.5) * (l + b)
              struct(lNew.as("l"),
                (lit(0.5) * (lNew - l) + lit(0.5) * b).as("b"),
                (st.getField("sae") + abs(y - (l + b))).as("sae"))
            }).as("st"))
      series.select(col("event_type"), col("n_days"),
        round(col("st.l"), 4).as("level"),
        round(col("st.b"), 4).as("trend"),
        round(col("st.l") + col("st.b"), 4).as("forecast_next"),
        when(col("n_days") > 1,
          round(col("st.sae") / (col("n_days") - 1).cast("double"), 4))
          .as("mae"))
        .orderBy("event_type")
    },
    Some("""WITH RECURSIVE
                 daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                                  sum(CAST(value AS DECIMAL(18,6))) AS revd
                           FROM events GROUP BY event_type, day),
                 d AS (SELECT event_type, CAST(revd AS DOUBLE) AS y,
                              row_number() OVER (PARTITION BY event_type
                                                 ORDER BY day) AS i
                       FROM daily),
                 n AS (SELECT event_type, count(*) AS n_days FROM d
                       GROUP BY event_type),
                 rec(event_type, i, l, b, sae) AS (
                   SELECT event_type, 1, y, CAST(0.0 AS DOUBLE),
                          CAST(0.0 AS DOUBLE)
                   FROM d WHERE i = 1
                   UNION ALL
                   SELECT r.event_type, r.i + 1,
                          0.5 * d.y + 0.5 * (r.l + r.b),
                          0.5 * ((0.5 * d.y + 0.5 * (r.l + r.b)) - r.l)
                            + 0.5 * r.b,
                          r.sae + abs(d.y - (r.l + r.b))
                   FROM rec r JOIN d ON d.event_type = r.event_type
                     AND d.i = r.i + 1)
            SELECT n.event_type, CAST(n.n_days AS BIGINT) AS n_days,
                   round(l, 4) AS level, round(b, 4) AS trend,
                   round(l + b, 4) AS forecast_next,
                   CASE WHEN n.n_days > 1
                        THEN round(sae / CAST(n.n_days - 1 AS DOUBLE), 4)
                   END AS mae
            FROM rec JOIN n ON rec.event_type = n.event_type
              AND rec.i = n.n_days
            ORDER BY n.event_type"""))

  /** Seasonal-residual variance decomposition (round-12): how much of
    * each event type's value variance the hour-of-day profile explains —
    * the audit a pipeline runs BEFORE deploying an anomaly detector
    * (ts_anomaly_mad, ts_moving_zscore): if the seasonal share is high,
    * detect on the residual, not the raw series. seasonal = the
    * per-(type, hour) mean (ts_hourly_profile's frame as a window, so no
    * join); residual = value - seasonal; variance_explained =
    * 1 - var(residual)/var(raw), which is within-groups/total sum of
    * squares, so it is >= 0 mathematically (`+ 0.0` canonicalizes the
    * float-boundary -0.0 per the determinism policy). Measured ~0.01 on
    * the fixtures: a truthful "values are not hour-seasonal here"
    * readout, like vec_matryoshka_recall's regime detection.
    *
    * 100-TB shape: one (type, hour)-keyed window (24 x types cells) +
    * one hash aggregate; no global ordering anywhere before the final
    * output sort. */
  val tsSeasonalResidual = Q(
    "ts_seasonal_residual",
    (spark, sfDir) => {
      // Round-13 determinism hardening (ADVICE r12 #2): the former
      // var_samp/stddev_samp over double residuals was aggregation-order-
      // dependent on both engines and leaned on 4dp rounding alone. Now
      // every aggregated leaf is exact: the seasonal mean is an exact
      // decimal sum ÷ count (both engines reach the identical double),
      // residuals are QUANTIZED to a 1e-4 integer grid, and both
      // variances come from exact sum/sum-of-squares (decimal for raw,
      // BIGINT→DECIMAL(38,0) for the quantized residuals) via the
      // movingZscore recipe — no order-dependent float sum anywhere
      // before the final scalar arithmetic.
      val hw = Window.partitionBy(col("event_type"), hour(col("ts")))
      val dec = col("value").cast(graft.util.D.Money)
      val seasonal = (sum(dec).over(hw).cast(graft.util.D.Money)
        .cast("double")) / count(lit(1)).over(hw).cast("double")
      Tables.events(spark, sfDir)
        .withColumn("rq",
          round((col("value") - seasonal) * 10000.0, 0).cast("bigint"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec).cast(graft.util.D.Money).cast("double").as("graft_sv"),
          // Widened accumulators (ADVICE r13): the per-row square is cast
          // to DECIMAL(38,4) BEFORE summing (a narrow 18,4 sum overflows —
          // silently to NULL on Spark, an error in DuckDB — at larger SFs),
          // and rq is widened to DECIMAL(19,0) before the self-multiply so
          // the product can never wrap int64. Widening precision (never
          // scale) of an exact decimal changes no value at any SF.
          sum((dec * dec).cast(org.apache.spark.sql.types.DecimalType(38, 4)))
            .cast(org.apache.spark.sql.types.DecimalType(38, 4))
            .cast("double").as("graft_qv"),
          sum(col("rq").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double").as("graft_sr"),
          sum((col("rq").cast(org.apache.spark.sql.types.DecimalType(19, 0))
              * col("rq").cast(org.apache.spark.sql.types.DecimalType(19, 0))))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))
            .cast("double").as("graft_qr"))
        .select(col("event_type"), col("n"),
          round(sqrt((col("graft_qv")
              - col("graft_sv") * col("graft_sv") / col("n").cast("double"))
            / (col("n").cast("double") - 1.0)), 4).as("sd_raw"),
          round(sqrt(((col("graft_qr")
              - col("graft_sr") * col("graft_sr") / col("n").cast("double"))
            / (col("n").cast("double") - 1.0)) / 100000000.0), 4)
            .as("sd_resid"),
          (round(lit(1.0)
            - (col("graft_qr")
                - col("graft_sr") * col("graft_sr") / col("n").cast("double"))
              / 100000000.0
              / (col("graft_qv")
                - col("graft_sv") * col("graft_sv") / col("n").cast("double")),
            4) + lit(0.0)).as("var_explained"))
        .orderBy("event_type")
    },
    Some("""WITH s AS (SELECT event_type, value,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                          OVER (PARTITION BY event_type, hour(ts))
                        AS DECIMAL(18,2)) AS DOUBLE)
                   / CAST(count(*) OVER (PARTITION BY event_type, hour(ts))
                          AS DOUBLE) AS seasonal
            FROM events),
            r AS (SELECT event_type, value,
                   CAST(round((value - seasonal) * 10000, 0) AS BIGINT) AS rq
                  FROM s),
            a AS (SELECT event_type, count(*) AS n,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS DOUBLE) AS sv,
                   CAST(CAST(sum(CAST(CAST(value AS DECIMAL(18,2))
                                      * CAST(value AS DECIMAL(18,2))
                                 AS DECIMAL(38,4)))
                        AS DECIMAL(38,4)) AS DOUBLE) AS qv,
                   CAST(sum(CAST(rq AS DECIMAL(38,0))) AS DOUBLE) AS sr,
                   CAST(CAST(sum(CAST(rq AS DECIMAL(19,0))
                                 * CAST(rq AS DECIMAL(19,0)))
                        AS DECIMAL(38,0)) AS DOUBLE) AS qr
                  FROM r GROUP BY event_type)
            SELECT event_type, n,
                   round(sqrt((qv - sv*sv/CAST(n AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0)), 4) AS sd_raw,
                   round(sqrt(((qr - sr*sr/CAST(n AS DOUBLE))
                               / (CAST(n AS DOUBLE) - 1.0))
                              / 100000000.0), 4) AS sd_resid,
                   round(1.0 - (qr - sr*sr/CAST(n AS DOUBLE)) / 100000000.0
                             / (qv - sv*sv/CAST(n AS DOUBLE)), 4) + 0.0
                     AS var_explained
            FROM a ORDER BY event_type"""))

  def qs: Seq[Q] = Seq(tsTumbling, tsSliding, tsSession, tsDedup, tsGapFill,
    tsOhlc, tsResampleInterp, tsMovingZscore, tsEwma, tsAnomalyMad,
    tsFunnel, tsRetentionCohort, tsChangepoint, tsAutocorr,
    tsConversionWindow, tsHourlyProfile, tsAttribution, tsDerivative,
    tsUserLifetime, tsMarkovTransitions, tsRollingCorr, tsIntervalUnion,
    tsDownsampleLttb, tsForecastErrorNaive, tsPeakDetect,
    tsWeekProfileRollup, tsSessionizedFunnel, tsPctChange, tsMaxGap,
    tsStickiness, tsOrderViolations, tsBurstiness, tsInterEventHist,
    tsHoltTrend, tsSeasonalResidual)
}
