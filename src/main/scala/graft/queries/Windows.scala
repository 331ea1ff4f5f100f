package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{D, Tables}

/** Window functions (SURVEY §2.5).
  *
  * 100-TB notes: every window is partitioned by a high-cardinality key
  * (custkey / user_id / orderpriority), so state per partition stays
  * bounded and the sort is distributed; only the final presentation
  * ORDER BY is global. Rank-family outputs are cast to BIGINT to match
  * DuckDB's native window-function type.
  */
object Windows {


  /** Forward fill with IGNORE NULLS (round-9) — the sensor-stream repair
    * primitive: a reading invalidated upstream (here: error events carry
    * no trustworthy value, derived as NULL) inherits the last good value
    * in its user's (ts, event_id) order via last_value IGNORE NULLS over
    * the running frame — the semantics a bare last()/lag() cannot
    * express (they'd propagate the NULL itself). Leading NULLs before
    * any good reading stay NULL (no value to inherit), which the census
    * column makes visible.
    *
    * 100-TB shape: one window partitioned by user — per-key linear
    * state, the same scaling class as win_lead_lag. */
  val winForwardFill = Q(
    "win_forward_fill",
    (spark, sfDir) => {
      // delegates to the generic Ops.forwardFill (round-9 API)
      graft.ops.Ops.forwardFill(
          Tables.events(spark, sfDir)
            .filter(col("user_id") < 100)
            .select(col("event_id"), col("user_id"), col("event_type"),
              col("ts"),
              when(col("event_type") === "error", lit(null).cast("double"))
                .otherwise(col("value")).as("v")),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("v"), "v_filled")
        .drop("ts")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type, v,
                   last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS v_filled
            FROM (SELECT event_id, user_id, event_type, ts,
                         CASE WHEN event_type = 'error' THEN NULL
                              ELSE value END AS v
                  FROM events WHERE user_id < 100)
            ORDER BY event_id"""))


  /** Time-interval RANGE frame (round-9) — the rolling-window-by-TIME
    * semantics ROWS frames cannot express: per event, the count and
    * exact-decimal sum of the SAME USER's events in the trailing hour
    * (RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW — value-
    * based boundaries, so a burst of 50 events and a quiet hour get the
    * same wall-clock lookback where ROWS 50 PRECEDING would not). Both
    * engines define the frame inclusively and include ORDER-BY peers, so
    * tied timestamps agree. Frame sums stay DECIMAL until finished.
    *
    * 100-TB shape: one per-user window — linear per key; the interval
    * frame is evaluated by frame-pointer advance, not re-scan. */
  val winTimeRangeFrame = Q(
    "win_time_range_frame",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .filter(col("user_id") < 100)
        .select(col("event_id"), col("user_id"), col("ts"),
          D.dec(col("value")).as("vdec"))
        .withColumn("n_1h", expr(
          """count(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""))
        .withColumn("sum_1h", expr(
          """CAST(CAST(sum(vdec) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             AS DECIMAL(18,2)) AS DOUBLE)"""))
        .select("event_id", "user_id", "n_1h", "sum_1h")
        .orderBy("event_id"),
    Some("""SELECT event_id, user_id,
                   count(*) OVER w AS n_1h,
                   CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w
                        AS DECIMAL(18,2)) AS DOUBLE) AS sum_1h
            FROM events WHERE user_id < 100
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""))

  private def rankWindow = Window
    .partitionBy("o_custkey")
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  /** row_number / rank / dense_rank per customer by price desc. */
  val winRank = Q(
    "win_rank",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(rankWindow).cast("bigint"))
        .withColumn("rk", rank().over(rankWindow).cast("bigint"))
        .withColumn("drk", dense_rank().over(rankWindow).cast("bigint"))
        .orderBy("o_custkey", "rn"),
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
            row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
            ORDER BY o_custkey, rn"""))

  /** Top-3 orders per customer (rank-and-filter pattern). */
  val winTopkGroup = Q(
    "win_topk_group",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(rankWindow).cast("bigint"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn"),
    Some("""SELECT * FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders) WHERE rn <= 3
            ORDER BY o_custkey, rn"""))

  /** Running revenue per customer over order date (ROWS frame, decimal). */
  val winRunning = Q(
    "win_running",
    (spark, sfDir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          D.dbl(sum(D.dec(col("o_totalprice"))).over(w).cast(D.Money)).as("running_rev"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
            CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DECIMAL(18,2)) AS DOUBLE) AS running_rev
            FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** 30-day trailing revenue per customer: a value-RANGE frame over integer
    * days-since-epoch — identical semantics to an interval RANGE frame on
    * the (midnight-aligned) timestamps, expressible in both engines. */
  val winRangeFrame = Q(
    "win_range_frame",
    (spark, sfDir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("d_days"))
        .rangeBetween(-30, 0)
      Tables.orders(spark, sfDir)
        .withColumn("d_days",
          datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          D.dbl(sum(D.dec(col("o_totalprice"))).over(w).cast(D.Money)).as("trail30"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
            CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 OVER (PARTITION BY o_custkey
                       ORDER BY datediff('day', DATE '1970-01-01', o_orderdate::DATE)
                       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                 AS DECIMAL(18,2)) AS DOUBLE) AS trail30
            FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** lag/lead per user over event time — null edges at partition bounds. */
  val winLeadLag = Q(
    "win_lead_lag",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("ts"),
          (col("value") - lag(col("value"), 1).over(w)).as("dv"),
          lead(col("ts"), 1).over(w).as("next_ts"))
        .orderBy("user_id", "ts", "event_id")
    },
    Some("""SELECT user_id, event_id, ts,
            value - lag(value) OVER w AS dv,
            lead(ts) OVER w AS next_ts
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY user_id, ts, event_id"""))

  /** ntile / percent_rank / cume_dist per order priority. */
  val winNtilePct = Q(
    "win_ntile_pct",
    (spark, sfDir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
            ntile(4) OVER w AS quartile,
            round(percent_rank() OVER w, 6) AS pr,
            round(cume_dist() OVER w, 6) AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderpriority, o_totalprice, o_orderkey"""))

  /** first_value / last_value / nth_value over the full partition frame —
    * one summary row per customer. */
  val winFirstLast = Q(
    "win_first_last",
    (spark, sfDir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(spark, sfDir)
        .select(col("o_custkey"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(w).as("last_ok"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
        .distinct()
        .orderBy("o_custkey")
    },
    Some("""SELECT DISTINCT o_custkey,
            first_value(o_orderkey) OVER w AS first_ok,
            last_value(o_orderkey) OVER w AS last_ok,
            nth_value(o_orderkey, 2) OVER w AS second_ok
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_custkey"""))

  /** percent_rank / cume_dist over a unique composite order — the ranks
    * are ratios of exact integers, so the doubles are bit-identical in
    * any engine (no peers exist under the unique (price, key) order). */
  val winCumeDist = Q(
    "win_cume_dist",
    (spark, sfDir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
            percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderpriority, o_totalprice, o_orderkey"""))

  /** Ratio-to-report: each customer's share of their segment's total
    * balance. The partition total is an EXACT DECIMAL window sum
    * (order-independent — a double window sum would depend on intra-
    * partition evaluation order, which engines don't pin); the share then
    * divides the two finished doubles, IEEE-identical on both engines.
    * Unpartitioned in neither engine: the window is keyed on segment. */
  val winRatioToReport = Q(
    "win_ratio_to_report",
    (spark, sfDir) => {
      val w = Window.partitionBy("c_mktsegment")
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"),
          D.dbl(D.dec(col("c_acctbal"))).as("bal"),
          D.dbl(sum(D.dec(col("c_acctbal"))).over(w).cast(D.Money))
            .as("seg_total"))
        .withColumn("share", col("bal") / col("seg_total"))
        .orderBy("c_custkey")
    },
    Some(s"""SELECT c_custkey, c_mktsegment, bal, seg_total,
                    bal / seg_total AS share
            FROM (SELECT c_custkey, c_mktsegment,
                         ${D.oDbl(D.oDec("c_acctbal"))} AS bal,
                         ${D.oDbl(s"CAST(sum(${D.oDec("c_acctbal")}) OVER (PARTITION BY c_mktsegment) AS DECIMAL(18,2))")} AS seg_total
                  FROM customer)
            ORDER BY c_custkey"""))

  /** Running COUNT(DISTINCT) per user — a frame neither engine's window
    * aggregates support directly. Decomposition: mark each (user, type)'s
    * first occurrence with a row_number()=1 flag, then running-sum the
    * flags. Two partitioned windows on user-keyed data, no collect_set
    * state — the marker trick keeps memory O(1) per row where a naive
    * set-per-frame would hold every distinct value seen. */
  val winRunningDistinct = Q(
    "win_running_distinct",
    (spark, sfDir) =>
      graft.ops.Ops.runningDistinct(Tables.events(spark, sfDir),
          col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
          col("n_distinct").as("n_distinct_types"))
        .orderBy("user_id", "ts", "event_id"),
    Some("""WITH m AS (
              SELECT event_id, user_id, ts, event_type,
                     CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                                  ORDER BY ts, event_id) = 1
                          THEN 1 ELSE 0 END AS first_seen
              FROM events)
            SELECT event_id, user_id, ts, event_type,
                   CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS n_distinct_types
            FROM m ORDER BY user_id, ts, event_id"""))

  /** Rolling 5-row median per user — the robust smoother (rolling mean is
    * ts_moving_zscore's domain; median shrugs off single spikes). EXACT
    * interpolated percentile over the frame on both engines; boundary
    * frames (n < 5) interpolate identically, and round(4) absorbs any
    * last-ulp interpolation-formula difference. */
  val winRollingMedian = Q(
    "win_rolling_median",
    (spark, sfDir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
      graft.util.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"),
          round(expr("percentile(value, 0.5)").over(w), 4).as("med5"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, value,
                   round(quantile_cont(value, 0.5)
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS med5
            FROM events ORDER BY event_id"""))

  /** Longest same-type streak per user — gaps-and-islands by VALUE change
    * (ts_session islands by time gap; this islands by consecutive equal
    * values): island id = rn − rn_within_type, both row_numbers sharing
    * the user-keyed (ts, event_id) total order; streak_type breaks max
    * ties by type name (min) so the answer is total. */
  val winStreaks = Q(
    "win_streaks",
    (spark, sfDir) => {
      val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wTyp = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      val isl = graft.util.Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_type"),
          (row_number().over(wAll) - row_number().over(wTyp)).as("island"))
        .groupBy("user_id", "event_type", "island")
        .agg(count(lit(1)).as("len"))
      isl.withColumn("ml",
          max("len").over(Window.partitionBy("user_id")))
        .groupBy("user_id")
        .agg(max("len").cast("bigint").as("longest_streak"),
          min(when(col("len") === col("ml"), col("event_type")))
            .as("streak_type"))
        .orderBy("user_id")
    },
    Some("""WITH o AS (
              SELECT user_id, event_type, ts, event_id,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn,
                     row_number() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rnt
              FROM events),
            isl AS (
              SELECT user_id, event_type, rn - rnt AS island, count(*) AS len
              FROM o GROUP BY user_id, event_type, island)
            SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
                   min(CASE WHEN len = ml THEN event_type END) AS streak_type
            FROM (SELECT *, max(len) OVER (PARTITION BY user_id) AS ml FROM isl)
            GROUP BY user_id ORDER BY user_id"""))

  def qs: Seq[Q] = Seq(winRank, winTopkGroup, winRunning, winRangeFrame,
    winLeadLag, winNtilePct, winFirstLast, winCumeDist, winRatioToReport,
    winRunningDistinct, winRollingMedian, winStreaks, winForwardFill,
    winTimeRangeFrame)
}
