package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.{D, Tables}

/** All join shapes (SURVEY §2.3).
  *
  * 100-TB notes: fact-to-fact joins (lineitem⋈orders) shuffle on the join
  * key and scale horizontally; dimension joins (nation/region, and the
  * pre-aggregated sides below) carry explicit `broadcast` hints so the plan
  * is broadcast-hash regardless of statistics. The theta/cross joins are
  * bounded by construction (supplier ≤1000 rows, region×nation = 125).
  * Self-joins rename columns instead of relying on dataset-apply refs —
  * unambiguous and immune to DetectAmbiguousSelfJoin false positives.
  */
object Joins {

  /** orders ⋈ customer, revenue per market segment. */
  val joinInnerEqui = Q(
    "join_inner_equi",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), D.sumDec(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment"),
    Some(s"""SELECT c_mktsegment, count(*) AS n_orders,
            ${D.oSumDec("o_totalprice")} AS sum_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** 5-way star join: lineitem⋈orders⋈customer⋈nation⋈region; revenue per
    * (region, nation). nation/region are broadcast (tiny at every sf).
    * Lineitem revenue is pre-aggregated per orderkey BEFORE the join —
    * partial-aggregation pushdown Catalyst doesn't do on its own: the
    * fact-fact shuffle carries one row per order instead of one per line
    * (4× less at TPC-H shape), and decimal sums are associative so the
    * regrouped result is exactly identical. */
  val joinBcastChain = Q(
    "join_bcast_chain",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey")
        .agg(
          sum(D.net(col("l_extendedprice"), col("l_discount"))).as("rev_o"),
          count(lit(1)).as("n_items_o"))
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, sfDir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          // scale-2 narrowing before the double cast — see D.sumDec4
          D.dbl(sum(col("rev_o")).cast(D.Money)).as("revenue"),
          sum(col("n_items_o")).as("n_items"))
        .orderBy("r_name", "n_name"),
    Some(s"""SELECT r_name, n_name,
            ${D.oDbl(s"CAST(round(sum(${D.oNet("l_extendedprice", "l_discount")}), 2) AS DECIMAL(18,2))")} AS revenue,
            count(*) AS n_items
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Every customer with its order count — zero-order customers kept. */
  val joinLeftOuter = Q(
    "join_left_outer",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name ORDER BY c_custkey"""))

  /** Mirror of the above through a right outer join. */
  val joinRightOuter = Q(
    "join_right_outer",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey", "c_name")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
            FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name ORDER BY c_custkey"""))

  /** Full outer over pre-aggregated per-nation counts; the side filters
    * guarantee null-extended rows on both sides at every sf. Pre-aggregating
    * before the outer join keeps the join input bounded (≤25 rows/side)
    * regardless of fact-table size — the 100-TB-safe formulation. */
  val joinFullOuter = Q(
    "join_full_outer",
    (spark, sfDir) => {
      val s = Tables.supplier(spark, sfDir).filter(col("s_nationkey") < 15)
        .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
      val c = Tables.customer(spark, sfDir).filter(col("c_nationkey") >= 10)
        .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
      s.join(c, col("sk") === col("ck"), "full")
        .select(coalesce(col("sk"), col("ck")).as("nationkey"), col("n_supp"), col("n_cust"))
        .orderBy("nationkey")
    },
    Some("""SELECT coalesce(s.sk, c.ck) AS nationkey, n_supp, n_cust
            FROM (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier
                  WHERE s_nationkey < 15 GROUP BY s_nationkey) s
            FULL JOIN (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer
                  WHERE c_nationkey >= 10 GROUP BY c_nationkey) c
            ON s.sk = c.ck ORDER BY nationkey"""))

  /** Customers having at least one 'F'-status order (left semi). */
  val joinSemi = Q(
    "join_semi",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .join(
          Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
            ORDER BY c_custkey"""))

  /** Customers with no order above 300k (left anti; every customer has
    * *some* order in the fixtures, so the anti side must be filtered). */
  val joinAnti = Q(
    "join_anti",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .join(
          Tables.orders(spark, sfDir).filter(col("o_totalprice") > 300000.0),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
            ORDER BY c_custkey"""))

  /** region × nation cartesian (5 × 25 — bounded dimension tables only). */
  val joinCross = Q(
    "join_cross",
    (spark, sfDir) =>
      Tables.region(spark, sfDir).select("r_name")
        .crossJoin(Tables.nation(spark, sfDir).select("n_name"))
        .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
            ORDER BY r_name, n_name"""))

  /** Non-equi (theta) self-join: supplier pairs ordered by account balance.
    * BroadcastNestedLoopJoin with an O(n²) OUTPUT — never run a theta join
    * on a fact table. The s_suppkey < 1000 cap makes the boundedness an
    * explicit property of the QUERY rather than an assumption about the
    * fixture: at the driver SFs supplier is ≤1000 rows so the cap keeps
    * every row (outputs unchanged), while the r5 sf5 rehearsal (50k
    * suppliers) measured the uncapped form at 23× the sf1 time for 5×
    * the data — the quadratic demonstrating exactly why the domain cap
    * is part of the operator's contract. */
  val joinTheta = Q(
    "join_theta",
    (spark, sfDir) => {
      val s = Tables.supplier(spark, sfDir).filter(col("s_suppkey") < 1000)
      val a = s.select(col("s_suppkey").as("k1"), col("s_acctbal").as("bal1"))
      val b = s.select(col("s_suppkey").as("k2"), col("s_acctbal").as("bal2"))
      a.join(b, col("bal1") < col("bal2"))
        .select(col("k1"), col("k2"),
          D.dbl((D.dec(col("bal2")) - D.dec(col("bal1"))).cast(D.Money)).as("bal_gap"))
        .orderBy("k1", "k2")
    },
    Some("""SELECT a.s_suppkey AS k1, b.s_suppkey AS k2,
            CAST(CAST(CAST(b.s_acctbal AS DECIMAL(18,2)) - CAST(a.s_acctbal AS DECIMAL(18,2)) AS DECIMAL(18,2)) AS DOUBLE) AS bal_gap
            FROM (SELECT * FROM supplier WHERE s_suppkey < 1000) a
            JOIN (SELECT * FROM supplier WHERE s_suppkey < 1000) b
            ON a.s_acctbal < b.s_acctbal
            ORDER BY k1, k2"""))

  /** Equi + range self-join on events: pairs of same-user events within
    * one hour, counted per user. The equi conjunct (user_id) drives the
    * shuffle partitioning; the range conjunct is a post-join filter —
    * per-user event density bounds the blowup. */
  val joinRange = Q(
    "join_range",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      val a = ev.select(col("user_id"), col("ts").as("ts_a"))
      val b = ev.select(col("user_id").as("user_b"), col("ts").as("ts_b"))
      a.join(b,
          col("user_id") === col("user_b") &&
          col("ts_b") > col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 1 HOUR"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("user_id")
    },
    Some("""SELECT a.user_id, count(*) AS n_pairs
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND b.ts > a.ts
             AND b.ts <= a.ts + INTERVAL 1 HOUR
            GROUP BY a.user_id ORDER BY a.user_id"""))

  /** As-of join: for each event, the most recent signup (inclusive) of the
    * same user. Spark has no native asof join — the union/window
    * formulation sorts signups before events at equal ts (tag 0 < 1), so
    * `last(sts ignore nulls)` over rows-unbounded-preceding reproduces
    * DuckDB's `ASOF ... ON a.ts >= b.ts` inclusive boundary exactly.
    * O(n log n) via one shuffle+sort per user partition — scales like any
    * window; signups are deduped on (user, ts) so ties cannot flip. */
  /** Core as-of formulation, factored out so the =ts boundary is unit-
    * testable on in-memory frames (SemanticsSpec). */
  def asofLastSignup(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = ev.select(col("event_id"), col("user_id"), col("ts"),
      lit(1).as("tag"), lit(null).cast("timestamp_ntz").as("sts"))
    val signup = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts")).distinct()
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
        lit(0).as("tag"), col("ts").as("sts"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.unionByName(signup)
      .withColumn("last_signup_ts", last(col("sts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("event_id", "user_id", "ts", "last_signup_ts")
  }

  val joinAsof = Q(
    "join_asof",
    (spark, sfDir) => asofLastSignup(Tables.events(spark, sfDir)).orderBy("event_id"),
    Some("""SELECT a.event_id, a.user_id, a.ts, b.ts AS last_signup_ts
            FROM events a ASOF LEFT JOIN
              (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup') b
              ON a.user_id = b.user_id AND a.ts >= b.ts
            ORDER BY a.event_id"""))

  /** Forward as-of: the NEXT signup at or after each event — the mirror of
    * asofLastSignup with a descending window, so the same union trick gives
    * the inclusive boundary (an event at exactly a signup's ts matches it:
    * tag sorts the signup row first at equal ts in the descending order). */
  def asofNextSignup(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = ev.select(col("event_id"), col("user_id"), col("ts"),
      lit(1).as("tag"), lit(null).cast("timestamp_ntz").as("sts"))
    val signup = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts")).distinct()
      .select(lit(null).cast("long").as("event_id"), col("user_id"), col("ts"),
        lit(0).as("tag"), col("ts").as("sts"))
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.unionByName(signup)
      .withColumn("next_signup_ts", last(col("sts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("event_id", "user_id", "ts", "next_signup_ts")
  }

  val joinAsofForward = Q(
    "join_asof_forward",
    (spark, sfDir) => asofNextSignup(Tables.events(spark, sfDir)).orderBy("event_id"),
    Some("""SELECT a.event_id, a.user_id, a.ts, b.ts AS next_signup_ts
            FROM events a ASOF LEFT JOIN
              (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup') b
              ON a.user_id = b.user_id AND a.ts <= b.ts
            ORDER BY a.event_id"""))

  /** Tolerance as-of (round-8 addition; pandas `merge_asof(tolerance=)` /
    * kdb `wj` semantics): the most recent signup at or before each event,
    * but only when it falls within the tolerance window (1 day) — older
    * matches become NULL, exactly how a feature pipeline refuses stale
    * joins. Reuses the asofLastSignup single-sort window formulation; the
    * tolerance is a pure timestamp comparison applied AFTER the as-of
    * resolution (`ts <= signup + INTERVAL`, exact at µs — no epoch
    * truncation), so the plan cost is identical to join_asof: one
    * per-user shuffle+sort, no extra join. */
  val joinAsofTolerance = Q(
    "join_asof_tolerance",
    (spark, sfDir) =>
      asofLastSignup(Tables.events(spark, sfDir))
        .withColumn("signup_within_1d",
          when(col("last_signup_ts").isNotNull &&
            col("ts") <= col("last_signup_ts") + expr("INTERVAL 1 DAY"),
            col("last_signup_ts")))
        .select("event_id", "user_id", "ts", "signup_within_1d")
        .orderBy("event_id"),
    Some("""SELECT a.event_id, a.user_id, a.ts,
                   CASE WHEN b.ts IS NOT NULL
                         AND a.ts <= b.ts + INTERVAL 1 DAY
                        THEN b.ts END AS signup_within_1d
            FROM events a ASOF LEFT JOIN
              (SELECT DISTINCT user_id, ts FROM events
               WHERE event_type = 'signup') b
              ON a.user_id = b.user_id AND a.ts >= b.ts
            ORDER BY a.event_id"""))

  /** Nearest as-of: the signup closest in time to each event, either
    * direction, inclusive both ways, ties (equidistant) to the earlier one.
    *
    * ONE shuffle+sort serves both directions: each signup enters the union
    * TWICE — tag 0 (before events at equal ts, feeding the backward
    * `last(ignore nulls)` over unbounded-preceding) and tag 2 (after
    * events at equal ts, feeding the forward `first(ignore nulls)` over
    * unbounded-following). Both windows share partitioning (user_id) and
    * sort key (ts, tag), so Catalyst evaluates them in a single WindowExec
    * over a single sort — vs the naive join of joinAsof + joinAsofForward
    * outputs, which costs two sorts plus an equi-join shuffle.
    *
    * 100-TB notes: identical scaling to any per-user window — one shuffle
    * keyed on user_id; the signup duplication is ×2 on the (small) signup
    * subset only. */
  val joinAsofNearest = Q(
    "join_asof_nearest",
    (spark, sfDir) => {
      val ev = Tables.events(spark, sfDir)
      graft.ops.Ops.asofNearest(
          ev.select("event_id", "user_id", "ts"), col("user_id"), col("ts"),
          ev.filter(col("event_type") === "signup"), col("user_id"), col("ts"))
        .withColumnRenamed("nearest_ts", "nearest_signup_ts")
        .orderBy("event_id")
    },
    Some("""SELECT e.event_id, e.user_id, e.ts,
                   CASE WHEN b.ts IS NULL THEN f.ts
                        WHEN f.ts IS NULL THEN b.ts
                        WHEN epoch_us(e.ts) - epoch_us(b.ts)
                             <= epoch_us(f.ts) - epoch_us(e.ts)
                          THEN b.ts
                        ELSE f.ts END AS nearest_signup_ts
            FROM events e
            ASOF LEFT JOIN (SELECT DISTINCT user_id, ts FROM events
                            WHERE event_type = 'signup') b
              ON e.user_id = b.user_id AND e.ts >= b.ts
            ASOF LEFT JOIN (SELECT DISTINCT user_id, ts FROM events
                            WHERE event_type = 'signup') f
              ON e.user_id = f.user_id AND e.ts <= f.ts
            ORDER BY e.event_id"""))

  /** Skew-salted equi-join: the standard defense when one join key owns a
    * disproportionate share of the probe side (AQE's skew-join split only
    * fires on partition-size thresholds; salting works unconditionally).
    * Build side (orders) replicates ×SALT with salt values 0..SALT-1;
    * probe side (lineitem) gets a deterministic salt from
    * xxhash64(orderkey, linenum), so each probe row meets exactly ONE
    * replica and a hot key's rows spread over SALT shuffle partitions
    * instead of one straggler task. The result is provably identical to
    * the plain join (the oracle runs the unsalted SQL) — only the
    * partitioning changes. SALT trades replication cost for spread: pick
    * ~(hot-key share × partition count); 4 demonstrates the technique at
    * half the ×8 replication cost (r5 — the query IS the suite's most
    * expensive, and the cost is pure build-side inflation). */
  val joinSkewSalted = Q(
    "join_skew_salted",
    (spark, sfDir) => {
      val SALT = 4
      val salted = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          explode(expr(s"sequence(0, ${SALT - 1})")).as("salt"))
      val line = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_extendedprice"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(SALT))
            .cast("int").as("lsalt"))
      line.join(salted,
          col("l_orderkey") === col("o_orderkey") && col("lsalt") === col("salt"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          // fact-scaling row count through the sum → primitive cents
          // path (bit-identical to sumDec per its scaladoc) — round 18
          graft.util.D.sumCents(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some(s"""SELECT o.o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n_items,
                   ${graft.util.D.oSumDec("l.l_extendedprice")} AS revenue
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority"""))

  /** Five-table star join (region→nation→customer→orders→lineitem) with a
    * date filter and exact-decimal revenue rollup — the canonical
    * dimensional query shape. The two true dimensions (region, nation)
    * are broadcast; customer⇄orders⇄lineitem are fact-sized and shuffle
    * on their keys (AQE re-plans if a side turns out broadcastable). The
    * o_orderdate filter pushes to the orders scan. */
  val joinStarFlagship = Q(
    "join_star_flagship",
    (spark, sfDir) => {
      import graft.util.D
      Tables.region(spark, sfDir)
        .join(broadcast(Tables.nation(spark, sfDir)),
          col("n_regionkey") === col("r_regionkey"))
        .join(Tables.customer(spark, sfDir),
          col("c_nationkey") === col("n_nationkey"))
        .join(Tables.orders(spark, sfDir)
            .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          D.sumDec4(D.net(col("l_extendedprice"), col("l_discount")))
            .as("revenue"))
        .orderBy("r_name", "n_name")
    },
    Some(s"""SELECT r.r_name, n.n_name,
                   CAST(count(*) AS BIGINT) AS n_items,
                   ${graft.util.D.oDbl(
                     s"CAST(round(sum(${graft.util.D.oNet("l.l_extendedprice", "l.l_discount")}), 2) AS DECIMAL(18,2))")} AS revenue
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN customer c ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            GROUP BY r.r_name, n.n_name
            ORDER BY r.r_name, n.n_name"""))

  /** Binned (bucketed) range join — the scale-out rewrite of a pure
    * range predicate with NO equi key: 30 daily maintenance windows
    * [day, day+6h) against the events stream. The naive plan is a
    * nested-loop over every (event, window) pair; the binned plan derives
    * bin = date_trunc(day, ts) on the fact side and bin = window start on
    * the window side, turning the range join into an EQUI-join on the bin
    * plus a residual `ts < start + 6h` filter — a hash join that
    * partitions on the bin key at any scale. Exact here because windows
    * never cross a day boundary; multi-bin spans generalize by exploding
    * each window into every bin it covers (the standard interval-binning
    * trick). The oracle runs the NAIVE range join — value parity proves
    * the rewrite. 2-dp values sum in exact decimal (D.sumDec). */
  val joinRangeBucketed = Q(
    "join_range_bucketed",
    (spark, sfDir) => {
      import graft.util.D
      val win = spark.range(0, 30).select(col("id").as("win_id"),
        expr("timestampadd(DAY, CAST(id AS INT), " +
          "TIMESTAMP_NTZ '2024-01-01 00:00:00')").as("win_start"))
      val ev = Tables.events(spark, sfDir)
        .select(col("ts"), col("value"),
          date_trunc("DAY", col("ts")).cast("timestamp_ntz").as("bin"))
      ev.join(broadcast(win), col("bin") === col("win_start") &&
          col("ts") < col("win_start") + expr("INTERVAL 6 HOUR"))
        .groupBy("win_id", "win_start")
        .agg(count(lit(1)).as("n_events"),
          D.sumDec(col("value")).as("sum_value"))
        .orderBy("win_id")
    },
    Some(s"""WITH win AS (
              SELECT d AS win_id,
                     TIMESTAMP '2024-01-01 00:00:00' + d * INTERVAL 1 DAY AS win_start
              FROM (SELECT unnest(generate_series(0, 29)) AS d))
            SELECT w.win_id, w.win_start,
                   count(*) AS n_events,
                   ${graft.util.D.oSumDec("e.value")} AS sum_value
            FROM win w JOIN events e
              ON e.ts >= w.win_start AND e.ts < w.win_start + INTERVAL 6 HOUR
            GROUP BY w.win_id, w.win_start
            ORDER BY w.win_id"""))

  /** Two-sided interval-overlap join (round-9) — per-user DAILY activity
    * intervals [min ts, max ts] that day, paired within the same day when
    * they overlap (closed intervals: s1 <= e2 AND s2 <= e1). The interval
    * semantics join_range/join_asof don't cover: BOTH sides are ranges.
    *
    * 100-TB shape: the bin key (day) turns an unbounded interval join
    * into an EQUI-join + cheap post-filter — the same binning that makes
    * join_range_bucketed scale; intervals here never cross a bin by
    * construction (daily activity within the day). For intervals that DO
    * span bins, production replicates each interval into every bin it
    * touches (bounded by span/bin-width) — documented, not needed here.
    * Overlap duration is exact integer microseconds. user_id < 30 caps
    * the graded output only. */
  val joinIntervalOverlap = Q(
    "join_interval_overlap",
    (spark, sfDir) => {
      val iv = Tables.events(spark, sfDir)
        .filter(col("user_id") < 30)
        // day stays timestamp_ntz: the driver's two read paths stringify
        // DATE differently (pandas date vs datetime64) — timestamps match
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      val a = iv.select(col("day"), col("user_id").as("u1"),
        col("s").as("s1"), col("e").as("e1"))
      val b = iv.select(col("day").as("day2"), col("user_id").as("u2"),
        col("s").as("s2"), col("e").as("e2"))
      a.join(b, col("day") === col("day2")
          && col("u1") < col("u2")
          && col("s1") <= col("e2") && col("s2") <= col("e1"))
        .select(col("day"), col("u1"), col("u2"),
          // ntz → instant cast is linear under the UTC session default
          (unix_micros(least(col("e1"), col("e2")).cast("timestamp"))
            - unix_micros(greatest(col("s1"), col("s2")).cast("timestamp")))
            .as("overlap_us"))
        .orderBy("day", "u1", "u2")
    },
    Some("""WITH iv AS (SELECT user_id,
                               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                               min(ts) AS s, max(ts) AS e
                        FROM events WHERE user_id < 30
                        GROUP BY user_id, day)
            SELECT a.day, a.user_id AS u1, b.user_id AS u2,
                   epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s))
                     AS overlap_us
            FROM iv a JOIN iv b
              ON a.day = b.day AND a.user_id < b.user_id
             AND a.s <= b.e AND b.s <= a.e
            ORDER BY a.day, u1, u2"""))

  /** Null-safe equality join (round-9) — the `<=>` / IS NOT DISTINCT
    * FROM semantics a plain equi-join silently drops: NULL keys match
    * NULL keys (exactly one NULL bucket) instead of matching nothing.
    * The nullable key is derived (1-URGENT → NULL) so the fixture
    * genuinely exercises the NULL bucket; the dim side is the key's own
    * census, so every row finds exactly one match and the output proves
    * the NULL↔NULL hit with arithmetic (n_joined == n_dim for the NULL
    * row too — an equi-join would return zero).
    *
    * 100-TB note: <=> hashes NULL like any value — the join stays a
    * broadcast/shuffled HASH join (one NULL bucket; if the NULL share
    * is skewed, the salting recipe of join_skew_salted applies to it
    * like any hot key). */
  val joinNullSafeEq = Q(
    "join_null_safe_eq",
    (spark, sfDir) => {
      val keyed = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("pk"))
      val dim = keyed.groupBy(col("pk").as("dk"))
        .agg(count(lit(1)).as("n_dim"))
      keyed.join(broadcast(dim), col("pk") <=> col("dk"))
        .groupBy("pk")
        .agg(count(lit(1)).as("n_joined"),
          min(col("n_dim")).as("n_dim"))
        .orderBy(col("pk").asc_nulls_first)
    },
    Some("""WITH keyed AS (SELECT o_orderkey,
                                  nullif(o_orderpriority, '1-URGENT') AS pk
                           FROM orders),
                 dim AS (SELECT pk AS dk, count(*) AS n_dim
                         FROM keyed GROUP BY pk)
            SELECT pk, count(*) AS n_joined, min(n_dim) AS n_dim
            FROM keyed JOIN dim ON pk IS NOT DISTINCT FROM dk
            GROUP BY pk ORDER BY pk ASC NULLS FIRST"""))

  /** Bloom-prefiltered semi-join (round-9) — the runtime-filter pattern
    * Spark's own optimizer injects (InjectRuntimeFilter), demonstrated
    * explicitly: build a Bloom filter over the small side's keys
    * (1996 orders), prefilter the FACT SCAN with might_contain — rows
    * that cannot match never reach the shuffle — then the exact
    * semi-join removes the false positives. Because Bloom filters have
    * NO false negatives, prefilter + exact ≡ exact: the oracle is the
    * plain semi-join, so the sketch is graded hash-exactly (the
    * agg_approx_topk trick applied to joins). At 100 TB this is THE
    * join-reduction shape: the bloom is a broadcast of ~100 KB where
    * the key set itself might be GBs. */
  val joinBloomPrefilter = Q(
    "join_bloom_prefilter",
    (spark, sfDir) => {
      graft.functions.BloomFns.register(spark)
      val keys = Tables.orders(spark, sfDir)
        .filter(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"))
      // BloomFilterMightContain requires a CONSTANT bloom (the analyzer
      // rejects a joined column) — so the built filter is fetched to the
      // driver ONCE per (session, sfDir) and inlined as a literal, the
      // same single-driver-fetch-at-index-build the ANN tier documents;
      // the per-row scan path stays fully distributed.
      val bfBytes = graft.util.Memo(spark,
        s"$sfDir:bloom_orders_1996:${Tables.tableKey(sfDir, "orders")}") {
        keys.agg(
          expr("graft_bloom_agg(xxhash64(o_orderkey), 100000L, 800000L)")
            .as("bf")).head().getAs[Array[Byte]](0)
      }
      val pre = Tables.lineitem(spark, sfDir)
        .filter(call_function("graft_might_contain",
          lit(bfBytes), xxhash64(col("l_orderkey"))))
      pre.join(keys, pre("l_orderkey") === keys("o_orderkey"), "semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          // fact-scaling row count through the sum → primitive cents
          // path (bit-identical to sumDec per its scaladoc) — round 18
          D.sumCents(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, count(*) AS n,
                   ${D.oSumDec("l_extendedprice")} AS sum_price
            FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                                 WHERE EXTRACT(year FROM o_orderdate) = 1996)
            GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Cross-modal lake join (round-10) — the text⋈embedding enrich every
    * multimodal training lake runs (documents and their vectors live in
    * SEPARATE tables keyed by id; analysis needs both): per language,
    * doc count, mean char length, and mean embedding L2 norm. The norm
    * is leaf-quantized to exact micro-units BEFORE the aggregation (the
    * text-tier recipe: per-row round(norm·1e6) as BIGINT, integer sum,
    * one final double division) so the corpus-order-dependent double sum
    * never happens; the per-row norm itself is the V.norm fold both
    * engines spell identically.
    *
    * 100-TB shape: id-keyed equi-join between two fact tables (shuffle
    * on the shared key — or free with co-bucketed storage, the
    * sink_bucketed_join pattern), then a small hash agg. */
  val joinTextEmbedding = Q(
    "join_text_embedding",
    (spark, sfDir) => {
      import graft.util.V.{dbl, norm}
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          round(norm(dbl(col("embedding"))) * 1e6, 0).cast("bigint")
            .as("nrm_micro"))
      Tables.documents(spark, sfDir)
        .join(emb, col("doc_id") === col("vec_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("nrm_micro")).as("sum_nrm"))
        .select(col("lang"), col("n"),
          (col("sum_chars").cast("double") / col("n").cast("double"))
            .as("mean_chars"),
          (col("sum_nrm").cast("double") / col("n").cast("double") / 1e6)
            .as("mean_norm"))
        .orderBy("lang")
    },
    Some("""WITH e AS (SELECT vec_id,
                              CAST(round(sqrt(list_aggregate(
                                  list_transform(embedding::DOUBLE[],
                                    x -> x*x), 'sum')) * 1e6, 0) AS BIGINT)
                                AS nrm_micro
                       FROM embeddings)
            SELECT lang, count(*) AS n,
                   CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars,
                   CAST(sum(nrm_micro) AS DOUBLE) / count(*) / 1e6
                     AS mean_norm
            FROM documents d JOIN e ON d.doc_id = e.vec_id
            GROUP BY lang ORDER BY lang"""))

  def qs: Seq[Q] = Seq(joinInnerEqui, joinBcastChain, joinLeftOuter,
    joinRightOuter, joinFullOuter, joinSemi, joinAnti, joinCross, joinTheta,
    joinRange, joinRangeBucketed, joinAsof, joinAsofForward, joinAsofNearest,
    joinAsofTolerance, joinSkewSalted, joinStarFlagship, joinIntervalOverlap,
    joinNullSafeEq, joinBloomPrefilter, joinTextEmbedding)
}
