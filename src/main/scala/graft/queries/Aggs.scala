package graft.queries

import org.apache.spark.sql.functions._
import graft.util.{D, Tables}

/** Aggregations (SURVEY §2.4).
  *
  * 100-TB notes: every groupBy here compiles to partial (map-side) +
  * final HashAggregate — the shuffle carries pre-combined partials, not
  * rows. Decimal sums make results independent of partition count/order.
  * ROLLUP/CUBE/GROUPING SETS expand before the partial agg (Expand node);
  * group-key cardinality stays tiny, so the shuffle is negligible at any
  * scale.
  */
object Aggs {

  /** TPC-H-Q1-shaped pricing summary — the flagship (SparkEntry.entry). */
  val aggQ1Pricing = Q(
    "agg_q1_pricing",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          D.sumDec(col("l_quantity")).as("sum_qty"),
          D.sumDec(col("l_extendedprice")).as("sum_base_price"),
          D.sumDec4(D.net(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
          D.sumDec6(D.charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
            ${D.oSumDec("l_quantity")} AS sum_qty,
            ${D.oSumDec("l_extendedprice")} AS sum_base_price,
            ${D.oDbl(s"CAST(round(sum(${D.oNet("l_extendedprice", "l_discount")}), 2) AS DECIMAL(18,2))")} AS sum_disc_price,
            ${D.oDbl(s"CAST(round(sum(${D.oCharge("l_extendedprice", "l_discount", "l_tax")}), 2) AS DECIMAL(18,2))")} AS sum_charge,
            round(avg(l_quantity), 4) AS avg_qty,
            round(avg(l_extendedprice), 2) AS avg_price,
            round(avg(l_discount), 4) AS avg_disc,
            count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""))

  /** Distinct aggregates — Catalyst expands to a two-phase agg. */
  val aggDistinct = Q(
    "agg_distinct",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          D.dbl(sum_distinct(D.dec(col("l_quantity"))).cast(D.Money)).as("sum_distinct_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
            count(DISTINCT l_partkey) AS n_parts,
            CAST(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_distinct_qty,
            count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** min/max/avg/stddev per segment (rounding per determinism policy #3). */
  val aggStats = Q(
    "agg_stats",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .groupBy("c_mktsegment")
        .agg(
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          round(avg(col("c_acctbal")), 2).as("avg_bal"),
          round(stddev_samp(col("c_acctbal")), 2).as("stddev_bal"),
          count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment,
            min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
            round(avg(c_acctbal), 2) AS avg_bal,
            round(stddev_samp(c_acctbal), 2) AS stddev_bal,
            count(*) AS n_customers
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** ROLLUP subtotals; NULLS FIRST pinned in both engines (SURVEY §2.4). */
  val aggRollup = Q(
    "agg_rollup",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      // ROLLUP expressed as its grouping-sets expansion ((a,b),(a),()):
      // Dataset.rollup after a join trips Spark 4.1's
      // DetectAmbiguousSelfJoin false-positive on the Expand node
      // (round-1 verdict #3; reproduced even with aliased projections),
      // while the groupingSets API resolves cleanly and is semantically
      // identical. Same partial+final hash-agg physical plan.
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select("n_name", "c_mktsegment", "c_acctbal")
        .groupingSets(
          Seq(Seq(col("n_name"), col("c_mktsegment")), Seq(col("n_name")), Seq.empty),
          col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          D.sumDec(col("c_acctbal")).as("sum_bal"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    },
    Some("""SELECT n_name, c_mktsegment, count(*) AS n_customers,
            CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_bal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY ROLLUP (n_name, c_mktsegment)
            ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"""))

  val aggCube = Q(
    "agg_cube",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .cube("l_returnflag", "l_linestatus")
        // CUBE expands every fact row ×4, so the sum sees 4× the fact
        // row count: ride the primitive BIGINT-cents path (D.sumCents,
        // bit-identical to sumDec per its scaladoc; DECIMAL oracle
        // unchanged — parity proves equivalence). Round-18; measured
        // ~30% of the single-task scan stage's CPU at sf0.1.
        .agg(count(lit(1)).as("n_rows"),
          D.sumCents(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
            CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Explicit grouping sets + grouping() markers, via the Dataset API
    * (no shared temp-view state — round-1 advice). grouping() is TINYINT in
    * Spark vs BIGINT in DuckDB (round-1 verdict #5) — cast pins BIGINT. */
  val aggGroupingSets = Q(
    "agg_grouping_sets",
    (spark, sfDir) => {
      val c = Tables.customer(spark, sfDir)
      val n = Tables.nation(spark, sfDir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(n("n_name"), c("c_mktsegment"))
        .groupingSets(
          Seq(Seq(col("n_name")), Seq(col("c_mktsegment")), Seq.empty),
          col("n_name"), col("c_mktsegment"))
        .agg(
          grouping(col("n_name")).cast("bigint").as("g_nation"),
          grouping(col("c_mktsegment")).cast("bigint").as("g_seg"),
          count(lit(1)).as("n_customers"))
        .orderBy(asc_nulls_first("n_name"), asc_nulls_first("c_mktsegment"))
    },
    Some("""SELECT n_name, c_mktsegment,
            grouping(n_name) AS g_nation, grouping(c_mktsegment) AS g_seg,
            count(*) AS n_customers
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
            ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST"""))

  /** Pivot: order counts and decimal revenue per priority, one column set
    * per order status (explicit value list → deterministic schema). */
  val aggPivot = Q(
    "agg_pivot",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), D.sumDec(col("o_totalprice")).as("rev"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
            count(*) FILTER (o_orderstatus = 'F') AS F_n,
            CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DECIMAL(18,2)) AS DOUBLE) AS F_rev,
            count(*) FILTER (o_orderstatus = 'O') AS O_n,
            CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'O') AS DECIMAL(18,2)) AS DOUBLE) AS O_rev,
            count(*) FILTER (o_orderstatus = 'P') AS P_n,
            CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'P') AS DECIMAL(18,2)) AS DOUBLE) AS P_rev
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Unpivot (melt): wide per-part numeric columns → long (metric, value). */
  val aggUnpivot = Q(
    "agg_unpivot",
    (spark, sfDir) =>
      Tables.part(spark, sfDir)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("size"), col("retailprice")), "metric", "value")
        .orderBy("p_partkey", "metric"),
    Some("""SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
            UNION ALL
            SELECT p_partkey, 'retailprice', p_retailprice FROM part
            ORDER BY p_partkey, metric"""))

  /** Scalar subquery: orders below half the global average price
    * (uncorrelated ScalarSubquery surface, via the SQL facade). */
  val subScalar = Q(
    "sub_scalar",
    (spark, sfDir) => graft.Graft.sql(spark, sfDir,
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice < (SELECT avg(o_totalprice) FROM orders) / 2
         ORDER BY o_orderkey"""),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice < (SELECT avg(o_totalprice) FROM orders) / 2
            ORDER BY o_orderkey"""))

  /** Correlated scalar subquery (decorrelated by Catalyst into a join):
    * each customer's orders above 1.5x their own average. */
  val subCorrelated = Q(
    "sub_correlated",
    (spark, sfDir) => graft.Graft.sql(spark, sfDir,
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
         WHERE o.o_totalprice >
               (SELECT avg(i.o_totalprice) * 1.5 FROM orders i
                WHERE i.o_custkey = o.o_custkey)
         ORDER BY o.o_orderkey"""),
    Some("""SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
            WHERE o.o_totalprice >
                  (SELECT avg(i.o_totalprice) * 1.5 FROM orders i
                   WHERE i.o_custkey = o.o_custkey)
            ORDER BY o.o_orderkey"""))

  /** Ordered-set + covariance aggregates: interpolated percentiles
    * (Spark `percentile` ↔ DuckDB `quantile_cont`, same linear
    * interpolation) and corr/covar_samp, rounded per policy #3. */
  val aggPercentileCorr = Q(
    "agg_percentile_corr",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .groupBy("c_mktsegment")
        .agg(
          round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"),
          round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90_bal"),
          round(corr(col("c_acctbal"), col("c_custkey").cast("double")), 6)
            .as("corr_bal_key"),
          round(covar_samp(col("c_acctbal"), col("c_custkey").cast("double")), 2)
            .as("covar_bal_key"))
        .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment,
            round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
            round(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal,
            round(corr(c_acctbal, CAST(c_custkey AS DOUBLE)), 6) AS corr_bal_key,
            round(covar_samp(c_acctbal, CAST(c_custkey AS DOUBLE)), 2) AS covar_bal_key
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** min_by/max_by (arg-min aggregation). Ties on c_acctbal are broken by
    * a composite sortable-string ordering key — zero-padded offset balance
    * then zero-padded custkey — because neither engine's arg-min accepts a
    * struct ordering, and an ambiguous ordering would make the picked name
    * partition-order-dependent (non-deterministic at any scale). */
  val aggMinbyMaxby = Q(
    "agg_minby_maxby",
    (spark, sfDir) => {
      // +1e9 offsets negative balances so the fixed-width decimal string
      // stays non-negative (a '-' sign would sort before digits and break
      // lexicographic == numeric) for ANY plausible balance, not just the
      // fixture's ≥ -1000 range; width 16 fits 1e9 + 7-digit balances.
      val key = concat(
        format_string("%016.2f", col("c_acctbal") + lit(1.0e9)),
        lpad(col("c_custkey").cast("string"), 10, "0"))
      Tables.customer(spark, sfDir)
        .groupBy("c_mktsegment")
        .agg(
          min_by(col("c_name"), key).as("poorest"),
          max_by(col("c_name"), key).as("richest"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"),
          count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment,
            arg_min(c_name, printf('%016.2f', c_acctbal + 1000000000.0) || lpad(CAST(c_custkey AS VARCHAR), 10, '0')) AS poorest,
            arg_max(c_name, printf('%016.2f', c_acctbal + 1000000000.0) || lpad(CAST(c_custkey AS VARCHAR), 10, '0')) AS richest,
            min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
            count(*) AS n_customers
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Deterministic mode (most frequent value): neither engine's built-in
    * mode() pins tie order, so both sides spell out the same count →
    * row_number(count DESC, value ASC) → rn=1 formulation. */
  val aggMode = Q(
    "agg_mode",
    (spark, sfDir) => {
      val counted = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment")
        .orderBy(col("n").desc, col("o_orderpriority"))
      counted.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
          col("n"))
        .orderBy("c_mktsegment")
    },
    Some("""SELECT c_mktsegment, o_orderpriority AS mode_priority, n FROM (
              SELECT c_mktsegment, o_orderpriority, count(*) AS n,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY count(*) DESC, o_orderpriority) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment, o_orderpriority)
            WHERE rn = 1 ORDER BY c_mktsegment"""))

  /** collect_list / collect_set into deterministic (sorted) arrays — the
    * aggregation-to-nested surface. Unsorted collect order is partition-
    * dependent, so both sides sort inside the aggregate. The graded output
    * joins the sorted set into one scalar string: array columns crash the
    * driver's pandas row-sort (round-3 red row), and the repo's output-type
    * policy allows only double/bigint/string/timestamp/boolean. */
  val aggCollectSetList = Q(
    "agg_collect_set_list",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .groupBy("o_orderpriority")
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
            array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
              AS statuses,
            count(*) AS n
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Correlated LATERAL subquery with ORDER BY + LIMIT inside — per-nation
    * top-2 customers by balance (unique (balance, custkey) tiebreak).
    * Catalyst decorrelates this into a ranked window under the hood; the
    * surface matters because LATERAL is how SQL users express dependent
    * top-k without knowing window functions. */
  val subLateral = Q(
    "sub_lateral",
    (spark, sfDir) => graft.Graft.sql(spark, sfDir,
      """SELECT n.n_name, l.c_name, l.c_acctbal
         FROM nation n
         JOIN LATERAL (
           SELECT c_name, c_acctbal FROM customer
           WHERE c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
         ORDER BY n.n_name, l.c_acctbal DESC, l.c_name"""),
    Some("""SELECT n.n_name, l.c_name, l.c_acctbal
            FROM nation n, LATERAL (
              SELECT c_name, c_acctbal FROM customer
              WHERE c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
            ORDER BY n.n_name, l.c_acctbal DESC, l.c_name"""))

  /** NOT IN with a nullable subquery — the three-valued-logic trap both
    * engines implement per the SQL standard: one NULL in the IN-list makes
    * `x NOT IN (...)` UNKNOWN for every non-matching x, so the poisoned
    * count collapses to 0 while the null-free count is genuine. Graded as
    * one row holding both counts, so the output witnesses the semantics
    * (and a future engine change that "fixes" NOT IN into NOT EXISTS
    * would fail the compare). */
  val subNotInNull = Q(
    "sub_not_in_null",
    (spark, sfDir) => graft.Graft.sql(spark, sfDir,
      """SELECT
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 200000))
             AS n_clean,
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN
              (SELECT CASE WHEN o_totalprice > 200000 THEN o_custkey END
               FROM orders))
             AS n_null_poisoned"""),
    Some("""SELECT
              (SELECT count(*) FROM customer
               WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM orders WHERE o_totalprice > 200000))
                AS n_clean,
              (SELECT count(*) FROM customer
               WHERE c_custkey NOT IN
                 (SELECT CASE WHEN o_totalprice > 200000 THEN o_custkey END
                  FROM orders))
                AS n_null_poisoned"""))

  /** Boolean aggregates + conditional count: every/some ↔ bool_and/bool_or,
    * count_if — the predicate-summary family. */
  val aggBoolCountIf = Q(
    "agg_bool_count_if",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .groupBy("o_orderpriority")
        .agg(
          every(col("o_totalprice") > 1000.0).as("all_over_1k"),
          some(col("o_totalprice") > 400000.0).as("any_over_400k"),
          count_if(col("o_orderstatus") === "F").as("n_finished"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
            bool_and(o_totalprice > 1000.0) AS all_over_1k,
            bool_or(o_totalprice > 400000.0) AS any_over_400k,
            CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
            count(*) AS n
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Fixed-width histogram by explicit floor arithmetic (both engines lack
    * a portable width_bucket): 20k-wide totalprice bins, dense via the
    * bin-index integer — the groupBy stays a plain hash agg. */
  val aggHistogram = Q(
    "agg_histogram",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .select(floor(col("o_totalprice") / 20000.0).cast("bigint").as("bin"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"))
        .select(col("bin"), (col("bin") * 20000.0).as("bin_lo"), col("n"))
        .orderBy("bin"),
    Some("""SELECT bin, CAST(bin * 20000.0 AS DOUBLE) AS bin_lo, n FROM (
              SELECT CAST(floor(o_totalprice / 20000.0) AS BIGINT) AS bin,
                     count(*) AS n
              FROM orders GROUP BY bin)
            ORDER BY bin"""))

  /** Weighted aggregates: quantity-weighted price statistics per return
    * flag. All sums run in exact decimal (order-independent — the repo's
    * money policy): the (18,2)×(18,2) product is scale-4-exact, so no
    * rounding exists anywhere; the final weighted mean divides the two
    * finished doubles, and IEEE division of identical operands is
    * bit-identical on both engines. */
  val aggWeightedStats = Q(
    "agg_weighted_stats",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .groupBy("l_returnflag")
        .agg(
          // fact-scaling row count through the sum → primitive cents
          // path (bit-identical to sumDec; see agg_cube note) — round 18
          D.sumCents(col("l_quantity")).as("w_total"),
          D.sumDec4((D.dec(col("l_quantity")) * D.dec(col("l_extendedprice")))
            .cast(graft.util.D.Money4)).as("wsum_price"),
          count(lit(1)).as("n"))
        .withColumn("wavg_price", col("wsum_price") / col("w_total"))
        .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag, w_total, wsum_price, n,
                    wsum_price / w_total AS wavg_price
            FROM (SELECT l_returnflag,
                         ${D.oSumDec("l_quantity")} AS w_total,
                         ${D.oDbl(s"CAST(round(sum(CAST(${D.oDec("l_quantity")} * ${D.oDec("l_extendedprice")} AS DECIMAL(18,4))), 2) AS DECIMAL(18,2))")} AS wsum_price,
                         count(*) AS n
                  FROM lineitem GROUP BY l_returnflag)
            ORDER BY l_returnflag"""))

  /** Ordered top-k LISTAGG: per market segment, the top-3 customer names
    * by balance as one comma-joined string in rank order. Spark has no
    * ordered string_agg; the deterministic equivalent is collect_list of
    * (rk, name) structs + array_sort (rk is unique, so the sort is total)
    * + transform/array_join — all after a rk ≤ 3 window filter, so the
    * collected lists are bounded at k elements however large the group. */
  val aggTopkListagg = Q(
    "agg_topk_listagg",
    (spark, sfDir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_name"))
      Tables.customer(spark, sfDir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .groupBy("c_mktsegment")
        .agg(
          array_join(
            transform(array_sort(collect_list(struct(col("rk"), col("c_name")))),
              p => p.getField("c_name")), ",").as("top_names"),
          count(lit(1)).as("k"))
        .orderBy("c_mktsegment")
    },
    Some("""WITH rk AS (
              SELECT c_mktsegment, c_name, c_acctbal,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_name) AS rk
              FROM customer)
            SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY rk) AS top_names,
                   CAST(count(*) AS BIGINT) AS k
            FROM rk WHERE rk <= 3
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** The typed-UDAF surface, GRADED (round-11, VERDICT-r10 #4) — the
    * same bounded top-K `Aggregator` UdafSpec exercises
    * (functions.TopKAgg), behind an oracle: top-3 (acctbal, custkey) per
    * market segment, exploded to rows, against the ordered-LIMIT-per-
    * group window SQL. Identical RESULTS to agg_topk_listagg's window
    * formulation, different PHYSICS: the window sorts every group's full
    * row set inside one partition; the Aggregator carries an O(K) buffer
    * through partial + final aggregation (PlanShapeSpec pins the two
    * ObjectHashAggregate levels around the exchange), so the shuffle
    * moves 3-pair buffers, never row sets — the shape that wins when
    * groups are huge or skewed at 100 TB. Ties broken by custkey ASC
    * everywhere (total order, SURVEY §2 policy). */
  val aggTopkUdaf = Q(
    "agg_topk_udaf",
    (spark, sfDir) => {
      val topk = udaf(new graft.functions.TopKAgg(3))
      Tables.customer(spark, sfDir)
        .groupBy("c_mktsegment")
        .agg(topk(col("c_acctbal"), col("c_custkey")).as("top"))
        .select(col("c_mktsegment"), explode(col("top")).as("p"))
        .select(col("c_mktsegment"), col("p._1").as("bal"),
          col("p._2").as("custkey"))
        .orderBy(col("c_mktsegment"), col("bal").desc, col("custkey"))
    },
    Some("""WITH rk AS (
              SELECT c_mktsegment, c_acctbal AS bal, c_custkey AS custkey,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_custkey)
                       AS rk
              FROM customer)
            SELECT c_mktsegment, bal, custkey
            FROM rk WHERE rk <= 3
            ORDER BY c_mktsegment, bal DESC, custkey"""))

  /** Higher moments (skewness, excess kurtosis) from EXACT decimal power
    * sums — the engine-portable formulation: built-in skewness/kurtosis
    * differ across engines in bias correction AND in partial-aggregation
    * order, but Σv, Σv², Σv³, Σv⁴ in decimal are exact and associative, and
    * the moment algebra on top is identical IEEE doubles. Decimal widths
    * are chosen so no product exceeds precision 38 on either engine
    * (v at (9,2); v² at (18,4) so v²·v² is (37,8) in Spark — at (19,4)
    * Spark's multiply would hit its 38-cap and ROUND the 8th decimal).
    * The 4 power sums ride ONE hash aggregate — same shuffle as any agg. */
  val aggMoments = Q(
    "agg_moments",
    (spark, sfDir) => {
      import org.apache.spark.sql.types.DecimalType
      val v = col("value").cast(DecimalType(9, 2))
      val v2 = (v * v).cast(DecimalType(18, 4))
      val s1 = sum(v).cast("double")
      val s2 = sum(v2).cast("double")
      val s3 = sum(v2 * v).cast("double")
      val s4 = sum(v2 * v2).cast("double")
      Tables.events(spark, sfDir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), s1.as("s1"), s2.as("s2"),
          s3.as("s3"), s4.as("s4"))
        .select(col("event_type"), col("n"),
          round(col("s1") / col("n"), 4).as("mean"),
          round(col("s2") / col("n")
            - (col("s1") / col("n")) * (col("s1") / col("n")), 4).as("m2"),
          round((col("s3") / col("n")
            - lit(3) * (col("s1") / col("n")) * (col("s2") / col("n"))
            + lit(2) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s1") / col("n")))
            / pow(col("s2") / col("n")
              - (col("s1") / col("n")) * (col("s1") / col("n")), 1.5), 4)
            .as("skew"),
          round((col("s4") / col("n")
            - lit(4) * (col("s1") / col("n")) * (col("s3") / col("n"))
            + lit(6) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s2") / col("n"))
            - lit(3) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s1") / col("n")) * (col("s1") / col("n")))
            / pow(col("s2") / col("n")
              - (col("s1") / col("n")) * (col("s1") / col("n")), 2.0)
            - 3.0, 4).as("excess_kurt"))
        .orderBy("event_type")
    },
    Some("""WITH b AS (
              SELECT event_type, CAST(value AS DECIMAL(9,2)) AS v,
                     CAST(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))
                          AS DECIMAL(19,4)) AS v2
              FROM events),
            s AS (
              SELECT event_type, count(*) AS n,
                     CAST(sum(v) AS DOUBLE) AS s1,
                     CAST(sum(v2) AS DOUBLE) AS s2,
                     CAST(sum(v2 * v) AS DOUBLE) AS s3,
                     CAST(sum(v2 * v2) AS DOUBLE) AS s4
              FROM b GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round(s1/n, 4) AS mean,
                   round(s2/n - (s1/n)*(s1/n), 4) AS m2,
                   round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                         / pow(s2/n - (s1/n)*(s1/n), 1.5), 4) AS skew,
                   round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                          - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                         / pow(s2/n - (s1/n)*(s1/n), 2) - 3.0, 4) AS excess_kurt
            FROM s ORDER BY event_type"""))

  /** GROUPING() indicator columns over a rollup — how a consumer tells a
    * real NULL group key from a subtotal row (agg_rollup coalesces labels;
    * this exposes the raw indicator contract). Ordering puts subtotal
    * tiers together with NULLS FIRST pinned explicitly on both engines. */
  val aggGroupingId = Q(
    "agg_grouping_id",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(grouping(col("o_orderpriority")).cast("bigint").as("g_pri"),
          grouping(col("o_orderstatus")).cast("bigint").as("g_st"),
          count(lit(1)).as("n"))
        .orderBy(col("g_pri"), col("g_st"),
          col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first),
    Some("""SELECT o_orderpriority, o_orderstatus,
                   CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
                   CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
                   CAST(count(*) AS BIGINT) AS n
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            ORDER BY g_pri, g_st, o_orderpriority NULLS FIRST,
                     o_orderstatus NULLS FIRST"""))

  /** Grouped linear-regression aggregates (round-9) — the regr_* family
    * (slope/intercept/R² of value vs hour-of-day per event type): the
    * one-pass distributed form of "fit a trend per group" that replaces
    * a per-group collect-and-fit loop at corpus scale (partial+final agg,
    * no data leaves the executors). Raw-double power sums differ across
    * engines only by partial-agg ORDER (~1e-13 relative); the graded
    * outputs round at 4, and the ideal values are generic reals (no
    * half-boundary grid resonance — the text-tier micro-int concern does
    * not apply to regression statistics). */
  val aggRegression = Q(
    "agg_regression",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .select(col("event_type"),
          hour(col("ts")).cast("double").as("x"), col("value").as("y"))
        .groupBy("event_type")
        // D.nz on the signed fits: a tiny-negative slope/intercept rounds
        // to -0.0 in DuckDB but +0.0 in Spark (the sf5-sweep class)
        .agg(count(lit(1)).as("n"),
          D.nz(round(regr_slope(col("y"), col("x")), 4)).as("slope"),
          D.nz(round(regr_intercept(col("y"), col("x")), 4)).as("intercept"),
          round(regr_r2(col("y"), col("x")), 4).as("r2"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
                   round(regr_slope(y, x), 4) + 0.0 AS slope,
                   round(regr_intercept(y, x), 4) + 0.0 AS intercept,
                   round(regr_r2(y, x), 4) AS r2
            FROM (SELECT event_type,
                         CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS x,
                         value AS y
                  FROM events)
            GROUP BY event_type ORDER BY event_type"""))

  /** Multiple DISTINCT aggregates in one pass (round-9) — COUNT(DISTINCT
    * user), COUNT(DISTINCT minute-bucket) and a plain decimal SUM per
    * event type: Catalyst plans this through Expand (one input row fans
    * into one row per distinct-group), the multi-distinct shape that
    * trips naive engines into N self-joins. The plan stays a single
    * scan + Expand + two-level agg — the form that scales; the oracle
    * states the same three aggregates directly. */
  val aggMultiDistinct = Q(
    "agg_multi_distinct",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(date_trunc("minute", col("ts"))).as("n_minutes"),
          D.sumDec(col("value")).as("sum_value"),
          count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some(s"""SELECT event_type,
                   count(DISTINCT user_id) AS n_users,
                   count(DISTINCT date_trunc('minute', ts)) AS n_minutes,
                   ${D.oSumDec("value")} AS sum_value,
                   count(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Benford first-digit census (round-9) — the fraud/synthetic-data
    * screen: distribution of o_totalprice's leading digit. Natural
    * multi-scale amounts approximate Benford's law; a flat profile
    * flags generated data (this fixture's near-uniform prices are the
    * degenerate case the screen exists to catch — same contract as
    * text_zipf_slope). Counts exact; frac one identical-integer
    * division; the digit comes from string ops (no log10). */
  val aggFirstDigit = Q(
    "agg_first_digit",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .select(substring(col("o_totalprice").cast(D.Money).cast("string"), 1, 1)
          .as("digit"))
        .groupBy("digit")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(
          Tables.orders(spark, sfDir).agg(count(lit(1)).as("total"))))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("total").cast("double")).as("frac"))
        .orderBy("digit"),
    Some("""WITH c AS (SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                 AS VARCHAR), 1, 1) AS digit,
                              count(*) AS n
                       FROM orders GROUP BY digit),
                 t AS (SELECT count(*) AS total FROM orders)
            SELECT digit, n,
                   CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS frac
            FROM c CROSS JOIN t ORDER BY digit"""))

  /** Gini concentration of customer revenue (round-9) — the inequality
    * metric behind "top-N% of customers drive M% of revenue": with
    * per-customer revenue x sorted ascending (total order: amount, then
    * custkey), G = (2·Σ i·xᵢ)/(n·Σxᵢ) − (n+1)/n. Every term is exact —
    * revenues are decimal cents (BIGINT), ranks are integers, products
    * Σ i·cents fit DECIMAL(38,0) with orders of headroom — and the two
    * final divisions act on identical integers. The rank window runs
    * over the CUSTOMER aggregate (bounded by customer count, not order
    * volume). Output: one row (n_customers, total_revenue, gini). */
  val aggGiniRevenue = Q(
    "agg_gini_revenue",
    (spark, sfDir) => {
      import org.apache.spark.sql.types.DecimalType
      // o_custkey-grained group count scales WITH the orders table
      // (BASELINE.md finding 1): the per-customer sum rides as BIGINT
      // cents end-to-end (D.sumAsCents) — the same integer the former
      // decimal-sum ×100 produced, now without the decimal buffer.
      val rev = Tables.orders(spark, sfDir)
        .groupBy("o_custkey")
        .agg(D.sumAsCents(col("o_totalprice")).as("cents"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cents"), col("o_custkey"))
      rev.withColumn("i", row_number().over(w).cast("bigint"))
        .groupBy()
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("sum_cents"),
          sum((col("i").cast(DecimalType(19, 0))
            * col("cents").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)))
            .as("sum_icents"))
        .select(col("n_customers"),
          (col("sum_cents").cast("double") / lit(100.0)).as("total_revenue"),
          (lit(2.0) * col("sum_icents").cast("double")
            / (col("n_customers").cast("double")
               * col("sum_cents").cast("double"))
            - (col("n_customers") + 1L).cast("double")
              / col("n_customers").cast("double")).as("gini"))
    },
    Some("""WITH rev AS (SELECT o_custkey,
                                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                     AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                         FROM orders GROUP BY o_custkey),
                 rk AS (SELECT cents,
                               CAST(row_number() OVER (ORDER BY cents, o_custkey)
                                    AS BIGINT) AS i
                        FROM rev),
                 g AS (SELECT count(*) AS n_customers,
                              CAST(sum(cents) AS BIGINT) AS sum_cents,
                              sum(CAST(i AS DECIMAL(19,0))
                                  * CAST(cents AS DECIMAL(19,0))) AS sum_icents
                       FROM rk)
            SELECT n_customers,
                   CAST(sum_cents AS DOUBLE) / 100.0 AS total_revenue,
                   2.0 * CAST(sum_icents AS DOUBLE)
                     / (CAST(n_customers AS DOUBLE) * CAST(sum_cents AS DOUBLE))
                     - CAST(n_customers + 1 AS DOUBLE)
                       / CAST(n_customers AS DOUBLE) AS gini
            FROM g"""))

  /** Key-skew census (round-10) — the diagnostic a planner (or engineer)
    * consults BEFORE a big join/agg to decide whether the key needs
    * salting or AQE skew handling (pairs with join_skew_salted, which
    * demonstrates the cure): group sizes per events.user_id, bucketed
    * into power-of-two bands via explicit CASE (integer-exact on both
    * engines — no float log2 at bucket boundaries), with per-band key
    * and row counts and the row fraction (one identical-integer
    * division). A heavy tail in the top band = salt the key.
    *
    * 100-TB shape: two-level hash agg (key sizes, then the ~10-band
    * census) — both phases keep map-side partial aggregation; no
    * materialized per-key list anywhere. */
  val aggSkewCensus = Q(
    "agg_skew_census",
    (spark, sfDir) =>
      // through the ONE library implementation (Ops.skewCensus)
      graft.ops.Ops.skewCensus(Tables.events(spark, sfDir), col("user_id"))
        .orderBy("bucket"),
    Some("""WITH sizes AS (SELECT user_id, count(*) AS n FROM events
                           GROUP BY user_id),
                 tot AS (SELECT count(*) AS total FROM events)
            SELECT CASE WHEN n = 1 THEN '01'
                        WHEN n <= 3 THEN '02-03'
                        WHEN n <= 7 THEN '04-07'
                        WHEN n <= 15 THEN '08-15'
                        WHEN n <= 31 THEN '16-31'
                        WHEN n <= 63 THEN '32-63'
                        ELSE '64+' END AS bucket,
                   count(*) AS n_keys,
                   CAST(sum(n) AS BIGINT) AS n_rows,
                   CAST(sum(n) AS DOUBLE) / CAST(total AS DOUBLE) AS frac_rows
            FROM sizes CROSS JOIN tot
            GROUP BY bucket, total ORDER BY bucket"""))

  /** Bitmap-merge exact distinct count (round-10) — the MERGEABLE-STATE
    * distinct pattern production OLAP uses (Roaring bitmaps, Druid/
    * ClickHouse groupBitmap) demonstrated on a 63-value id sub-domain
    * with a plain BIGINT as the bitmap: per event_type, bit_or of
    * (1 << user_id) for user_id < 63, popcount = exact distinct users.
    * Against count(DISTINCT) this is ONE-PASS and associatively
    * mergeable — partials combine by OR at any tree depth, no per-key
    * dedup state, which is why bitmap rollups beat expand-based distinct
    * at fleet scale; the demo domain is 63 ids because the engine-
    * portable bitmap here is one sign-safe BIGINT (production uses
    * compressed bitmaps for full domains). count(DISTINCT) rides along
    * as the in-artifact proof of equality.
    *
    * 100-TB shape: single scan, map-side bit_or partials, 5-group final
    * merge — no second shuffle, no Expand. */
  val aggBitmapDistinct = Q(
    "agg_bitmap_distinct",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .filter(col("user_id") < 63)
        .groupBy("event_type")
        .agg(bit_or(expr("shiftleft(1L, cast(user_id as int))"))
            .as("bitmap"),
          countDistinct(col("user_id")).as("n_distinct_check"))
        .select(col("event_type"),
          bit_count(col("bitmap")).cast("bigint").as("n_distinct_bitmap"),
          col("n_distinct_check"),
          (bit_count(col("bitmap")).cast("bigint")
            === col("n_distinct_check")).as("agree"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
                   CAST(bit_count(bit_or(1::BIGINT << CAST(user_id AS INT)))
                        AS BIGINT) AS n_distinct_bitmap,
                   count(DISTINCT user_id) AS n_distinct_check,
                   CAST(bit_count(bit_or(1::BIGINT << CAST(user_id AS INT)))
                        AS BIGINT) = count(DISTINCT user_id) AS agree
            FROM events WHERE user_id < 63
            GROUP BY event_type ORDER BY event_type"""))

  def qs: Seq[Q] = Seq(aggTopkUdaf, aggSkewCensus, aggBitmapDistinct, aggQ1Pricing, aggDistinct, aggStats, aggRollup,
    aggCube, aggGroupingSets, aggPivot, aggUnpivot, subScalar, subCorrelated,
    aggPercentileCorr, aggMinbyMaxby, aggMode, aggCollectSetList, subLateral,
    aggBoolCountIf, aggHistogram, aggWeightedStats, subNotInNull,
    aggTwophaseSalted, aggTopkListagg, aggMoments, aggGroupingId, aggRegression,
    aggMultiDistinct, aggFirstDigit, aggGiniRevenue)

  /** Two-phase salted aggregation — the skew-defeating shape for hot
    * group keys (l_returnflag has THREE values over the whole table: the
    * textbook hot-key aggregation): phase 1 pre-aggregates on
    * (key, salt=hash(row) % 16) so every task works on a slice of each
    * hot key, phase 2 re-aggregates the 48 partials on the key alone.
    * Decimal sums are associative, so the result is provably identical to
    * the direct groupBy — which is exactly what the oracle runs. (Spark's
    * own partial/final HashAggregate does this when the map side combines
    * well; explicit salting is the pattern for when it can't — e.g.
    * high-cardinality distinct states under each hot key.) */
  val aggTwophaseSalted = Q(
    "agg_twophase_salted",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(sum(D.dec(col("l_quantity"))).as("pq"),
          count(lit(1)).as("pn"))
        .groupBy("l_returnflag")
        .agg(D.dbl(sum(col("pq")).cast(D.Money)).as("sum_qty"),
          sum(col("pn")).as("n"))
        .orderBy("l_returnflag"),
    Some(s"""SELECT l_returnflag, ${D.oSumDec("l_quantity")} AS sum_qty,
            count(*) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))
}
