package graft.queries

import org.apache.spark.sql.functions._
import graft.util.{D, Tables}

/** Scans, projections, filters (SURVEY §2.1–2.2).
  *
  * 100-TB notes: all three rely on Catalyst pushing the projection and
  * predicates into the parquet scan (check `PushedFilters` / `ReadSchema` in
  * explain) — on a cluster the scan reads only the referenced columns and
  * skips row groups via min/max stats. The final total ORDER BY is a range-
  * partitioned sort (determinism policy #1), which AQE sizes at runtime.
  */
object Scans {

  // Row-level scans ORDER BY the FULL projection: (l_orderkey,
  // l_linenumber) is NOT unique in the fixtures (118k duplicate pairs at
  // sf0.1), and the sf1 rehearsal caught DuckDB's parallel sort breaking
  // those ties differently than Spark's at 6M rows. Sorting by every
  // emitted column is a total order up to fully-identical rows, which
  // compare equal anyway — deterministic at ANY scale.
  val scanProject = Q(
    "scan_project",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
            FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag"""))

  val scanFilterPushdown = Q(
    "scan_filter_pushdown",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
    Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            ORDER BY l_orderkey, l_linenumber, l_shipdate, l_quantity"""))

  /** The nanosecond-parquet recipe end-to-end (SURVEY §1.4). */
  val scanEventsNs = Q(
    "scan_events_ns",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("event_id"),
    Some("""SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value
            FROM events ORDER BY event_id"""))

  val projectCompute = Q(
    "project_compute",
    (spark, sfDir) =>
      Tables.lineitem(spark, sfDir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          D.dbl(D.net(col("l_extendedprice"), col("l_discount"))).as("net_price"),
          when(col("l_discount") > 0.05, "HIGH").otherwise("LOW").as("disc_band"))
        .orderBy("l_orderkey", "l_linenumber", "net_price", "disc_band"),
    Some(s"""SELECT l_orderkey, l_linenumber,
            ${D.oDbl(D.oNet("l_extendedprice", "l_discount"))} AS net_price,
            CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band
            FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, disc_band"""))

  val filterCompound = Q(
    "filter_compound",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .filter(
          (col("o_orderstatus").isin("F", "O") &&
            col("o_totalprice").between(1000.0, 200000.0) &&
            col("o_orderpriority").like("1%")) ||
          (!col("o_orderstatus").isin("F", "O") && col("o_totalprice") > 250000.0))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
            FROM orders
            WHERE (o_orderstatus IN ('F','O') AND o_totalprice BETWEEN 1000.0 AND 200000.0
                   AND o_orderpriority LIKE '1%')
               OR (NOT o_orderstatus IN ('F','O') AND o_totalprice > 250000.0)
            ORDER BY o_orderkey"""))

  /** Three-valued logic on manufactured nulls (fixtures are null-free). */
  val filterNullSemantics = Q(
    "filter_null_semantics",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nullable"))
        .select(
          col("c_custkey"), col("seg_nullable"),
          col("seg_nullable").isNull.as("is_building"),
          coalesce(col("seg_nullable"), lit("(redacted)")).as("seg_filled"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey, seg_nullable, seg_nullable IS NULL AS is_building,
            coalesce(seg_nullable, '(redacted)') AS seg_filled
            FROM (SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_nullable
                  FROM customer) ORDER BY c_custkey"""))

  /** Non-file source: Spark's Range relation (the generator every engine
    * exposes — DuckDB's generate_series). 100k synthetic rows aggregated
    * by modulo bucket; sums stay in exact BIGINT. Range splits evenly
    * across partitions, so the generator itself parallelizes — the pattern
    * for synthetic/benchmark data generation at scale. */
  val scanRangeSource = Q(
    "scan_range_source",
    (spark, _) =>
      spark.range(1, 100001)
        .select(pmod(col("id"), lit(10)).as("bucket"),
          col("id"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum(col("id") * col("id")).as("sum_sq"))
        .orderBy("bucket"),
    Some("""SELECT i % 10 AS bucket, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(i * i) AS BIGINT) AS sum_sq
            FROM (SELECT unnest(generate_series(1, 100000)) AS i)
            GROUP BY bucket ORDER BY bucket"""))

  /** IN-list predicate pushdown (round-9) — the membership filter shape
    * (priority routing, tenant allowlists) that must reach the parquet
    * reader as an In filter so row groups whose [min,max] exclude every
    * listed value never leave disk. PlanShapeSpec pins the pushdown;
    * the graded output is the filtered census (count + decimal sum per
    * kept priority). */
  val scanInPushdown = Q(
    "scan_in_pushdown",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority")
          .isin("1-URGENT", "2-HIGH", "5-LOW"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          D.sumDec(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority"),
    Some(s"""SELECT o_orderpriority, count(*) AS n,
                   ${D.oSumDec("o_totalprice")} AS sum_price
            FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  def qs: Seq[Q] = Seq(scanProject, scanFilterPushdown, scanEventsNs,
    projectCompute, filterCompound, filterNullSemantics, scanRangeSource, scanInPushdown)
}
