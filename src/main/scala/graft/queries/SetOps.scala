package graft.queries

import org.apache.spark.sql.functions._
import graft.util.{D, Tables}

/** Top-k and set operations (SURVEY §2.6).
  *
  * 100-TB notes: `orderBy(...).limit(k)` plans as TakeOrderedAndProject —
  * each partition keeps only its local top-k, the driver merges k·p rows,
  * no global sort materializes. Set ops are hash-based shuffles on the
  * full row; inputs here are projected to the minimal column set first.
  */
object SetOps {

  /** TPC-H-Q3-shaped: top-10 revenue orders for BUILDING customers. */
  val sortLimitTopk = Q(
    "sort_limit_topk",
    (spark, sfDir) => {
      val cutoff = lit("1998-06-01").cast("timestamp_ntz")
      Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > cutoff)
        .join(Tables.orders(spark, sfDir).filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        // Orderkey-grained group count scales WITH the fact table — the
        // one §2.6 site in BASELINE.md finding 1's class — so the sum
        // rides as integer cents (D.sumNetCents, bit-identical to the
        // former sumDec4(net) formulation; the DECIMAL oracle below is
        // unchanged, so parity itself proves the equivalence).
        .agg(D.sumNetCents(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT l_orderkey, o_orderdate,
            ${D.oDbl(s"CAST(round(sum(${D.oNet("l_extendedprice", "l_discount")}), 2) AS DECIMAL(18,2))")} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
              AND c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** customer ∪ supplier with a source tag (UNION ALL, schema aligned). */
  val setUnionAll = Q(
    "set_union_all",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .select(lit("C").as("src"), col("c_custkey").as("key"),
          col("c_name").as("name"), col("c_acctbal").as("acctbal"))
        .unionByName(
          Tables.supplier(spark, sfDir)
            .select(lit("S").as("src"), col("s_suppkey").as("key"),
              col("s_name").as("name"), col("s_acctbal").as("acctbal")))
        .orderBy("src", "key"),
    Some("""SELECT 'C' AS src, c_custkey AS key, c_name AS name, c_acctbal AS acctbal FROM customer
            UNION ALL
            SELECT 'S', s_suppkey, s_name, s_acctbal FROM supplier
            ORDER BY src, key"""))

  /** Distinct nation keys referenced by customers or suppliers. */
  val setUnionDistinct = Q(
    "set_union_distinct",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey"))
        .union(Tables.supplier(spark, sfDir).select(col("s_nationkey")))
        .distinct()
        .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey FROM supplier
            ORDER BY nationkey"""))

  /** Nation keys with both high-balance customers AND any supplier. */
  val setIntersect = Q(
    "set_intersect",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir).filter(col("c_acctbal") > 5000.0)
        .select(col("c_nationkey").as("nationkey"))
        .intersect(Tables.supplier(spark, sfDir).select(col("s_nationkey")))
        .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
            INTERSECT
            SELECT s_nationkey FROM supplier
            ORDER BY nationkey"""))

  /** Nation keys with customers but no high-balance supplier. */
  val setExcept = Q(
    "set_except",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey"))
        .except(Tables.supplier(spark, sfDir).filter(col("s_acctbal") > 5000.0)
          .select(col("s_nationkey")))
        .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0
            ORDER BY nationkey"""))

  /** Multiset INTERSECT ALL — duplicates survive up to the min multiplicity
    * on each side (the bag semantics `intersect` erases). */
  val setIntersectAll = Q(
    "set_intersect_all",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir).filter(col("c_acctbal") > 5000.0)
        .select(col("c_nationkey").as("nationkey"))
        .intersectAll(Tables.supplier(spark, sfDir).select(col("s_nationkey")))
        .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000.0
            INTERSECT ALL
            SELECT s_nationkey FROM supplier
            ORDER BY nationkey"""))

  /** Multiset EXCEPT ALL — per-row subtraction of multiplicities. */
  val setExceptAll = Q(
    "set_except_all",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir).select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables.supplier(spark, sfDir).filter(col("s_acctbal") > 5000.0)
          .select(col("s_nationkey")))
        .orderBy("nationkey"),
    Some("""SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000.0
            ORDER BY nationkey"""))

  /** Pagination: ORDER BY + OFFSET + LIMIT over a unique key — page 3 of
    * 50. (At cluster scale deep OFFSET still sorts everything before it;
    * keyset pagination — WHERE key > last_seen — is the scale-friendly
    * variant, which is just scan_filter + sort_limit composed.) */
  val sortLimitOffset = Q(
    "sort_limit_offset",
    (spark, sfDir) =>
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50),
    Some("""SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
            ORDER BY o_orderkey LIMIT 50 OFFSET 100"""))

  /** Schema-evolution union: two frames with DIFFERENT column sets merge
    * by NAME, absent columns null-filled (`unionByName(allowMissing)` ↔
    * DuckDB `UNION ALL BY NAME`) — the shape that appends a new-schema
    * batch to an old-schema corpus without positional-union corruption. */
  val setUnionByname = Q(
    "set_union_byname",
    (spark, sfDir) => {
      val cust = Tables.customer(spark, sfDir)
      val old = cust.filter(pmod(col("c_custkey"), lit(2)) === 0)
        .select("c_custkey", "c_name", "c_acctbal") // no segment column
      val neu = cust.filter(pmod(col("c_custkey"), lit(2)) === 1)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          col("c_name")) // no acctbal, different order
      old.unionByName(neu, allowMissingColumns = true)
        .select("c_custkey", "c_name", "c_acctbal", "segment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_acctbal, segment FROM (
              SELECT c_custkey, c_name, c_acctbal, NULL AS segment
              FROM customer WHERE c_custkey % 2 = 0
              UNION ALL BY NAME
              SELECT c_custkey, c_mktsegment AS segment, c_name
              FROM customer WHERE c_custkey % 2 = 1)
            ORDER BY c_custkey"""))

  /** Symmetric difference (round-9) — the reconciliation composition two
    * snapshots of a slowly-changing set need ("what changed either way"):
    * (A EXCEPT B) UNION ALL (B EXCEPT A) with a side tag, over the keyed
    * order sets of two adjacent years. Composes the set algebra the tier
    * already grades into the operation auditors actually run; both
    * branches are DISTINCT-set semantics, so duplicates inside a side
    * never inflate the diff. */
  val setSymmetricDiff = Q(
    "set_symmetric_diff",
    (spark, sfDir) => {
      def keys(yr: Int) = Tables.orders(spark, sfDir)
        .filter(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"))
      val a = keys(1996)
      val b = keys(1997)
      a.except(b).select(col("o_custkey"), lit("only_1996").as("side"))
        .unionByName(
          b.except(a).select(col("o_custkey"), lit("only_1997").as("side")))
        .orderBy("o_custkey", "side")
    },
    Some("""WITH a AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE EXTRACT(year FROM o_orderdate) = 1996),
                 b AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE EXTRACT(year FROM o_orderdate) = 1997)
            SELECT o_custkey, side FROM (
              SELECT o_custkey, 'only_1996' AS side FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
              UNION ALL
              SELECT o_custkey, 'only_1997' AS side FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
            ORDER BY o_custkey, side"""))

  def qs: Seq[Q] = Seq(sortLimitTopk, setUnionAll, setUnionDistinct,
    setIntersect, setExcept, setIntersectAll, setExceptAll, sortLimitOffset,
    setUnionByname,
    setSymmetricDiff)
}
