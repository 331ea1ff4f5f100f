package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers (SURVEY §2 policy). Both engines (Spark, DuckDB) must
  * produce bit-identical values; these pin down the places where IEEE-double
  * non-associativity or engine-specific rounding could diverge.
  *
  * Core rule (round-1 verdict #4): NEVER round a computed double to build a
  * money value — Spark rounds the shortest-repr BigDecimal of the double
  * (1222.745 → 1222.75) while DuckDB rounds the double bits (→ 1222.74), so
  * exact midpoints diverge. Instead cast the stored 2-dp inputs to
  * decimal(18,2) FIRST (exact — fixtures carry no sub-cent digits, verified
  * in FIXTURES.md) and do all arithmetic in decimal: products of 2-dp
  * decimals are exact 4-dp/6-dp decimals, no rounding step exists, and
  * decimal sums are associative so results are independent of partition
  * count/order (critical at 100 TB where partitioning differs run to run).
  *
  * HIGH-CARDINALITY caveat (round-14, BASELINE.md finding 1): Spark's
  * decimal SUM carries a precision-28 buffer that updates off the
  * Long-backed fast path — measured 64 vs 9 task-CPU-s against an exact
  * integer-cents sum (`SUM(CAST(ROUND(x * 100, 0) AS BIGINT))`) for the
  * same 1.47M-group aggregation at sf1. These helpers are the right
  * default for LOW-cardinality grouped money sums (Q1's 6 groups cost
  * 5.7 CPU-s at sf1); for grouped money sums whose group count scales
  * with the fact table, lift 2-dp doubles to integer centi-units per row
  * instead (exact and engine-portable: the ×100 product is never at a
  * rounding midpoint) and convert only the finished per-group value —
  * the SQL face (queries/SqlSurface.scala `revenue`) is the worked
  * pattern, bit-identical to the decimal formulation on both engines.
  */
object D {
  val Money: DecimalType = DecimalType(18, 2)
  val Money4: DecimalType = DecimalType(18, 4)
  val Money6: DecimalType = DecimalType(18, 6)

  /** Exact cast of a stored 2-dp double (price, qty, value) to decimal. */
  def dec(c: Column): Column = c.cast(Money)

  /** Decimal literal 1.00 — keeps (1 - disc) in exact decimal arithmetic. */
  private def one: Column = lit(1).cast(DecimalType(3, 2))

  /** price * (1 - discount), exact decimal, scale 4 (no rounding occurs:
    * (18,2)*(19,2) is scale-4-exact; the down-cast only narrows precision). */
  def net(price: Column, disc: Column): Column =
    (dec(price) * (one - dec(disc))).cast(Money4)

  /** price * (1 - discount) * (1 + tax), exact decimal, scale 6. */
  def charge(price: Column, disc: Column, tax: Column): Column =
    (net(price, disc) * (one + dec(tax))).cast(Money6)

  /** Final-output cast: exact decimal → double. The SUM itself stays
    * decimal (order-independent); only the finished value is converted,
    * and both engines round the same exact decimal to the same nearest
    * double — bit-identical. Outputs must never stay DECIMAL: the
    * driver's hash reads Spark parquet as `Decimal('1222.7400')` (scale
    * preserved, trailing zeros) but the DuckDB oracle as float64, so a
    * numerically-equal decimal still hash-mismatches (root cause of all
    * 15 round-2 `hash_match: false` rows). */
  def dbl(c: Column): Column = c.cast("double")

  /** Exact, partition-order-independent decimal sum, emitted as double. */
  def sumDec(c: Column): Column = dbl(sum(dec(c)).cast(Money))

  /** Sums of scale-4/6 decimals narrow to scale 2 BEFORE the double cast.
    * Scale-rehearsal finding (sf1, round 5): once |sum|·10^scale crosses
    * 2^53 the exact decimal no longer fits a double, and the two engines'
    * decimal→double conversions round the last ulp differently (Spark's
    * BigDecimal.doubleValue is correctly rounded; DuckDB converts the
    * int128 payload then divides by 10^scale — two roundings). A 6-dp sum
    * diverged at ~2.8e10 (sf1's Q1 sum_charge); at scale 2 the same
    * boundary sits at ~9e13, four orders of headroom. Both engines round
    * the 4/6-dp sum to 2 dp identically (exact decimal, HALF_UP, positive
    * sums), so the narrowed value is engine-portable — per-window/group
    * sums bounded by construction (not corpus size) may keep full scale. */
  def sumDec4(c: Column): Column = dbl(sum(c).cast(Money))

  /** See sumDec4 — same scale-2 narrowing for scale-6 decimal sums. */
  def sumDec6(c: Column): Column = dbl(sum(c).cast(Money))

  /** Exact integer cents of a stored 2-dp double. The ×100 product of a
    * 2-dp value is within one ulp of an integer and never at a rounding
    * midpoint, so Spark's BigDecimal round and DuckDB's bits round land
    * on the same integer (the SqlSurface `revenue` proof, round 14). */
  private def cents(c: Column): Column = round(c * lit(100), 0).cast("bigint")

  /** 100-TB form of sumDec for HIGH-cardinality groups (BASELINE.md
    * finding 1): the sum runs as a primitive BIGINT in whole-stage
    * codegen (measured 9 vs 64 task-CPU-s at sf1 for 1.47M groups)
    * instead of Spark's precision-28 decimal buffer. Value is
    * bit-identical to sumDec: the cents sum is exact while < 2^53 (per
    * GROUP, so bounded by group size not corpus size), and both
    * `BigDecimal(cents, 2).doubleValue` and `cents.toDouble / 100.0`
    * are the correctly-rounded double of the same rational. */
  def sumCents(c: Column): Column = sumAsCents(c).cast("double") / lit(100.0)

  /** Same primitive-path sum, emitted as BIGINT cents (for consumers that
    * stay in integer arithmetic, e.g. agg_gini_revenue's rank products). */
  def sumAsCents(c: Column): Column = sum(cents(c))

  /** 100-TB form of sumDec4(net(price, disc)) — the DataFrame-tier twin
    * of SqlSurface's `revenue` (queries/SqlSurface.scala:20-40): revenue
    * rides as BIGINT 1e-4 units (price_cents × (100 − disc_cents), both
    * factors exact per `cents`), and the HALF_UP 2-dp narrowing that
    * sumDec4's `.cast(Money)` performs is reproduced exactly as
    * floor((s+50)/100) — positive sums; (s+50)/100.0 is a correctly
    * rounded quotient of an exactly-representable integer while
    * s < 2^53 (per-group revenue < ~9e11 currency units). Spark's
    * floor(double) returns BIGINT; the final /100.0 emits the same
    * double as sumDec4's decimal→double conversion. */
  def sumNetCents(price: Column, disc: Column): Column =
    floor((sum(cents(price) * (lit(100L) - cents(disc))) + lit(50L)) / lit(100.0))
      .cast("double") / lit(100.0)

  /** Timestamp output normalization — all query outputs are timestamp_ntz. */
  def ntz(c: Column): Column = c.cast("timestamp_ntz")

  /** Normalize IEEE negative zero on a ROUNDED double output (round-10,
    * found by the sf5 full-suite parity sweep): a tiny NEGATIVE value
    * rounding to zero diverges between engines — Spark's round() goes
    * through BigDecimal HALF_UP and emits +0.0, DuckDB rounds the double
    * bits and keeps -0.0; the two stringify as '0.0' vs '-0.0' and the
    * driver hash-mismatches. `x + 0.0` maps -0.0 → +0.0 and is the
    * identity on every other double (IEEE 754 addition), so appending it
    * on BOTH engines (oracle: `+ 0.0`) closes the divergence without
    * touching any nonzero value. Only needed where a rounded output can
    * be tiny-negative (correlations, z-scores, cosines, signed deltas);
    * unrounded outputs agree bit-for-bit already. */
  def nz(c: Column): Column = c + lit(0.0)

  // Oracle-side (DuckDB SQL) mirrors of the same expressions, so every
  // module states the two sides adjacently and identically.
  def oDec(col: String): String = s"CAST($col AS DECIMAL(18,2))"
  def oNet(price: String, disc: String): String =
    s"CAST(${oDec(price)} * (1 - ${oDec(disc)}) AS DECIMAL(18,4))"
  def oCharge(price: String, disc: String, tax: String): String =
    s"CAST(${oNet(price, disc)} * (1 + ${oDec(tax)}) AS DECIMAL(18,6))"
  def oDbl(expr: String): String = s"CAST($expr AS DOUBLE)"
  def oSumDec(col: String): String =
    oDbl(s"CAST(sum(${oDec(col)}) AS DECIMAL(18,2))")
}
