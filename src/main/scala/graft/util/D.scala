package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers (SURVEY §2 policy). Both engines (Spark, DuckDB) must
  * produce bit-identical values; these pin down the places where IEEE-double
  * non-associativity or engine-specific rounding could diverge:
  *
  *  - money/quantity sums run in decimal(18,2) — exact + associative, so the
  *    result is independent of shuffle partitioning (critical at 100 TB where
  *    partition counts differ run to run);
  *  - computed money (price*(1-disc)) is rounded to 2dp in double first
  *    (round-half-away is identical in both engines for positive values),
  *    then cast to decimal — the double is within 1e-12 of the grid point, so
  *    the cast is unambiguous;
  *  - averages/ratios stay double but are rounded so summation-order noise
  *    (~N·M·eps) sits far below the rounding boundary;
  *  - aggregate results are re-cast to pin the output type (Spark's
  *    sum(decimal(18,2)) widens to decimal(28,2); DuckDB's to decimal(38,2)).
  */
object D {
  val Money: DecimalType = DecimalType(18, 2)

  /** Exact cast of a stored 2-dp double (price, qty, value) to decimal. */
  def dec(c: Column): Column = c.cast(Money)

  /** Computed money expression → stable decimal (round-then-cast). */
  def money(c: Column): Column = round(c, 2).cast(Money)

  /** Exact, partition-order-independent decimal sum with pinned type. */
  def sumDec(c: Column): Column = sum(dec(c)).cast(Money)

  /** Sum of a computed money expression, pinned type. */
  def sumMoney(c: Column): Column = sum(money(c)).cast(Money)

  /** Timestamp output normalization — all query outputs are timestamp_ntz. */
  def ntz(c: Column): Column = c.cast("timestamp_ntz")
}
