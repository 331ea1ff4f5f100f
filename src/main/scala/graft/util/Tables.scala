package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table readers for the fixture star schema (FIXTURES.md).
  *
  * 100-TB notes: every reader is a plain parquet scan — Spark's vectorized
  * columnar reader + Catalyst column pruning / predicate pushdown apply
  * unchanged on a real cluster; nothing here assumes local mode.
  */
object Tables {

  /** Generic table scan, parameterized by sfDir (Verify/Bench pass different dirs). */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet `timestamp[ns]`, which Spark 4.x cannot read as a
    * timestamp (scan-time error). Recipe (SURVEY §1.4, verified):
    *   1. read nanos as Long via `spark.sql.legacy.parquet.nanosAsLong`
    *      (runtime-settable; repeated sets are no-ops);
    *   2. integer-divide by 1000 (`div`, never `/` — epoch nanos exceed a
    *      double's 53-bit mantissa, so float division can flip a microsecond);
    *   3. `timestamp_micros` then cast to `timestamp_ntz` so outputs are
    *      type-identical with the DuckDB oracle's naive TIMESTAMP (session TZ
    *      is UTC, so the cast is the identity on values).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
  }

  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
