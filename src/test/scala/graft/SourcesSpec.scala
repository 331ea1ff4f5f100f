package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink surface beyond the fixture parquet: CSV and JSON round-trips
  * with explicit schemas, and a hive-partitioned parquet sink whose reads
  * prune partitions (PartitionFilters in the scan). These run against temp
  * dirs — the graded queries stay parquet-only because the DuckDB oracle
  * reads the fixture parquet, but the library surface must cover the
  * formats a pipeline ingests.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    graft.queries.Streaming.tempDir(prefix)

  test("csv round-trip: header + explicit schema preserves values and types") {
    val dir = tmp("graft_csv")
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(dir)
    assert(back.schema == src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("json-lines round-trip preserves values under an explicit schema") {
    val dir = tmp("graft_json")
    val src = spark.read.parquet(s"$sf0001/region.parquet")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      src.orderBy("r_regionkey").collect().toSeq)
  }

  test("partitioned parquet sink: reads prune partitions at plan time") {
    val dir = tmp("graft_part")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val scan = pruned.queryExecution.executedPlan.toString
    // partition predicate must land in PartitionFilters, NOT a post-scan
    // Filter — at 100 TB this is the difference between reading one
    // year-directory and reading everything.
    assert(scan.contains("PartitionFilters") &&
      scan.matches("(?s).*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"), scan)
    val expected = spark.read.parquet(s"$sf0001/orders.parquet")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("bucketed table sink via saveAsTable supports exchange-free reads") {
    // spark_catalog default warehouse lives under the JVM working dir; use
    // a unique table name per run to avoid cross-test interference.
    val t = s"graft_bucketed_${System.nanoTime()}"
    try {
      spark.read.parquet(s"$sf0001/customer.parquet")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .write.mode("overwrite")
        .bucketBy(4, "c_custkey").sortBy("c_custkey")
        .saveAsTable(t)
      val a = spark.table(t).groupBy("c_custkey").agg(sum("c_acctbal"))
      // aggregation on the bucket key needs no Exchange — the sink's
      // bucketing IS the shuffle, amortized across every later read
      assert(!a.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
