package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Demonstrates (and pins) the shuffle-elimination techniques the engine
  * relies on at cluster scale, on plans small enough to assert against. */
class ScaleTechniquesSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // external tables via explicit paths — warehouse.dir is a static conf
    val wh = Files.createTempDirectory("graft_buckets_").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    spark.read.parquet(s"$sf0001/orders.parquet")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    spark.read.parquet(s"$sf0001/customer.parquet")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/b_customer").saveAsTable("b_customer")
    // hint MERGE so the tiny sf0.001 customer side doesn't get broadcast —
    // the point is that co-bucketed SMJ needs NO shuffle at all
    val joined = spark.table("b_orders")
      .join(spark.table("b_customer").hint("MERGE"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join, got:\n$plan")
    // and the result is still correct vs the unbucketed join
    val expected = spark.read.parquet(s"$sf0001/orders.parquet")
      .join(spark.read.parquet(s"$sf0001/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    assert(joined.except(expected).count() == 0)
    assert(expected.except(joined).count() == 0)
  }

  test("AQE coalesces shuffle partitions at runtime") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val df = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum(col("l_quantity")))
    df.collect()
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("AQEShuffleRead") || finalPlan.contains("coalesced"),
      s"expected AQE-coalesced read in:\n$finalPlan")
  }

  test("broadcast hints survive into the physical plan for dimension joins") {
    val q = graft.queries.Registry.byName("join_bcast_chain").build(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}
