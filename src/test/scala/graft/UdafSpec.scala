package graft

import org.apache.spark.sql.functions._

/** The typed-UDAF surface (SURVEY §2.13): a custom `Aggregator` is the
  * sanctioned way to add an aggregate Spark lacks — merge-able state, so
  * it runs as partial + final aggregation like any built-in (unlike a
  * row-at-a-time UDF, which can't pre-combine map-side). Promoted to the graded
  * surface in round-11: functions.TopKAgg backs the agg_topk_udaf key.
  *
  * The demo is an exact bounded top-K: the buffer keeps only K (balance,
  * custkey) pairs, so state is O(K) per group no matter how many rows flow
  * in — the property that makes it safe at 100 TB.
  */
class UdafSpec extends SparkSpec {

  test("custom Aggregator top-3 matches the window-function top-3 exactly") {
    import spark.implicits._
    val topk = udaf(new graft.functions.TopKAgg(3))
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
    val viaUdaf = cust
      .groupBy("c_mktsegment")
      .agg(topk(col("c_acctbal"), col("c_custkey")).as("top"))
      .select(col("c_mktsegment"), explode(col("top")).as("p"))
      .select(col("c_mktsegment"), col("p._1").as("bal"), col("p._2").as("key"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    val viaWindow = cust
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("c_acctbal").as("bal"), col("c_custkey").as("key"))
    assert(viaUdaf.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaUdaf).count() == 0)
    assert(viaUdaf.count() == 15) // 5 segments × 3
  }

  test("the Aggregator pre-combines map-side: plan shows partial + final aggregation") {
    import spark.implicits._
    val topk = udaf(new graft.functions.TopKAgg(3))
    val q = spark.read.parquet(s"$sf0001/customer.parquet")
      .groupBy("c_mktsegment")
      .agg(topk(col("c_acctbal"), col("c_custkey")).as("top"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // two aggregation levels around the exchange = map-side combine active
    assert(plan.contains("partial_topk") || plan.split("Aggregate").length > 2, plan)
  }
}
