package graft

import graft.queries.Registry
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Round-18 pins: the new TPC-H-face keys must agree with independent
  * DataFrame-API derivations of the same answers (the SQL string and the
  * expression API cross-check each other through different front ends),
  * the RLHF-prep keys must satisfy their defining algebraic properties
  * (group-standardized advantages, extreme-pair construction with
  * deterministic ties), and the load-bearing plan shapes — pushdown
  * through Q19's disjunction, Q10's TakeOrderedAndProject, the
  * WindowGroupLimit rewrite that keeps ml_preference_pairs' shuffles
  * group-bounded — must not silently de-optimize. */
class Round18OpsSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.byName(name).build(spark, sf0001)
      .queryExecution.executedPlan.toString

  test("sql_q6_forecast_revenue == the expression-API derivation (exact cents)") {
    val sql = Registry.byName("sql_q6_forecast_revenue").build(spark, sf0001).collect()
    val df = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)").between(5, 7) &&
        col("l_quantity") < 24)
      .agg(
        (sum(expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)") *
          expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)")).cast("double") / 10000.0)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .collect()
    assert(sql.length == 1 && df.length == 1)
    assert(sql(0).getDouble(0) == df(0).getDouble(0), "revenue diverged")
    assert(sql(0).getLong(1) == df(0).getLong(1), "line count diverged")
    assert(sql(0).getLong(1) > 0, "empty Q6 slice grades nothing")
  }

  test("sql_q15_top_supplier: winner(s) carry exactly the max quarterly revenue, ties total-ordered") {
    val winners = Registry.byName("sql_q15_top_supplier").build(spark, sf0001).collect()
    assert(winners.nonEmpty, "no top supplier — empty quarter slice")
    val rev = Tables.lineitem(spark, sf0001)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .groupBy("l_suppkey")
      .agg(sum(expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)") *
        (lit(100) - expr("CAST(ROUND(l_discount * 100, 0) AS BIGINT)"))).as("total_e4"))
    val maxE4 = rev.agg(max("total_e4")).head().getLong(0)
    val expect = rev.filter(col("total_e4") === maxE4)
      .select("l_suppkey").collect().map(_.getLong(0)).sorted.toSeq
    assert(winners.map(_.getLong(0)).toSeq == expect,
      "winner set != suppliers at the exact-integer max")
    val shown = winners.map(_.getDouble(2))
    val display = math.floor((maxE4 + 50) / 100.0).toLong.toDouble / 100.0
    assert(shown.forall(_ == display), "display revenue != cents narrowing of the max")
  }

  test("sql_q22_dormant_balance groups exactly the dormant above-mean customers") {
    val out = Registry.byName("sql_q22_dormant_balance").build(spark, sf0001)
      .agg(sum("numcust")).head().getLong(0)
    val cust = Tables.customer(spark, sf0001)
    val mean = cust.filter(col("c_acctbal") > 0.0)
      .agg((sum(expr("CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)")).cast("double") / 100.0)
        / count(lit(1))).head().getDouble(0)
    val active = Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
      .select(col("o_custkey")).distinct()
    val expect = cust.filter(col("c_acctbal") > mean)
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(out == expect, s"Q22 counted $out customers, independent derivation says $expect")
    assert(expect > 0, "zero dormant customers grades nothing")
  }

  test("ml_grpo_advantage: per-group advantages have mean ~0 and population std ~1") {
    val adv = Registry.byName("ml_grpo_advantage").build(spark, sf0001)
    assert(adv.count() > 0)
    val stats = adv.groupBy("user_id")
      .agg(avg("advantage").as("mu"),
        (sum(col("advantage") * col("advantage")) / count(lit(1))).as("msq"),
        count(lit(1)).as("n"))
      .collect()
    stats.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-3,
        s"group ${r.get(0)}: advantage mean ${r.getDouble(1)} not ~0")
      // E[adv^2] = population variance of a standardized variable = 1
      // (advantages are rounded to 4 dp, so allow that quantization).
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-2,
        s"group ${r.get(0)}: mean squared advantage ${r.getDouble(2)} not ~1")
      assert(r.getLong(3) >= 2, "degenerate group (n<2) not dropped")
    }
  }

  test("ml_preference_pairs: chosen=group max, rejected=group min, margin>0, one pair per signal group") {
    val pairs = Registry.byName("ml_preference_pairs").build(spark, sf0001).collect()
    assert(pairs.nonEmpty)
    val rewards = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("r_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rewards.groupBy(_._2)
    assert(pairs.length == byUser.count { case (_, g) =>
      g.map(_._3).max > g.map(_._3).min }, "pair count != groups with reward signal")
    pairs.foreach { p =>
      val g = byUser(p.getLong(0))
      val (maxR, minR) = (g.map(_._3).max, g.map(_._3).min)
      // deterministic tie-break: smallest event_id among the extremes
      assert(p.getLong(1) == g.filter(_._3 == maxR).map(_._1).min, "chosen != earliest argmax")
      assert(p.getLong(2) == g.filter(_._3 == minR).map(_._1).min, "rejected != earliest argmin")
      assert(p.getDouble(3) == (maxR - minR).toDouble / 100.0 && p.getDouble(3) > 0)
    }
  }

  test("plan pins: Q19 pushes the disjunction per side; Q10 top-k is TakeOrdered; Q6 scan reads 4 columns") {
    val q19 = plan("sql_q19_discounted_revenue")
    // both scans must carry a pushed OR tree (brand/size union on part,
    // quantity envelope on lineitem) — the pushdown-through-OR pin
    assert("PushedFilters: \\[[^\\]]*Or".r.findAllIn(q19).length >= 2,
      "Q19's disjunction no longer pushes to both scans")
    assert(plan("sql_q10_returned_items").contains("TakeOrderedAndProject"),
      "Q10 lost TakeOrderedAndProject")
    val q6 = plan("sql_q6_forecast_revenue")
    assert(q6.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double," +
      "l_discount:double,l_shipdate:timestamp_ntz>"),
      "Q6 scan no longer prunes to the 4 needed columns")
  }

  test("plan pin: ml_preference_pairs keeps the WindowGroupLimit (group-bounded shuffles)") {
    val p = plan("ml_preference_pairs")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      "rk=1 filters no longer rewrite to partial+final WindowGroupLimit — " +
        "each branch would shuffle the full event volume")
  }

  test("stream_dropdup_within_watermark: exactly-once files AND a horizon-bounded state store") {
    // the graded claim: every injected duplicate vanishes
    val out = Registry.byName("stream_dropdup_within_watermark").build(spark, sf0001)
    val total = Tables.events(spark, sf0001).count()
    assert(out.count() == total, "sink rows != original events (dup survived or original lost)")
    // the 100-TB claim — the reason this API exists over dropDuplicates
    // on a time-free key: retained state is the dedup horizon's tail
    // (eventTime + 10-min delay still ahead of the final watermark =
    // the last 20 minutes of the corpus), NOT one key per event.
    val ckpt = s"${graft.queries.Streaming.dropdupWwBase(spark, sf0001)}/ckpt"
    val stateRows = spark.read.format("statestore").option("path", ckpt).load().count()
    val ev = Tables.events(spark, sf0001)
      .select(col("ts").cast("timestamp").as("ts"))
    val max2 = ev.agg(max("ts")).head().getTimestamp(0)
    val cut = new java.sql.Timestamp(max2.getTime - 20L * 60 * 1000)
    val gt = ev.filter(col("ts") > lit(cut)).count()
    val ge = ev.filter(col("ts") >= lit(cut)).count()
    assert(stateRows == gt || stateRows == ge,
      s"state holds $stateRows keys; the 20-min horizon tail is [$gt, $ge] — " +
        "eviction arithmetic drifted (or state is unbounded)")
    assert(stateRows < total / 5, s"state $stateRows of $total keys — not horizon-bounded")
  }

  test("plan pin: ml_grpo_advantage computes all window stats over ONE user_id exchange") {
    val p = plan("ml_grpo_advantage")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1,
      "the three window sums no longer share a single user_id shuffle")
  }
}
