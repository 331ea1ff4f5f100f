package graft

import graft.queries.Registry
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Round-9 second-wave invariants (batches after Round9OpsSpec): sniffing
  * totality, hard-negative label safety, sweep geometry, LTTB contract
  * edges, null-safe-join bucket arithmetic, schema-evolution NULL
  * surface, SQL-path ordering, fill semantics, nesting monotonicity,
  * confusion-matrix stochasticity, and interval-frame lower bounds.
  */
class Round9bOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).build(spark, sf0001)

  test("mm_format_sniff partitions every document into a known format") {
    val rows = run("mm_format_sniff").collect()
    val total = rows.map(_.getLong(1)).sum
    val docs = Tables.documents(spark, sf0001).count()
    assert(total == docs, s"$total sniffed vs $docs docs")
    assert(rows.map(_.getString(0)).toSet ==
      Set("image/x-pgm", "audio/wav", "application/pdf", "audio/ogg"))
  }

  test("vec_hard_negatives never returns the anchor's own label") {
    val rows = run("vec_hard_negatives").collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getInt(1) != r.getInt(3),
      s"anchor ${r.getLong(0)} negative shares label"))
  }

  test("vec_cluster_stats: sizes sum to the non-centroid corpus; min <= mean <= 1") {
    val rows = run("vec_cluster_stats").collect()
    val n = rows.map(_.getLong(1)).sum
    val corpus = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") >= 8).count()
    assert(n == corpus)
    rows.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-12
        && r.getDouble(2) <= 1.0 + 1e-12)
    }
  }

  test("ts_interval_union: covered time positive and islands <= intervals") {
    val rows = run("ts_interval_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "more islands than intervals")
      assert(r.getLong(3) >= 0L)
    }
  }

  test("ts_downsample_lttb: one pick per day; edge days pick their endpoints") {
    val rows = run("ts_downsample_lttb").collect()
    // timestamp_ntz surfaces as LocalDateTime in Row
    def ldt(r: org.apache.spark.sql.Row, i: Int) =
      r.getAs[java.time.LocalDateTime](i)
    val days = rows.map(ldt(_, 0)).distinct
    assert(rows.length == days.length, "duplicate day picks")
    // first day's pick is its first hour
    val first = rows.minBy(r => ldt(r, 0).toString)
    assert(ldt(first, 1) == ldt(first, 0),
      s"first-day pick ${ldt(first, 1)} != day start")
  }

  test("join_null_safe_eq: the NULL bucket exists and joins itself exactly") {
    val rows = run("join_null_safe_eq").collect()
    val nullRow = rows.find(_.isNullAt(0))
    assert(nullRow.isDefined, "derived NULL bucket missing")
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"bucket ${r.get(0)}: joined ${r.getLong(1)} != dim ${r.getLong(2)}"))
  }

  test("src_schema_evolution: NULL-priority census equals the old-generation rows") {
    val rows = run("src_schema_evolution").collect()
    val nullN = rows.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse(0L)
    val evens = Tables.orders(spark, sf0001)
      .filter(col("o_orderkey") % 2 === 0).count()
    assert(nullN == evens, s"$nullN null-priority rows vs $evens old-gen")
  }

  test("sql_q3_shipping: 10 rows in strict revenue-desc order") {
    val rows = run("sql_q3_shipping").collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("win_forward_fill: non-error rows keep their value; filled never null after a good row") {
    val rows = run("win_forward_fill").collect()
    rows.foreach { r =>
      if (r.getString(2) != "error")
        assert(r.getDouble(3) == r.getDouble(4),
          s"event ${r.getLong(0)}: non-error value changed")
    }
  }

  test("ml_nested_subsamples: cumulative counts are monotone and end at the corpus size") {
    val rows = run("ml_nested_subsamples").collect().sortBy(_.getDouble(0))
    val docs = Tables.documents(spark, sf0001).count()
    assert(rows.last.getLong(2) == docs)
    val cums = rows.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b })
  }

  test("text_lang_confusion: per-actual fractions sum to 1") {
    val sums = run("text_lang_confusion")
      .groupBy("actual_lang").agg(sum(col("frac_of_actual")).as("p"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("win_time_range_frame: every event counts at least itself in its trailing hour") {
    val rows = run("win_time_range_frame").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 1L))
  }
}
