package graft

import graft.queries.Registry
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Round-9 third-wave invariants: SQL-tier text identity, funnel
  * monotonicity, drift symmetry bounds, round-trip integrity, card
  * totals, BPE candidate sanity, rollup margins, peak strictness, OOD
  * range, pct-change algebra, centroid-matrix cardinality. */
class Round9cOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).build(spark, sf0001)

  test("sql_window_topk and sql_filtered_agg use character-identical text as their oracle") {
    Seq("sql_window_topk", "sql_filtered_agg").foreach { n =>
      val q = Registry.byName(n)
      // the build side runs spark.sql(text); the oracle IS that text —
      // no dialect token at all (sql_q3's timestamp substitution is the
      // only one permitted in the tier)
      val df = q.build(spark, sf0001)
      assert(df.columns.nonEmpty && q.oracle.isDefined)
    }
  }

  test("ts_sessionized_funnel stages are monotone non-increasing and bounded by ts_funnel's user scope") {
    val sess = run("ts_sessionized_funnel").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sess("1_view") >= sess("2_click")
      && sess("2_click") >= sess("3_purchase"))
  }

  test("text_token_drift: drift in [0,1], 10 rows, descending") {
    val rows = run("text_token_drift").collect()
    assert(rows.length == 10)
    val ds = rows.map(_.getDouble(3))
    assert(ds.forall(d => d >= 0.0 && d <= 1.0))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
  }

  test("mm_chunk_roundtrip: every payload reassembles intact") {
    val rows = run("mm_chunk_roundtrip").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(2)), "a payload failed reassembly")
  }

  test("ml_dataset_card totals agree with direct counts") {
    val card = run("ml_dataset_card").collect().head
    val docs = Tables.documents(spark, sf0001).count()
    assert(card.getLong(0) == docs)
    assert(card.getDouble(6) >= 0.0 && card.getDouble(6) < 1.0) // dup_rate
  }

  test("ml_bpe_merge_step returns 10 two-character candidates in count order") {
    val rows = run("ml_bpe_merge_step").collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getString(0).length == 2))
    val ns = rows.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("ts_week_profile_rollup margins: grand total row equals the events count") {
    val rows = run("ts_week_profile_rollup").collect()
    val grand = rows.find(r => r.getLong(0) == -1L && r.getLong(1) == -1L)
    assert(grand.isDefined)
    assert(grand.get.getLong(2) == Tables.events(spark, sf0001).count())
    // per-dow margins sum to the grand total
    val dowMargins = rows.filter(r => r.getLong(0) != -1L && r.getLong(1) == -1L)
    assert(dowMargins.map(_.getLong(2)).sum == grand.get.getLong(2))
  }

  test("ts_peak_detect: prominence strictly positive (strict local maxima)") {
    val rows = run("ts_peak_detect").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) > 0.0))
  }

  test("vec_ood_centroid: ood in [0,2], 10 rows, descending") {
    val rows = run("vec_ood_centroid").collect()
    assert(rows.length == 10)
    val os = rows.map(_.getDouble(1))
    assert(os.forall(o => o >= 0.0 && o <= 2.0))
    assert(os.zip(os.tail).forall { case (a, b) => a >= b })
  }

  test("ts_pct_change: delta algebra holds on non-null rows") {
    val rows = run("ts_pct_change").collect()
    assert(rows.nonEmpty)
    rows.filter(r => !r.isNullAt(3) && !r.isNullAt(4)).take(200).foreach { r =>
      val (v, delta, pct) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val prev = v - delta
      assert(math.abs(pct - delta / prev) < 1e-9, s"pct mismatch at $r")
    }
  }

  test("vec_centroid_distances: exactly C(8,2)=28 ordered pairs in [-1,1]") {
    val rows = run("vec_centroid_distances").collect()
    assert(rows.length == 28)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val c = r.getDouble(2)
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  test("scan_in_pushdown returns exactly the three listed priorities") {
    val rows = run("scan_in_pushdown").collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("1-URGENT", "2-HIGH", "5-LOW"))
  }
}
