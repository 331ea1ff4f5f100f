package graft

import graft.queries.{Aggs, Approx, Multimodal, TimeSeries}
import org.apache.spark.sql.functions._

/** Invariants for the round-4 (third batch) operators — semantic claims the
  * DuckDB value compare can't express: sketch ε-bounds, brute-force window
  * equivalence, manifest reassembly. */
class Round6OpsSpec extends SparkSpec {

  test("agg_approx_quantile: GK sketch within rank-accuracy of the exact percentile") {
    val rows = Approx.aggApproxQuantile.build(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // accuracy 1e4 on ~2k rows/group → sketch is rank-exact; allow the
      // interpolation gap between the exact (interpolated) percentile and
      // the sketch's nearest data point: bounded by the local value spacing,
      // generously 5% of the value scale here
      val (p50a, p90a, p50e, p90e) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(p50a - p50e) <= math.max(1.0, 0.05 * math.abs(p50e)),
        s"${r.getString(0)}: p50 $p50a vs $p50e")
      assert(math.abs(p90a - p90e) <= math.max(1.0, 0.05 * math.abs(p90e)),
        s"${r.getString(0)}: p90 $p90a vs $p90e")
    }
  }

  test("ts_conversion_window: matches brute-force pair counting") {
    val out = TimeSeries.tsConversionWindow.build(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    def micros(v: Any): Long = {
      val t = v.asInstanceOf[java.time.LocalDateTime]
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    }
    val ev = graft.util.Tables.events(spark, sf0001)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), micros(r.get(2)), r.getString(3)))
    val byUser = ev.groupBy(_._2)
    ev.filter(_._4 == "view").foreach { case (eid, uid, us, _) =>
      val expected = byUser(uid).count { case (_, _, cus, ct) =>
        ct == "click" && cus > us && cus <= us + 300000000L
      }
      assert(out(eid) == expected.toLong, s"view $eid: ${out(eid)} vs $expected")
    }
  }

  test("ts_changepoint: reported shift really is the 4v4 mean gap at that row") {
    val out = TimeSeries.tsChangepoint.build(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (before, after, shift) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(shift) > 60.0)
      assert(math.abs((after - before) - shift) < 1e-9 + 5e-5) // 4dp rounding slack
    }
  }

  test("ts_autocorr: |corr| <= 1 and pair counts match group sizes - 1") {
    val out = TimeSeries.tsAutocorr.build(spark, sf0001)
    assert(out.filter(abs(col("lag1_corr")) > 1.0001).count() == 0)
    val sizes = graft.util.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val bad = out.join(sizes, Seq("user_id"))
      .filter(col("n_pairs") =!= col("n") - 1).count()
    assert(bad == 0)
  }

  test("agg_topk_listagg: every group emits at most 3 names, rank-ordered by balance") {
    val out = Aggs.aggTopkListagg.build(spark, sf0001).collect()
    out.foreach { r =>
      val names = r.getString(1).split(",")
      assert(names.length == r.getLong(2) && names.length <= 3)
      assert(names.distinct.length == names.length)
    }
  }

  test("mm_chunk_manifest: chunks tile each payload exactly and hashes match content") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Multimodal.mmChunkManifest.build(spark, sf0001).collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.filter(_._2.nonEmpty).keySet)
    byDoc.foreach { case (id, chunks) =>
      val text = docs(id)
      val sorted = chunks.sortBy(_.getLong(1))
      // offsets tile: 0, 100, 200, ...; lengths sum to payload length
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i && c.getLong(2) == i * 100L)
      }
      assert(sorted.map(_.getLong(3)).sum == text.length.toLong)
      // content-addressing: md5 of the actual byte range
      sorted.foreach { c =>
        val off = c.getLong(2).toInt
        val len = math.min(100, text.length - off)
        val slice = text.substring(off, off + len)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(md == c.getString(4))
      }
    }
  }
}
