package graft

import graft.queries.{Aggs, Approx, Multimodal, TimeSeries}
import org.apache.spark.sql.functions._

/** Invariants for the round-4 (third batch) operators — semantic claims the
  * DuckDB value compare can't express: sketch ε-bounds, brute-force window
  * equivalence, manifest reassembly. */
class Round6OpsSpec extends SparkSpec {

  test("agg_approx_quantile: GK sketch within rank-accuracy of the exact percentile at every SF") {
    // group sizes span ~200 → 20k rows across the three SFs — the sketch's
    // rank-accuracy claim must hold at each (r4 verdict #5). Since round 13
    // the rank band IS the graded row (p50_within/p90_within: approx p50
    // inside exact [p45, p55], p90 inside [p85, p95], oracle-matched
    // against literal TRUE); this pins the same contract at the two SFs
    // the driver's t2 does not run.
    allSfs.foreach { sf =>
      val out = Approx.aggApproxQuantile.build(spark, sf)
      assert(out.count() > 0)
      assert(out.filter(!org.apache.spark.sql.functions.col("p50_within")
          || !org.apache.spark.sql.functions.col("p90_within")).count() == 0,
        s"$sf: a GK percentile left its rank band")
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

  test("agg_moments: matches direct double-precision moment computation to 3dp") {
    // the decimal power sums must agree with a plain per-group computation
    // (tolerance: the reference here is double arithmetic, so allow the
    // accumulated-error gap, not bit equality — bit equality vs DuckDB is
    // the parity gate's job)
    val out = Aggs.aggMoments.build(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val raw = graft.util.Tables.events(spark, sf0001)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    raw.foreach { case (tpe, vs) =>
      val n = vs.length.toDouble
      val mean = vs.sum / n
      val m2 = vs.map(v => (v - mean) * (v - mean)).sum / n
      val m3 = vs.map(v => math.pow(v - mean, 3)).sum / n
      val m4 = vs.map(v => math.pow(v - mean, 4)).sum / n
      val (gmean, gm2, gskew, gkurt) = out(tpe)
      assert(math.abs(gmean - mean) < 1e-3)
      assert(math.abs(gm2 - m2) < 1e-2 * math.max(1.0, m2.abs))
      assert(math.abs(gskew - m3 / math.pow(m2, 1.5)) < 1e-3)
      assert(math.abs(gkurt - (m4 / (m2 * m2) - 3.0)) < 1e-3)
    }
  }

  test("text_chunk_dedup: every reported chunk hash really occurs more than once") {
    val out = graft.queries.TextOps.textChunkDedup.build(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 1 && r.getLong(2) <= r.getLong(1))
    }
    // recount one chunk hash by brute force
    val probe = out.head
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
    val n = docs.iterator.map { d =>
      val tk = d.getString(1).split(" ", -1)
      (0 to (tk.length - 8) / 4).count { j =>
        val slice = tk.slice(j * 4, j * 4 + 8).mkString(" ")
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        md == probe.getString(0)
      }
    }.sum
    assert(n.toLong == probe.getLong(1))
  }

  test("vec_cosine_histogram: bins cover exactly n*(n-1)/2 pairs") {
    val out = graft.queries.Vectors.vecCosineHistogram.build(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 100).count()
    assert(out.map(_.getLong(1)).sum == n * (n - 1) / 2)
    out.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 20))
  }

  test("winnow fingerprint window positions: a 7-char doc emits zero windows") {
    // regression: greatest(len-7, 0) let sequence(1,0) step backward and
    // the p <= len-7 filter kept the bogus p=0 row at exactly len==7
    import spark.implicits._
    val probe = Seq((1L, "exactly"), (2L, "12345678"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = probe
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          greatest(length(col("text")) - 7, lit(1)))).as("p"))
      .filter(col("p") <= length(col("text")) - 7)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(out.toSeq == Seq((2L, 1))) // only the 8-char doc, one window
  }

  test("Ops.asofNearest: NULL-key left rows never match NULL-key right rows") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val t5 = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
    val left = Seq((Option(1L), t), (Option.empty[Long], t))
      .toDF("k", "at")
    val right = Seq((Option(1L), t5), (Option.empty[Long], t5))
      .toDF("rk", "rat")
    val out = graft.ops.Ops.asofNearest(left, col("k"), col("at"),
        right, col("rk"), col("rat"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(2)))).toMap
    assert(out(Some(1L)).isDefined, "keyed row must match its signup")
    assert(out(None).isEmpty, "NULL-key row must get NULL, not a NULL-key match")
  }

  test("win_streaks: matches brute-force longest-run computation") {
    def micros(v: Any): Long = {
      val t = v.asInstanceOf[java.time.LocalDateTime]
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    }
    val out = graft.queries.Windows.winStreaks.build(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val ev = graft.util.Tables.events(spark, sf0001)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), micros(r.get(2)), r.getLong(3)))
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2)
      // brute force: longest run per type, max tie -> lexicographically first type
      val runs = scala.collection.mutable.Map.empty[String, Int]
      var cur = 1
      seq.indices.foreach { i =>
        if (i > 0 && seq(i) == seq(i - 1)) cur += 1 else cur = 1
        runs(seq(i)) = math.max(runs.getOrElse(seq(i), 0), cur)
      }
      val best = runs.values.max
      val bestType = runs.filter(_._2 == best).keys.min
      assert(out(uid) == (best.toLong, bestType),
        s"user $uid: got ${out(uid)}, want ($best, $bestType)")
    }
  }

  test("ts_attribution: last_view strictly precedes the purchase; first_view <= last_view") {
    val out = graft.queries.TimeSeries.tsAttribution.build(spark, sf0001).collect()
    assert(out.nonEmpty)
    def us(v: Any): Long = {
      val t = v.asInstanceOf[java.time.LocalDateTime]
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    }
    out.foreach { r =>
      val pts = us(r.get(2))
      val ft = Option(r.get(3)).map(us)
      val lt = Option(r.get(4)).map(us)
      ft.foreach(f => assert(f < pts))
      lt.foreach(l => assert(l < pts))
      // first view is never later than the last view before purchase
      (ft, lt) match {
        case (Some(f), Some(l)) => assert(f <= l)
        case (Some(_), None) => fail(s"purchase ${r.getLong(0)}: first without last")
        case _ => ()
      }
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

  // ---- parameterized vector tier, second parameter points (r5 verdict #4)

  test("pqQuantize: finer subspaces (m=8) never increase reconstruction error vs m=4") {
    // per-block argmin over the SAME 16 codewords is more flexible on
    // smaller blocks: err_8 <= err_4 holds per vector, mathematically
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def errs(m: Int, subDim: Int) =
      graft.ops.Ops.pqQuantize(emb, col("vec_id"), col("embedding"),
          m = m, subDim = subDim, numSeeds = 16)
        .select("vec_id", "pq_err").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val e4 = errs(4, 16)
    val e8 = errs(8, 8)
    assert(e4.keySet == e8.keySet)
    e8.foreach { case (id, e) =>
      assert(e <= e4(id) + 1e-9, s"vec $id: err m=8 $e > err m=4 ${e4(id)}")
    }
  }

  test("pqAdcTopK: finer codebook (m=8) recalls at least as much of the exact L2 top-10 as m=4") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // exact squared-L2 top-10 of query 0, brute-forced in test code
    val vecs = emb
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val q = vecs(0L)
    def l2(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    val exact = vecs.view.filterKeys(_ != 0L).toSeq
      .map { case (id, v) => (id, l2(q, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    def top(m: Int, subDim: Int) =
      graft.ops.Ops.pqAdcTopK(emb, col("vec_id"), col("embedding"),
        queryId = 0, k = 10, m = m, subDim = subDim, numSeeds = 16).collect()
    val t8 = top(8, 8)
    assert(t8.length == 10)
    val d8 = t8.map(_.getDouble(1))
    assert(d8.sameElements(d8.sorted), "ADC top-10 not ascending by distance")
    assert(d8.forall(_ >= 0.0), "squared ADC distance must be non-negative")
    val r8 = (t8.map(_.getLong(0)).toSet intersect exact).size
    val r4 = (top(4, 16).map(_.getLong(0)).toSet intersect exact).size
    // deterministic fixture: measured recall@10 is 4 (m=8) vs 2 (m=4) —
    // halving the subspace width with the same 16 codewords tightens the
    // ADC metric, and the floor below catches a broken LUT/codes join
    assert(r8 >= r4, s"finer codebook recall $r8 < coarser $r4")
    assert(r8 >= 3, s"m=8 recall@10 $r8 < 3")
  }

  test("ivfTopK probing ALL cells recovers the exact cosine top-10") {
    val exact = graft.queries.Registry.byName("vec_cosine_topk")
      .build(spark, sf0001).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val all = graft.queries.Approx
      .ivfTopK(spark, sf0001, nCells = 8, nProbes = 8, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect all).size.toDouble / exact.size
    assert(recall >= 0.9,
      s"probe-all IVF recall $recall < 0.9 (exact=$exact ivf=$all)")
  }

  test("kmeansStep at k=4: membership conserves the corpus and clusters are seeded ids") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val n = emb.count()
    val out = graft.ops.Ops.kmeansStep(emb, col("vec_id"), col("embedding"),
      k = 4).collect()
    val clusters = out.map(_.getLong(0)).toSet
    assert(clusters.subsetOf(Set(0L, 1L, 2L, 3L)))
    // every (cluster, dim) cell exists for dims 1..64 and n_members is
    // constant within a cluster
    val byCluster = out.groupBy(_.getLong(0))
    byCluster.foreach { case (c, rows) =>
      assert(rows.map(_.getLong(1)).toSet == (1L to 64L).toSet)
      assert(rows.map(_.getLong(2)).distinct.length == 1,
        s"cluster $c has varying n_members across dims")
    }
    // fixing any dim, the cluster member counts partition the corpus
    val dim1 = out.filter(_.getLong(1) == 1L)
    assert(dim1.map(_.getLong(2)).sum == n)
  }
}
