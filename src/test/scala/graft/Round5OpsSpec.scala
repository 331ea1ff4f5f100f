package graft

import graft.queries.{Joins, MlPrep, TextOps, TimeSeries, Vectors, Windows}
import org.apache.spark.sql.functions._

/** Invariants for the round-4 (second batch) operators, run at sf0.001 —
  * parity with DuckDB is the value-level gate; these pin the SEMANTIC
  * claims the oracle compare can't express (equivalence to the unsalted
  * join, funnel monotonicity, packing conservation, quantization bounds,
  * Lloyd-step mass conservation).
  */
class Round5OpsSpec extends SparkSpec {

  test("join_skew_salted: identical to the plain unsalted join") {
    val salted = Joins.joinSkewSalted.build(spark, sf0001).collect()
    val plain = graft.util.Tables.orders(spark, sf0001)
      .join(graft.util.Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.util.D.sumDec(col("l_extendedprice")).as("revenue"))
      .orderBy("o_orderpriority").collect()
    assert(salted.map(_.toString).toSeq == plain.map(_.toString).toSeq)
  }

  test("join_skew_salted: every lineitem row survives exactly once (salt bijection)") {
    val n = Joins.joinSkewSalted.build(spark, sf0001)
      .agg(sum("n_items")).collect()(0).getLong(0)
    val expected = graft.util.Tables.lineitem(spark, sf0001)
      .join(graft.util.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(n == expected)
  }

  test("ts_funnel: stage survivor counts are monotone non-increasing") {
    val rows = TimeSeries.tsFunnel.build(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("1_view") >= rows.getOrElse("2_click", 0L))
    assert(rows.getOrElse("2_click", 0L) >= rows.getOrElse("3_purchase", 0L))
  }

  test("ts_anomaly_mad: flagged rows really sit beyond the 3-sigma MAD fence") {
    val out = TimeSeries.tsAnomalyMad.build(spark, sf0001).collect()
    assert(out.nonEmpty, "fixture should contain MAD outliers")
    out.foreach { r =>
      val (v, med, mad) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(v - med) > 3.0 * 1.4826 * mad)
    }
  }

  test("ts_ewma: equal-weight limit check — ewma of a constant series is the constant") {
    // algebraic invariant: numerator/denominator share the weight vector,
    // so any user whose values are all equal must get ewma == that value
    import spark.implicits._
    val rows = TimeSeries.tsEwma.build(spark, sf0001)
      .groupBy("user_id")
      .agg(countDistinct("value").as("nv"), countDistinct("ewma").as("ne"),
        min("value").as("v"), min("ewma").as("e"))
      .filter($"nv" === 1).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == 1L && math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-9)
    }
  }

  test("win_running_distinct: final running count equals the user's exact distinct-type count") {
    val out = Windows.winRunningDistinct.build(spark, sf0001)
    val last = out.groupBy("user_id").agg(max("n_distinct_types").as("got"))
    val exact = graft.util.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(countDistinct("event_type").as("want"))
    val bad = last.join(exact, Seq("user_id"))
      .filter(col("got") =!= col("want")).count()
    assert(bad == 0)
  }

  test("ml_pack_sequences: packing conserves tokens and bins fill sequentially") {
    val out = MlPrep.mlPackSequences.build(spark, sf0001).collect()
    // conservation: sum of n_tokens == corpus total
    val total = out.map(_.getLong(2)).sum
    val expected = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(sum(size(split(col("text"), " ", -1)))).collect()(0).getLong(0)
    assert(total == expected)
    // per source: bin ids are non-decreasing in doc order, offsets < 512
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(0))
      assert(ordered.map(_.getLong(3)).sliding(2).forall(p => p.head <= p.last))
      assert(ordered.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 512))
    }
  }

  test("ml_dataset_mix: selection is the md5-threshold set, rates in (0, 1]") {
    val out = MlPrep.mlDatasetMix.build(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(2) > 0.0 && r.getDouble(2) <= 1.0))
    // determinism: rebuilding gives the identical selection
    val again = MlPrep.mlDatasetMix.build(spark, sf0001).collect()
    assert(out.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("vec_scalar_quantize: mse bounded by one grid cell^2 (codes round DOWN)") {
    val out = Vectors.vecScalarQuantize.build(spark, sf0001).collect()
    out.foreach { r =>
      val (mn, mx, ppm) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val cell = (mx - mn) / 255.0
      // floor-grid error is in [0, cell); mse <= cell^2
      assert(ppm >= 0.0 && ppm <= cell * cell * 1e6 + 1e-6,
        s"vec ${r.getLong(0)}: mse_ppm $ppm vs cell^2 ${cell * cell * 1e6}")
    }
  }

  test("vec_kmeans_step: every vector assigned once — member mass conserved") {
    val out = Vectors.vecKmeansStep.build(spark, sf0001)
    val nVecs = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    // each (cluster, dim) row carries the cluster size; summing one dim's
    // rows over all clusters must give the total vector count
    val massPerDim = out.groupBy("dim").agg(sum("n_members").as("m"))
      .select("m").distinct().collect()
    assert(massPerDim.length == 1 && massPerDim(0).getLong(0) == nVecs)
  }

  test("text_contamination: src0 benchmark docs never appear as candidates") {
    val out = TextOps.textContamination.build(spark, sf0001)
    val benchIds = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("source") === "src0").select("doc_id")
    assert(out.join(benchIds, Seq("doc_id"), "left_semi").count() == 0)
  }

  test("text_blocklist_filter: redaction removes exactly the counted hits") {
    val out = TextOps.textBlocklistFilter.build(spark, sf0001)
      .withColumn("left_over",
        size(expr("filter(split(redacted, ' ', -1), t -> t IN ('slow','error','big'))")))
    assert(out.filter(col("left_over") > 0).count() == 0)
    // flag threshold honored both directions
    assert(out.filter(col("flagged") && col("hit_ratio") <= 0.1).count() == 0)
  }

  test("text_repetition_stats: fractions in (0,1], uniq_frac=1 iff max_bigram_n=1") {
    val out = TextOps.textRepetitionStats.build(spark, sf0001).collect()
    out.foreach { r =>
      val (nb, mx, top, uniq) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(top > 0 && top <= 1.0 && uniq > 0 && uniq <= 1.0)
      assert((uniq == 1.0) == (mx == 1L), s"doc ${r.getLong(0)}: $nb/$mx/$uniq")
    }
  }

  test("text_keyword_topk: per-doc scores are non-increasing in rank") {
    val out = TextOps.textKeywordTopk.build(spark, sf0001).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.sliding(2).forall(p => p.length < 2 || p.head >= p.last))
    }
  }

  test("vec_pq_quantize: seeds self-code with zero error; codes in codebook range") {
    val out = Vectors.vecPqQuantize.build(spark, sf0001).collect()
    assert(out.length == graft.util.Tables.embeddings(spark, sf0001).count())
    out.foreach { r =>
      val codes = (1 to 4).map(r.getLong)
      assert(codes.forall(c => c >= 0 && c < 16), s"code out of range: $r")
      assert(r.getDouble(5) >= 0.0, s"negative reconstruction error: $r")
    }
    // the codebook vectors must reconstruct themselves exactly
    out.filter(_.getLong(0) < 16).foreach { r =>
      assert((1 to 4).forall(i => r.getLong(i) == r.getLong(0)), s"seed mis-coded: $r")
      assert(r.getDouble(5) == 0.0, s"seed with nonzero error: $r")
    }
    // encoding must beat (or tie) a FIXED arbitrary codeword assignment:
    // per-subspace argmin error <= distance to codeword 0 everywhere
    import org.apache.spark.sql.functions._
    graft.functions.L2Sq.register(spark)
    val v = graft.util.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), graft.util.V.dbl(col("embedding")).as("e"))
    val c0 = v.filter(col("vec_id") === 0).select(col("e").as("cw"))
    val fixedErr = v.crossJoin(broadcast(c0))
      .select(col("vec_id"), expr("l2sq_native(e, cw)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // tolerance covers pq_err's round(...,6) granularity (5e-7), which can
    // push an exact-tie case above the unrounded reference
    out.foreach { r =>
      assert(r.getDouble(5) <= fixedErr(r.getLong(0)) + 1e-6,
        s"PQ error exceeds trivial single-codeword assignment: $r")
    }
  }

  test("vec_pq_adc_topk: ADC distance equals L2² to the PQ reconstruction") {
    val emb = graft.util.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
      .toMap
    val q = emb(0L)
    val codes = Vectors.vecPqQuantize.build(spark, sf0001).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toArray).toMap
    val top = Vectors.vecPqAdcTopk.build(spark, sf0001).collect()
    assert(top.length == 10)
    // non-decreasing distances and the identity: adc_d2 == |q - recon|²
    // where recon concatenates the coded codeword sub-vectors
    val ds = top.map(_.getDouble(1))
    assert(ds.sliding(2).forall(p => p.length < 2 || p.head <= p.last))
    top.foreach { r =>
      val (vid, adc) = (r.getLong(0), r.getDouble(1))
      val recon = (0 until 4).flatMap { s =>
        emb(codes(vid)(s)).slice(s * 16, s * 16 + 16)
      }
      val exact = q.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(adc - exact) < 1e-5,
        s"vec $vid: adc $adc vs reconstruction L2² $exact")
    }
  }
}
