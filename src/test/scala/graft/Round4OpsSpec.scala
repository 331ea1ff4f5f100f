package graft

import graft.queries.{Aggs, Fns, Joins, MlPrep, Multimodal, TextOps, Vectors, Windows}
import org.apache.spark.sql.functions._

/** Invariants for the round-4 operators, run at sf0.001 (fast) — parity
  * with DuckDB is the value-level gate; these pin the SEMANTIC claims the
  * oracle compare can't express (recall guarantees, argmax correctness,
  * conservation laws, determinism). */
class Round4OpsSpec extends SparkSpec {

  test("text_simhash_band_pairs: banding has 100% recall at hamming <= 3 (pigeonhole)") {
    // exact hamming <= 3 pairs among capped docs, computed from the same
    // 32-bit signatures via brute force — every one must appear in the
    // banded output (pigeonhole: 4 bands, <= 3 flipped bits, one band intact)
    val out = TextOps.textSimhashBandPairs.build(spark, sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0).distinct()
      .select(col("doc_id"), substring(md5(col("tok")), 1, 8).as("h8"))
      .select(col("doc_id"), col("h8"), explode(sequence(lit(0), lit(31))).as("p"))
      .select(col("doc_id"), col("p"),
        expr("((instr('0123456789abcdef', substring(h8, 1 + p div 4, 1)) - 1) >> (p % 4)) & 1").as("bit"))
      .groupBy("doc_id", "p").agg(sum(col("bit") * 2 - 1).as("s"))
      .groupBy("doc_id")
      .agg(sum(expr("shiftleft(CAST(CASE WHEN s >= 0 THEN 1 ELSE 0 END AS BIGINT), p)")).as("sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      if java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (d1, d2)
    assert(exact.toSet.subsetOf(out), s"banding missed ${(exact.toSet -- out).take(5)}")
    // and the output IS exactly the <= 3 set (verify stage filters the rest)
    assert(out == exact.toSet)
  }

  test("join_asof_nearest: matches brute-force nearest signup on every event") {
    val ev = graft.util.Tables.events(spark, sf0001)
    // timestamp_ntz rows surface as LocalDateTime
    def micros(v: Any): Long = {
      val t = v.asInstanceOf[java.time.LocalDateTime]
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
    }
    val out = Joins.joinAsofNearest.build(spark, sf0001)
      .collect().map(r => (r.getLong(0), Option(r.get(3)).map(micros))).toMap
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id", "ts").distinct().collect()
      .map(r => (r.getLong(0), micros(r.get(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val events = ev.select("event_id", "user_id", "ts").collect()
    events.foreach { r =>
      val (eid, uid) = (r.getLong(0), r.getLong(1))
      val eUs = micros(r.get(2))
      val cands = signups.getOrElse(uid, Array.empty[Long])
      val got = out(eid)
      if (cands.isEmpty) assert(got.isEmpty, s"event $eid expected null")
      else {
        // equidistant ties -> earlier signup: bias forward gaps up by 1
        val best = cands.minBy(c =>
          (math.abs(c - eUs) * 2 + (if (c > eUs) 1 else 0), c))
        assert(got.isDefined && got.get == best,
          s"event $eid: got ${got.get} expected $best")
      }
    }
  }

  test("vec_centroid_assign: assignment is the true argmax over all centroids") {
    val out = Vectors.vecCentroidAssign.build(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val cents = emb.filter(_._1 < 8)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.round(d / (math.sqrt(na) * math.sqrt(nb)) * 1e4) / 1e4
    }
    val byId = emb.toMap
    out.foreach { case (vid, cid, sim) =>
      val v = byId(vid)
      val best = cents.map { case (c, ce) => (cos(v, ce), c) }
        .maxBy { case (s, c) => (s, -c) }
      assert(best._2 == cid && math.abs(best._1 - sim) < 1e-9,
        s"vec $vid: got ($cid, $sim) expected $best")
    }
  }

  test("ml_reservoir_group: exactly min(5, group size) rows per source, deterministic") {
    val out = MlPrep.mlReservoirGroup.build(spark, sf0001)
    val sizes = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (src, n) =>
      assert(got.getOrElse(src, 0L) == math.min(5L, n)) }
    // deterministic: a second run picks the identical sample
    val a = out.collect().map(_.toSeq).toSeq
    val b = MlPrep.mlReservoirGroup.build(spark, sf0001).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("ml_class_weights: weighted counts conserve the total (sum n*w == N)") {
    val out = MlPrep.mlClassWeights.build(spark, sf0001).collect()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    val sum = out.map(r => r.getLong(1) * r.getDouble(2)).sum
    assert(math.abs(sum - n) < 1e-6, s"sum(n*w) = $sum != $n")
  }

  test("text_edit_distance_pairs: distance is symmetric-consistent and sim in [0,1]") {
    val out = TextOps.textEditDistancePairs.build(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val sim = r.getDouble(3)
      assert(sim >= 0.0 && sim <= 1.0)
      assert(r.getLong(2) >= 0)
    }
    // spot-check one pair against the Levenshtein definition via a known case
    val d = spark.sql("SELECT levenshtein('kitten', 'sitting')").head().getInt(0)
    assert(d == 3)
  }

  test("text_trigram_profile: per-lang ranks are 1..3 with non-increasing counts") {
    val out = TextOps.textTrigramProfile.build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4).toSeq
      assert(sorted.map(_._4) == (1L to sorted.size).toSeq)
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._3 >= b._3; case _ => true })
    }
  }

  test("agg_weighted_stats: weighted mean lies within [min, max] price per flag") {
    val out = Aggs.aggWeightedStats.build(spark, sf0001).collect()
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("mn"), max("l_extendedprice").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out.foreach { r =>
      val (mn, mx) = li(r.getString(0))
      val wavg = r.getDouble(4)
      assert(wavg >= mn && wavg <= mx)
    }
  }

  test("win_ratio_to_report: shares sum to 1 per segment") {
    val out = Windows.winRatioToReport.build(spark, sf0001)
    val sums = out.groupBy("c_mktsegment").agg(sum("share").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("mm_payload_dedup: copy counts conserve the corpus; canonicals are real docs") {
    val out = Multimodal.mmPayloadDedup.build(spark, sf0001)
    val total = out.agg(sum("n_copies")).head().getLong(0)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(total == docs.count())
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    out.select("canonical_doc").collect().foreach(r => assert(ids(r.getLong(0))))
  }

  test("fn_binary_codec: every round-trip boolean is true on the ASCII fixtures") {
    val out = Fns.fnBinaryCodec.build(spark, sf0001)
    assert(out.filter(!col("b64_rt_ok") || !col("hex_rt_ok")).count() == 0)
  }

  test("agg_hll_sketch_merge: merged and direct estimates within 5% of exact at every SF") {
    // the ε envelope must hold wherever the parity gate runs, not at one
    // cherry-picked scale (r4 verdict #5): cardinalities span 200 → 20k.
    // Since round 13 the 5% band IS the graded row (merged_within_eps /
    // direct_within_eps, oracle-matched against literal TRUE); this pins
    // the same contract at the two SFs the driver's t2 does not run.
    // (NOT asserting merged == direct: the union promotes the sketch's
    // internal mode — sparse/set → dense HLL — so the two estimates may
    // differ by a few counts even at equal lgK.)
    allSfs.foreach { sf =>
      val out = graft.queries.Approx.aggHllSketchMerge.build(spark, sf)
      assert(out.count() > 0)
      assert(out.filter(!col("merged_within_eps") || !col("direct_within_eps"))
        .count() == 0, s"$sf: a sketch estimate left the 5% ε band")
    }
  }
}
