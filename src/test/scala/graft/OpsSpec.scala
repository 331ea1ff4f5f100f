package graft

import graft.ops.Ops
import org.apache.spark.sql.functions._

/** The user-facing Ops API must be generic: these tests run every transform
  * on in-memory frames with schemas UNLIKE the fixtures (different column
  * names, keys, types), so delegation from the graded queries can't quietly
  * re-specialize it. */
class OpsSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  test("exactDedup keeps the lowest-order row per content key on an arbitrary schema") {
    import spark.implicits._
    val df = Seq(
      (10L, "aaa", "x"), (11L, "aaa", "y"), (12L, "bbb", "z"), (13L, "aaa", "w"))
      .toDF("rid", "payload", "extra")
    val out = Ops.exactDedup(df, md5(col("payload")), col("rid"))
      .select("rid", "payload").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((10L, "aaa"), (12L, "bbb")))
  }

  test("reservoirPerGroup emits min(k, group size) rows and is insensitive to input order") {
    import spark.implicits._
    val rows = (1L to 30L).map(i => (s"g${i % 3}", i))
    val a = Ops.reservoirPerGroup(rows.toDF("grp", "rid"), col("grp"), col("rid"), 4)
    val b = Ops.reservoirPerGroup(scala.util.Random.shuffle(rows).toDF("grp", "rid"),
      col("grp"), col("rid"), 4)
    assert(a.count() == 12)
    assert(a.select("grp", "rid", "rk").collect().map(_.toSeq).toSet ==
      b.select("grp", "rid", "rk").collect().map(_.toSeq).toSet)
  }

  test("tokenChunks tiles an arbitrary text column with the configured stride") {
    import spark.implicits._
    val df = Seq((1L, (1 to 100).map(i => s"t$i").mkString(" "))).toDF("k", "body")
    val out = Ops.tokenChunks(df, col("k"), col("body"), chunkSize = 10, stride = 7)
      .orderBy("chunk_no").collect()
    // starts 1,8,15,...,99 -> 15 chunks; sizes min(10, 100 - start + 1)
    assert(out.length == 15)
    assert(out.map(_.getLong(1)).toSeq == (0L until 15L))
    val expectedSizes = (0 until 15).map(k => math.min(10, 100 - (1 + 7 * k) + 1).toLong)
    assert(out.map(_.getLong(2)).toSeq == expectedSizes)
  }

  test("cosineTopK returns the true top-k on a small hand-checked set") {
    import spark.implicits._
    val df = Seq(
      (100L, Array(1.0f, 0.0f)), (101L, Array(1.0f, 0.1f)),
      (102L, Array(0.0f, 1.0f)), (103L, Array(-1.0f, 0.0f)))
      .toDF("id", "v")
    val out = Ops.cosineTopK(df, col("id"), col("v"), queryId = 100L, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(101L, 102L))
  }

  test("asofNearest picks the closer side and breaks equidistant ties backward") {
    import spark.implicits._
    val left = Seq((1L, "k", "2024-01-01 10:00:10"), (2L, "k", "2024-01-01 10:00:50"),
      (3L, "other", "2024-01-01 10:00:00"))
      .toDF("rid", "key", "t").withColumn("t", col("t").cast("timestamp_ntz"))
    val right = Seq(("k", "2024-01-01 10:00:00"), ("k", "2024-01-01 10:00:20"))
      .toDF("rkey", "rt").withColumn("rt", col("rt").cast("timestamp_ntz"))
    val out = Ops.asofNearest(left, col("key"), col("t"), right, col("rkey"), col("rt"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString)).toMap
    assert(out(1L) == Some("2024-01-01T10:00")) // equidistant 10s each way -> earlier
    assert(out(2L) == Some("2024-01-01T10:00:20")) // backward 30s beats nothing forward
    assert(out(3L).isEmpty) // no observations for this key
  }

  test("movingZscore flags an obvious outlier and nulls degenerate windows") {
    import spark.implicits._
    val df = (1 to 9).map(i => ("u", i, if (i == 9) 100.0 else 10.0))
      .toDF("grp", "seq", "v")
    // output column order: grp, seq, v, z, n
    val out = Ops.movingZscore(df, col("grp"), Seq(col("seq")), col("v"), 5)
      .collect().map(r => r.getInt(1) -> (r.getLong(4), Option(r.get(3)))).toMap
    assert(out(1)._2.isEmpty) // n = 1
    assert(out(5)._2.isEmpty) // constant window -> zero variance
    val z9 = out(9)._2.get.asInstanceOf[Double]
    assert(z9 > 1.5, s"outlier z = $z9") // 100 vs flat 10s
    assert(out(9)._1 == 5)
  }

  test("packSequences fills bins sequentially per group on an arbitrary schema") {
    import spark.implicits._
    val df = Seq(("s", 1, 300), ("s", 2, 300), ("s", 3, 300), ("t", 1, 900))
      .toDF("shard", "seq", "tok")
    val out = Ops.packSequences(df, col("shard"), col("seq"), col("tok"), binSize = 500)
      .orderBy("shard", "seq")
      .select("shard", "seq", "bin", "bin_offset").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // s: cum_before 0,300,600 -> bins 0,0,1 offsets 0,300,100
    assert(out.toSeq == Seq(("s", 1, 0L, 0L), ("s", 2, 0L, 300L),
      ("s", 3, 1L, 100L), ("t", 1, 0L, 0L)))
  }

  test("runningDistinct counts first occurrences on an arbitrary schema") {
    import spark.implicits._
    val df = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"), (2, 1, "z"))
      .toDF("k", "o", "v")
    val out = Ops.runningDistinct(df, col("k"), col("v"), col("o"))
      .orderBy("k", "o").select("n_distinct").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L, 2L, 2L, 3L, 1L))
  }

  test("conversionWindow counts targets strictly inside the value-range frame") {
    import spark.implicits._
    val df = Seq(
      (1, 1000L, "view"), (1, 1001L, "click"), (1, 2000L, "click"),
      (1, 2001L, "view"), (2, 1000L, "view"))
      .toDF("u", "us", "typ")
    val out = Ops.conversionWindow(df, col("u"), col("us"),
        col("typ") === "click", fromUs = 1L, toUs = 1000L)
      .filter(col("typ") === "view").orderBy("u", "us")
      .select("n_in_window").collect().map(_.getLong(0))
    // view@1000: clicks at 1001 (in) and 2000 (in, = +1000) -> 2
    // view@2001: none following -> 0 ; user 2: none -> 0
    assert(out.toSeq == Seq(2L, 0L, 0L))
  }

  test("retentionCohort offsets are whole weeks from each user's first activity") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00") // a Monday
    def plusDays(d: Int) = java.sql.Timestamp.valueOf(
      t0.toLocalDateTime.plusDays(d))
    val df = Seq((7L, t0), (7L, plusDays(9)), (8L, plusDays(1)))
      .toDF("uid", "at")
    val out = Ops.retentionCohort(df, col("uid"), col("at"))
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    // user 7 active in week 0 and week 1; user 8 in week 0 only
    assert(out.toSeq == Seq((0L, 2L), (1L, 1L)))
  }

  test("datasetMix selection is deterministic and respects rate ceilings") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (s"src${i % 4}", i)).toDF("origin", "rid")
    val a = Ops.datasetMix(df, col("origin"), col("rid"), targetFrac = 0.25)
    val b = Ops.datasetMix(df, col("origin"), col("rid"), targetFrac = 0.25)
    assert(a.select("rid").collect().map(_.getLong(0)).toSet ==
      b.select("rid").collect().map(_.getLong(0)).toSet)
    val rates = a.select("rate").distinct().collect().map(_.getDouble(0))
    assert(rates.forall(r => r > 0.0 && r <= 1.0))
    // equal-sized groups at T=2 -> rate == targetFrac; selected ~25%
    assert(math.abs(rates.head - 0.25) < 1e-9)
  }

  test("datasetMix keeps a rate-capped group in FULL (the hex-truncation regression)") {
    import spark.implicits._
    // one tiny group + one huge group at T=2: the tiny group's boosted
    // rate caps at 1.0 — every one of its rows must survive (the old
    // lpad(hex(16777216), 6) threshold silently kept ~1/16)
    val df = ((1L to 5L).map(i => ("rare", i)) ++
      (6L to 2000L).map(i => ("common", i))).toDF("origin", "rid")
    val out = Ops.datasetMix(df, col("origin"), col("rid"), targetFrac = 0.9)
    val rare = out.filter(col("origin") === "rare")
    assert(rare.count() == 5, "capped group must be fully retained")
    assert(rare.select("rate").head().getDouble(0) == 1.0)
  }

  test("chunkManifest tiles an arbitrary payload column exactly") {
    import spark.implicits._
    val df = Seq((5L, "x" * 250), (6L, "")).toDF("k", "blob")
    val out = Ops.chunkManifest(df, col("k"), col("blob"), chunkBytes = 100)
      .orderBy("doc_id", "chunk_no").collect()
    val k5 = out.filter(_.getLong(0) == 5L)
    assert(k5.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 0L, 100L), (1L, 100L, 100L), (2L, 200L, 50L)))
    assert(!out.exists(_.getLong(0) == 6L)) // empty payload -> no chunks
  }

  test("sharedTokenRuns catches a boundary-offset duplicate the stride-4 chunk census misses") {
    // VERDICT-r10 #2's red case: doc 2 repeats doc 1's 20-token span at
    // offset 2 — NOT a multiple of the chunk stride — so every stride-4
    // 8-token chunk hash misaligns (doc 1 windows cover span[1..8],
    // [5..12], [9..16], [13..20]; doc 2's cover span[3..10], [7..14], ...)
    // and the chunk census sees ZERO shared chunks, while the stride-1
    // shingle pass shares all 13 interior windows -> one maximal run of
    // 20 tokens at (d1_start=1, d2_start=3).
    import spark.implicits._
    val span = (1 to 20).map(i => s"s$i")
    val df = Seq(
      (1L, span.mkString(" ")),
      (2L, ("j1" +: "j2" +: span).mkString(" ") + " j3"))
      .toDF("rid", "body")
      .withColumn("toks", split(col("body"), " ", -1))
    val chunks = Ops.tokenChunksArr(df, col("rid"), col("toks"),
        chunkSize = 8, stride = 4)
      .filter(col("n_chunk_tokens") === 8)
      .select("doc_id", "chunk_hash").collect()
    val byDoc = chunks.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).isEmpty,
      "stride-4 chunk hashes must all misalign on an offset-2 duplicate")
    val runs = Ops.sharedTokenRuns(df, col("rid"), col("toks"),
        shingle = 8, minRunTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(runs.toSeq == Seq((1L, 2L, 1, 3, 20L)),
      s"expected the single maximal 20-token run, got ${runs.toSeq}")
  }
}
