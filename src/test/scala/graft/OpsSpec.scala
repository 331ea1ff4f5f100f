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
}
