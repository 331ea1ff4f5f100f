package graft

import graft.queries.Multimodal
import graft.util.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the assumptions and plumbing of the multimodal tier. */
class MultimodalSpec extends SparkSpec {

  test("fixture documents are pure ASCII (byte ops == char ops for the oracle)") {
    val bad = Tables.documents(spark, sf0001)
      .filter(length(col("text").cast("binary")) =!= length(col("text")))
      .count()
    assert(bad == 0)
  }

  test("fakeDecode normalizes bytes into [0,1] at the requested width") {
    val f = Multimodal.fakeDecode("Hello!".getBytes("UTF-8"), 4)
    assert(f.length == 4)
    assert(f(0) == 'H'.toInt / 255.0)
    assert(f.forall(v => v >= 0.0 && v <= 1.0))
    // narrower payload than dim → truncated, not padded
    assert(Multimodal.fakeDecode("ab".getBytes("UTF-8"), 16).length == 2)
  }

  test("decodeFeatures: mapPartitions keeps schema, width, and row count") {
    val docs = Tables.documents(spark, sf0001)
    val out = Multimodal.decodeFeatures(docs, 16)
    assert(out.schema == StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false)))))
    assert(out.count() == docs.count())
    val widths = out.select(size(col("features"))).distinct().collect().map(_.getInt(0))
    assert(widths.toSeq == Seq(16)) // every fixture doc has >= 16 bytes
    val r = out.filter(col("doc_id") === 0).head()
    val first = r.getAs[scala.collection.Seq[Double]]("features")
    assert(first.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("frame samples are content-addressed slices of the payload") {
    val frames = Multimodal.mmFrameSample.build(spark, sf0001)
    // every doc yields at least frame 0 (all docs are >= 48 bytes)
    assert(frames.filter(col("frame_no") === 0).count() ==
      Tables.documents(spark, sf0001).count())
    assert(frames.filter(col("frame_bytes") > 50).count() == 0)
  }
}
