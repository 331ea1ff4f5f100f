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

  test("decodePgm parses a valid P5 container and normalizes by the parsed maxval") {
    val img = Multimodal.decodePgm("P5 2 2 100\nHell".getBytes("US-ASCII"))
    assert((img.width, img.height, img.maxval) == (2, 2, 100))
    assert(img.pixels.length == 4)
    assert(img.pixels(0) == 'H'.toInt / 100.0) // maxval from the HEADER, not 255
    assert(img.pixels.forall(v => v >= 0.0))
  }

  test("decodePgm accepts the standard newline-separated header dialect") {
    // what ImageMagick/Netpbm tools actually emit: P5\n<w> <h>\n<maxval>\n
    val img = Multimodal.decodePgm("P5\n2 2\n255\nHell".getBytes("US-ASCII"))
    assert((img.width, img.height, img.maxval) == (2, 2, 255))
    assert(img.pixels(0) == 'H'.toInt / 255.0)
  }

  test("decodePgm rejects malformed containers loudly") {
    // wrong magic
    intercept[IllegalArgumentException] {
      Multimodal.decodePgm("P6 2 2 255\nHell".getBytes("US-ASCII"))
    }
    // sample section shorter than width*height
    intercept[IllegalArgumentException] {
      Multimodal.decodePgm("P5 4 4 255\nab".getBytes("US-ASCII"))
    }
    // maxval out of the single-byte range
    intercept[IllegalArgumentException] {
      Multimodal.decodePgm("P5 1 2 999\nab".getBytes("US-ASCII"))
    }
    // no header terminator at all
    intercept[IllegalArgumentException] {
      Multimodal.decodePgm("garbage".getBytes("US-ASCII"))
    }
  }

  test("encode → decode round-trip: container survives the binary column unchanged") {
    import spark.implicits._
    val text = "the fast key order sort" // 23 chars → 16x1 image
    val payload = Seq(text).toDF("text")
      .select(Multimodal.encodePgmPayload(col("text"), 16).as("p"))
      .head().getAs[Array[Byte]](0)
    assert(new String(payload.take(9), "US-ASCII") == "P5 16 1 2")
    val img = Multimodal.decodePgm(payload)
    assert((img.width, img.height, img.maxval) == (16, 1, 255))
    assert(img.pixels.toSeq == text.take(16).map(_.toInt / 255.0))
  }

  test("decodeFeatures: mapPartitions keeps schema, parsed dims, and row count") {
    val docs = Tables.documents(spark, sf0001)
    val out = Multimodal.decodeFeatures(docs, 16)
    assert(out.schema == StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false)))))
    assert(out.count() == docs.count())
    // parsed dims must satisfy the container's own arithmetic
    assert(out.filter(col("width") =!= 16).count() == 0)
    assert(out.filter(size(col("features")) =!= col("width") * col("height"))
      .count() == 0)
    assert(out.filter(col("height") < 1).count() == 0) // min doc is 19 chars
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

  test("Ogg codec: encode->decode round-trips, multi-lacing and corrupt pages handled") {
    import spark.implicits._
    // short (single lacing value), exactly 255 (lacing [255, 0]), long
    // (600 bytes -> [255, 255, 90]), empty (lacing [0])
    val docs = Seq(
      (1L, "x" * 10), (2L, "y" * 255), (3L, "z" * 600), (4L, ""))
      .toDF("doc_id", "text")
    val pages = docs.select(col("doc_id"),
        Multimodal.encodeOggPayload(col("text"), col("doc_id")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val m10 = Multimodal.decodeOgg(pages(1L))
    assert(m10.payloadBytes == 10 && m10.nSegments == 1 &&
      m10.serial == 1L && m10.headerType == 6L && m10.granule == 10L)
    val m255 = Multimodal.decodeOgg(pages(2L))
    assert(m255.payloadBytes == 255 && m255.nSegments == 2,
      "a 255-byte packet laces as [255, 0] per RFC 3533")
    val m600 = Multimodal.decodeOgg(pages(3L))
    assert(m600.payloadBytes == 600 && m600.nSegments == 3 &&
      m600.pageBytes == 27 + 3 + 600)
    val m0 = Multimodal.decodeOgg(pages(4L))
    assert(m0.payloadBytes == 0 && m0.nSegments == 1 && m0.granule == 0)
    // corrupt pages fail loudly, never decode garbage
    intercept[IllegalArgumentException] {
      Multimodal.decodeOgg("NotOggS".getBytes ++ pages(1L).drop(7))
    }
    val truncated = pages(3L).take(40) // cuts inside the lacing/payload
    intercept[IllegalArgumentException] { Multimodal.decodeOgg(truncated) }
    val badLacing = pages(2L).clone()
    badLacing(28) = 7 // last lacing 0 -> 7: declared > actual payload
    intercept[IllegalArgumentException] { Multimodal.decodeOgg(badLacing) }
  }
}
