package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Round-12 operator semantics: the PNG codec's validation discipline,
  * the z-order layout's deterministic file fan-out, the variant-explode
  * row contract, and the Ogg encode-time page guard (ADVICE-r11). The
  * graded hash compares prove Spark==DuckDB; these pin that what both
  * compute is the INTENDED behavior on hand-checked inputs. */
class Round12OpsSpec extends SparkSpec {

  test("decodePng round-trips the synthesized container and verifies the real CRC") {
    import graft.queries.Multimodal
    val row = spark.sql("SELECT 42 AS doc_id, 'hello png' AS text, 137 AS n_chars")
      .select(Multimodal.encodePngPayload(col("text"), col("doc_id"),
        col("n_chars")).as("p"))
      .head()
    val bytes = row.getAs[Array[Byte]](0)
    val m = Multimodal.decodePng(bytes)
    assert(m.width == 138 && m.height == 43) // n_chars%800+1, doc_id%600+1
    assert(m.bitDepth == 8 && m.colorType == 0) // 42 % 3 = 0 -> grayscale
    assert(m.payloadBytes == "hello png".length.toLong)
    // the stored CRC is the real polynomial over the 17 type+data bytes
    val crc = new java.util.zip.CRC32
    crc.update(bytes, 12, 17)
    assert(m.crc == crc.getValue)
    // corrupt one IHDR data byte: the stored CRC no longer matches and
    // the decoder must refuse rather than decode garbage
    val bad = bytes.clone(); bad(17) = (bad(17) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.decodePng(bad))
    // corrupt the signature: refused before any field parse
    val badSig = bytes.clone(); badSig(0) = 0x00
    intercept[IllegalArgumentException](Multimodal.decodePng(badSig))
  }

  test("fn_zorder_files: the box touches exactly its 4 z-bucket files (one file per bucket)") {
    val r = Registry.byName("fn_zorder_files").build(spark, sf0001).head()
    assert(r.getAs[Long]("n_files_touched") == 4L,
      s"layout fan-out broke: ${r.getAs[Long]("n_files_touched")} files")
    assert(r.getAs[Long]("n_buckets") == 4L)
    assert(r.getAs[Long]("n_rows") > 0L)
  }

  test("fn_variant_explode emits one row per array position with full doc coverage") {
    val rows = Registry.byName("fn_variant_explode").build(spark, sf0001)
      .collect()
    assert(rows.length == 3, s"expected pos 0..2, got ${rows.length}")
    val nDocs = graft.util.Tables.documents(spark, sf0001).count()
    // every fixture doc has >= 8 tokens, so each position covers all docs
    assert(rows.forall(_.getAs[Long]("n") == nDocs))
    assert(rows.map(_.getAs[Int]("pos")).toSeq == Seq(0, 1, 2))
  }

  test("encodeOggPayload refuses a payload that exceeds one page (ADVICE-r11)") {
    import graft.queries.Multimodal
    val ok = spark.sql(s"SELECT 1 AS doc_id, repeat('x', 65024) AS text")
      .select(Multimodal.encodeOggPayload(col("text"), col("doc_id")).as("p"))
    assert(Multimodal.decodeOgg(ok.head().getAs[Array[Byte]](0))
      .payloadBytes == 65024L)
    val over = spark.sql(s"SELECT 1 AS doc_id, repeat('x', 65025) AS text")
      .select(Multimodal.encodeOggPayload(col("text"), col("doc_id")).as("p"))
    val e = intercept[Exception](over.head())
    assert(e.getMessage != null &&
      (e.getMessage.contains("exceeds one Ogg page") ||
        Option(e.getCause).exists(_.getMessage.contains("exceeds one Ogg page"))),
      s"wrong failure: $e")
  }
}
