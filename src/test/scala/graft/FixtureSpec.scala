package graft

import graft.util.Tables
import org.apache.spark.sql.types._

/** Pins the fixture contract (FIXTURES.md): schemas, row counts, and the
  * nanosecond-events recipe. If the driver regenerates data differently,
  * these fail first and loudest. */
class FixtureSpec extends SparkSpec {

  private val expectedCounts = Map(
    "region" -> 5L, "nation" -> 25L, "customer" -> 150L, "supplier" -> 10L,
    "part" -> 200L, "orders" -> 1500L, "lineitem" -> 6000L, "events" -> 1000L,
    "documents" -> 500L, "embeddings" -> 500L)

  test("row counts at sf0.001 match FIXTURES.md") {
    expectedCounts.foreach { case (t, n) =>
      val actual =
        if (t == "events") Tables.events(spark, sf0001).count()
        else Tables(spark, sf0001, t).count()
      assert(actual == n, s"table $t")
    }
  }

  test("events nanosecond recipe yields timestamp_ntz microseconds") {
    val ev = Tables.events(spark, sf0001)
    assert(ev.schema("ts").dataType == TimestampNTZType)
    // value domain sanity: all timestamps inside the generated month
    val row = ev.selectExpr("min(ts)", "max(ts)").head()
    assert(row.get(0).toString.startsWith("2024-01-01"))
  }

  test("lineitem schema is the pinned shape") {
    val li = Tables.lineitem(spark, sf0001)
    val types = li.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("l_orderkey") == LongType)
    assert(types("l_linenumber") == IntegerType)
    assert(types("l_quantity") == DoubleType)
    assert(types("l_returnflag") == StringType)
    assert(types("l_shipdate") == TimestampNTZType)
  }

  test("embeddings are fixed-length-64 float arrays") {
    val e = Tables.embeddings(spark, sf0001)
    assert(e.schema("embedding").dataType == ArrayType(FloatType, containsNull = true))
    import org.apache.spark.sql.functions._
    val dims = e.select(size(col("embedding")).as("d")).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq == Seq(64))
  }

  test("money columns carry no sub-cent digits (decimal casts are exact)") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf0001)
    val bad = li.filter(
      abs(col("l_extendedprice") * 100 - round(col("l_extendedprice") * 100, 0)) > 1e-6).count()
    assert(bad == 0L)
  }
}
