package graft

import graft.util.Tables
import org.apache.spark.sql.types._
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.hadoop.fs.Path
import org.apache.hadoop.conf.Configuration
import scala.jdk.CollectionConverters._

/** Pins the fixture contract (FIXTURES.md): parquet physical types, schemas,
  * row counts, and the schema-adaptive events recipe. If the driver
  * regenerates data differently, these fail first — and name the exact
  * drifted column (round-7 lesson: events.ts silently moved timestamp[ns] →
  * timestamp[us] and the first symptom was 31 cascading analysis errors). */
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

  /** Footer-level leaf types, as `optional int64 ts (TIMESTAMP(MICROS,false))`
    * strings (parquet-hadoop 1.16 `PrimitiveType.toString`). Dumped from the
    * 2026-08-13 driver regeneration; identical across sf0.001/0.01/0.1. */
  private val expectedPhysical = Map(
    "region.r_regionkey" -> "optional int32 r_regionkey",
    "region.r_name" -> "optional binary r_name (STRING)",
    "nation.n_nationkey" -> "optional int32 n_nationkey",
    "nation.n_name" -> "optional binary n_name (STRING)",
    "nation.n_regionkey" -> "optional int32 n_regionkey",
    "customer.c_custkey" -> "optional int64 c_custkey",
    "customer.c_name" -> "optional binary c_name (STRING)",
    "customer.c_nationkey" -> "optional int32 c_nationkey",
    "customer.c_acctbal" -> "optional double c_acctbal",
    "customer.c_mktsegment" -> "optional binary c_mktsegment (STRING)",
    "supplier.s_suppkey" -> "optional int64 s_suppkey",
    "supplier.s_name" -> "optional binary s_name (STRING)",
    "supplier.s_nationkey" -> "optional int32 s_nationkey",
    "supplier.s_acctbal" -> "optional double s_acctbal",
    "part.p_partkey" -> "optional int64 p_partkey",
    "part.p_name" -> "optional binary p_name (STRING)",
    "part.p_brand" -> "optional binary p_brand (STRING)",
    "part.p_type" -> "optional binary p_type (STRING)",
    "part.p_size" -> "optional int32 p_size",
    "part.p_retailprice" -> "optional double p_retailprice",
    "orders.o_orderkey" -> "optional int64 o_orderkey",
    "orders.o_custkey" -> "optional int64 o_custkey",
    "orders.o_orderstatus" -> "optional binary o_orderstatus (STRING)",
    "orders.o_totalprice" -> "optional double o_totalprice",
    "orders.o_orderdate" -> "optional int64 o_orderdate (TIMESTAMP(MICROS,false))",
    "orders.o_orderpriority" -> "optional binary o_orderpriority (STRING)",
    "lineitem.l_orderkey" -> "optional int64 l_orderkey",
    "lineitem.l_partkey" -> "optional int64 l_partkey",
    "lineitem.l_suppkey" -> "optional int64 l_suppkey",
    "lineitem.l_linenumber" -> "optional int32 l_linenumber",
    "lineitem.l_quantity" -> "optional double l_quantity",
    "lineitem.l_extendedprice" -> "optional double l_extendedprice",
    "lineitem.l_discount" -> "optional double l_discount",
    "lineitem.l_tax" -> "optional double l_tax",
    "lineitem.l_returnflag" -> "optional binary l_returnflag (STRING)",
    "lineitem.l_linestatus" -> "optional binary l_linestatus (STRING)",
    "lineitem.l_shipdate" -> "optional int64 l_shipdate (TIMESTAMP(MICROS,false))",
    "events.event_id" -> "optional int64 event_id",
    "events.ts" -> "optional int64 ts (TIMESTAMP(MICROS,false))",
    "events.user_id" -> "optional int64 user_id",
    "events.event_type" -> "optional binary event_type (STRING)",
    "events.value" -> "optional double value",
    "events.props" -> "optional binary props (STRING)",
    "documents.doc_id" -> "optional int64 doc_id",
    "documents.text" -> "optional binary text (STRING)",
    "documents.lang" -> "optional binary lang (STRING)",
    "documents.source" -> "optional binary source (STRING)",
    "documents.n_chars" -> "optional int64 n_chars",
    "embeddings.vec_id" -> "optional int64 vec_id",
    "embeddings.embedding.list.element" -> "optional float element",
    "embeddings.label" -> "optional int32 label")

  /** The two physical shapes `events.ts` has shipped as; the reader
    * (util.Tables.events) adapts to both, so either is acceptable. */
  private val eventsTsShapes = Set(
    "optional int64 ts (TIMESTAMP(MICROS,false))", // 2026-08-13 regeneration
    "optional int64 ts (TIMESTAMP(NANOS,false))")  // original fixtures

  test("parquet footer physical types match the pinned contract, per column") {
    val conf = new Configuration()
    val actual = expectedCounts.keys.toSeq.sorted.flatMap { t =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(s"$sf0001/$t.parquet"), conf))
      try {
        reader.getFooter.getFileMetaData.getSchema.getColumns.asScala.toList
          .map(c => s"$t.${c.getPath.mkString(".")}" -> c.getPrimitiveType.toString)
      } finally reader.close()
    }.toMap
    val drift = actual.toSeq.sortBy(_._1).flatMap { case (path, typ) =>
      if (path == "events.ts") {
        if (eventsTsShapes(typ)) None
        else Some(s"$path: got [$typ], expected one of ${eventsTsShapes.mkString(" | ")}")
      } else expectedPhysical.get(path) match {
        case Some(exp) if exp == typ => None
        case Some(exp) => Some(s"$path: got [$typ], expected [$exp]")
        case None => Some(s"$path: unexpected new column of type [$typ]")
      }
    }
    val missing = (expectedPhysical.keySet -- actual.keySet).toSeq.sorted
      .map(p => s"$p: column missing from fixture")
    assert(drift.isEmpty && missing.isEmpty,
      s"\nFIXTURE PHYSICAL-TYPE DRIFT (update util.Tables + FIXTURES.md):\n  " +
        (drift ++ missing).mkString("\n  "))
  }

  test("events reader adapts to the fixture's ts physical type (ns or us)") {
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

  test("a broken events table degrades only events queries (sub_scalar still answers)") {
    // Fixture dir with every table EXCEPT events — simulates the round-7
    // failure mode where the events read threw for all SQL-facade queries.
    val dir = new java.io.File(graft.queries.Streaming.tempDir("graft-degraded"))
    expectedCounts.keys.filter(_ != "events").foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        new java.io.File(dir, s"$t.parquet").toPath,
        new java.io.File(sf0001, s"$t.parquet").toPath)
    }
    // try/finally (ADVICE r8): an assertion failure mid-section would
    // otherwise leave the SHARED SparkSpec session with dropped/degraded
    // temp views, and unrelated later suites would fail confusingly.
    try {
      val sub = SparkEntry.queries("sub_scalar")(spark, dir.getAbsolutePath)
      assert(sub.count() > 0, "sub_scalar must survive a broken events table")
      // The events view itself must be absent (not stale), so events queries
      // fail with TABLE_OR_VIEW_NOT_FOUND naming the culprit.
      Graft.registerViews(spark, dir.getAbsolutePath)
      assert(!spark.catalog.tableExists("events"))
      val err = intercept[Exception](spark.sql("SELECT count(*) FROM events").collect())
      assert(err.getMessage.contains("events"))
    } finally {
      // Restore real views for any suite running after us in the shared session.
      Graft.registerViews(spark, sf0001)
    }
  }

  test("documents.source stays below agg_approx_topk's no-evict bound (k=25)") {
    // agg_approx_topk's determinism rests on its sketch NEVER evicting:
    // k=25 exceeds the fixture's source domain, so insertion order cannot
    // matter. Pin the domain (ADVICE r8) so source-cardinality drift in a
    // regenerated fixture fails HERE, loudly, before it turns the graded
    // query nondeterministic across runs.
    import org.apache.spark.sql.functions._
    val nSources = Tables.documents(spark, sf0001)
      .select(countDistinct(col("source")).as("n")).head.getLong(0)
    assert(nSources == 20L,
      s"documents.source domain drifted to $nSources (expected 20, " +
        "and agg_approx_topk requires < 25)")
  }
}
