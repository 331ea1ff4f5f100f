package graft

import graft.queries.Registry
import graft.util.{Memo, Tables}
import org.apache.spark.sql.functions._

/** Round-14 pins: the checkpoint-restart key's teeth (the chronological
  * split must actually produce straddle buckets, or the state-restore
  * claim is vacuous), the memoized ANN recall eval's build-once /
  * serve-local contract (VERDICT-r13 #2's "Done" condition), and the
  * sql_q20 decorrelation shape. */
class Round14OpsSpec extends SparkSpec {

  test("stream_restart_parity's split produces straddle buckets on every fixture SF") {
    // The graded key's value rests on at least one window receiving rows
    // from BOTH arrival waves — those are the buckets whose counts only
    // come out right if run 2 restores run 1's partial state from the
    // checkpoint. Replay the key's own split rule (midpoint of [min ts,
    // max ts]) in batch and pin that straddle buckets exist at every SF.
    for (sf <- allSfs) {
      val ev = Tables.events(spark, sf).select(col("ts").cast("timestamp").as("ts"))
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      val midMs = mm.getTimestamp(0).getTime +
        (mm.getTimestamp(1).getTime - mm.getTimestamp(0).getTime) / 2
      // the key's own split rule: first event of the ≥2-distinct-ts
      // bucket nearest the midpoint (a bare midpoint lands in an empty
      // hour at sf0.001 — the failure this test was born catching)
      val split = ev
        .groupBy(window(col("ts"), "1 hour"))
        .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
        .filter(col("t0") < col("t1"))
        .select(col("t0"))
        .orderBy(abs(col("t0").cast("double") * 1000.0 - lit(midMs.toDouble)),
          col("t0"))
        .head().getTimestamp(0)
      val straddle = ev
        .groupBy(window(col("ts"), "1 hour"))
        .agg(
          sum(when(col("ts") <= lit(split), 1L).otherwise(0L)).as("w1"),
          sum(when(col("ts") > lit(split), 1L).otherwise(0L)).as("w2"))
        .filter(col("w1") > 0 && col("w2") > 0)
        .count()
      assert(straddle >= 1,
        s"$sf: no bucket spans the wave split — the restart key is toothless here")
    }
  }

  test("ANN recall eval builds once per (session, sfDir); reuse runs no index work") {
    Memo.clear(spark)
    // Count Spark jobs via listener: the first invocation BUILDS (index
    // fit + exact top-k + recall join — many jobs); later invocations
    // serve the memoized k-row artifact (at most the count()'s single
    // local-relation job each). A rebuild on reuse — the r13 regression
    // class — shows up as a job-count explosion, independent of timing.
    // AtomicInteger, not @volatile var += (ADVICE-r14: the listener fires
    // on the bus thread; volatile read-modify-write can lose increments)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Registry.byName("vec_ann_ivf").build(spark, sf0001).count()
      Registry.byName("vec_ann_lsh").build(spark, sf0001).count()
      Thread.sleep(500) // listener bus drain (waitUntilEmpty is private[spark])
      val buildJobs = jobs.get()
      assert(buildJobs > 4, s"build phase should run real jobs, saw $buildJobs")
      jobs.set(0)
      (1 to 3).foreach { _ =>
        Registry.byName("vec_ann_ivf").build(spark, sf0001).count()
        Registry.byName("vec_ann_lsh").build(spark, sf0001).count()
      }
      Thread.sleep(500)
      // each count() over the k-row local relation costs ≤2 tiny jobs
      // (the orderBy's range-partitioner sample + the count itself);
      // a rebuild would add the index fit's dozens
      assert(jobs.get() <= 12,
        s"reuse must serve the memoized eval (≤2 local jobs per count), saw ${jobs.get()}")
    } finally {
      spark.sparkContext.removeSparkListener(l)
      Memo.clear(spark)
    }
  }

  test("ANN eval frame is rebuilt per call — caller unpersist cannot poison the memo") {
    Memo.clear(spark)
    val a = Registry.byName("vec_ann_ivf").build(spark, sf0001)
    val b = Registry.byName("vec_ann_ivf").build(spark, sf0001)
    assert(a.collect().toSeq == b.collect().toSeq)
    Memo.clear(spark)
  }

  test("the scale rewrites return row-identical results to their graded twins") {
    // sql_q21_agg_rewrite / sql_q20_fused_rewrite exist BECAUSE their
    // plans differ (codegen'd equi aggregates vs conditioned semi/anti
    // and a decorrelated double scan) — so the equivalence claim is the
    // whole contract. DuckDB cross-checks it externally at 4 SFs; this
    // pins it on the SPARK side of the fence too.
    for ((a, b) <- Seq(
        "sql_q21_waiting_supplier" -> "sql_q21_agg_rewrite",
        "sql_q20_potential_promotion" -> "sql_q20_fused_rewrite")) {
      val ra = Registry.byName(a).build(spark, sf0001).collect().toSeq
      val rb = Registry.byName(b).build(spark, sf0001).collect().toSeq
      assert(ra == rb, s"$a vs $b diverged: ${ra.take(3)} vs ${rb.take(3)}")
    }
  }

  test("sql_q20 decorrelates: no per-row subquery execution in the physical plan") {
    val df = Registry.byName("sql_q20_potential_promotion").build(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // The correlated scalar aggregate must have been rewritten into a
    // joined-back aggregate: a surviving in-plan subquery expression
    // (per-row re-scan) would print as a Subquery/InSubquery node.
    assert(!plan.contains("InSubqueryExec"),
      "IN should plan as a semi-join, not a per-row subquery probe")
    assert(plan.contains("LeftSemi"), s"expected a semi-join in:\n$plan")
    assert(df.count() > 0)
  }
}
