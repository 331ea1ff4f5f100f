package graft

import org.apache.spark.sql.SparkSession

/** Decompose a key's WARM per-invocation cost into its fixed-overhead
  * phases (VERDICT-r16 #4: at ~0.24 s/key × 308 keys both sides of the
  * bench ratio are overhead-dominated — find where the ~100-200 ms of a
  * trivial key goes before trying to shave it):
  *
  *   build = Registry build fn (DataFrame construction; includes any
  *           memo reads and eager fixture touches the key makes)
  *   plan  = queryExecution.executedPlan force (analysis + optimization
  *           + physical planning + codegen source generation)
  *   exec  = .count() on the planned frame (job scheduling + execution;
  *           first exec per plan also pays the janino compile)
  *
  * Usage: ProfilePhases <sfDir> <reps> [key1,key2,...]
  * (defaults: every key whose warm cost Bench reads under 0.3 s is the
  * interesting population, but the full suite works too). Prints one
  * line per (key, rep) plus a per-phase sum so the fixed floor and its
  * split are directly readable. */
object ProfilePhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(16).count()
    val keys = graft.queries.Registry.declared
      .filter(q => only.forall(_.contains(q.name)))
    def ms(t0: Long) = (System.nanoTime() - t0) / 1e6
    val sums = scala.collection.mutable.LinkedHashMap(
      "build" -> 0.0, "plan" -> 0.0, "exec" -> 0.0)
    keys.foreach { q =>
      // one untimed run: memo builds + codegen cache for this plan.
      // Failure skips THIS key only (ADVICE-r17: `return` here is a
      // non-local return from main — the first bad key used to abort the
      // whole run, skipping every remaining key, the TOTAL line, and
      // spark.stop(), while printing what read as a per-key skip).
      val warmOk =
        try { q.build(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(e) =>
          println(s"${q.name} FAILED (skipped): $e"); false }
      if (warmOk) {
      val (b, p, e) = (new Array[Double](reps), new Array[Double](reps),
        new Array[Double](reps))
      for (i <- 0 until reps) {
        var t0 = System.nanoTime()
        val df = q.build(spark, sfDir)
        b(i) = ms(t0)
        t0 = System.nanoTime()
        df.queryExecution.executedPlan
        p(i) = ms(t0)
        t0 = System.nanoTime()
        df.count()
        e(i) = ms(t0)
      }
      def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
      sums("build") += med(b); sums("plan") += med(p); sums("exec") += med(e)
      println(f"${q.name}%-34s build ${med(b)}%7.1f ms  plan ${med(p)}%7.1f ms  exec ${med(e)}%7.1f ms")
      }
    }
    println(f"TOTAL (medians, ${keys.size} keys): " +
      sums.map { case (k, v) => f"$k ${v / 1000}%.2f s" }.mkString("  "))
    spark.stop()
  }
}
