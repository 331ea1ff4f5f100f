package graft
import org.apache.spark.sql.SparkSession

/** Time a single named query N times at a given sf — the per-operator
  * profiling loop (Bench runs the whole suite; this isolates one). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (name, sfDir, reps) =
      (args(0), args.lift(1).getOrElse("/root/testdata/sf0.1"),
        args.lift(2).map(_.toInt).getOrElse(3))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // Sort-based shuffle writer, as in Bench (see its scaladoc: the
      // bypass writer's per-partition file creates dominate CPU here);
      // SPARK_GRAFT_BYPASS=200 restores the default for A/B probes.
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "8"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.queries.Registry.byName(name)
    // Process CPU per run: cpu/wall ≈ effective parallelism. Lets a single
    // probe distinguish "plan does more work" (cpu up) from "host was
    // contended" (wall up, cpu flat) — the r8→r9 trigram attribution
    // needed exactly this and only the full Bench had it.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def cpuMs: Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1000000L
      case _ => -1L
    }
    for (i <- 1 to reps) {
      val c0 = cpuMs
      val t0 = System.nanoTime()
      val n = q.build(spark, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"$name run $i: $w%.2f s (cpu ${(cpuMs - c0) / 1000.0}%.2f s, $n rows)")
    }
    spark.stop()
  }
}
