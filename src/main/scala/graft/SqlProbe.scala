package graft
import org.apache.spark.sql.SparkSession

/** Scratch SQL timing probe: runMain graft.SqlProbe <sfDir> then reads
  * semicolon-separated SQL statements from stdin, timing each (wall +
  * process CPU). Dev-tooling for plan-cost attribution. */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.registerViews(spark, sfDir)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    def cpuMs: Long = osBean match {
      case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime / 1000000L
      case _ => -1L
    }
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def stealJ: Long = try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().next().trim.split("\\s+")(8).toLong finally src.close()
    } catch { case _: Throwable => -1L }
    val text = scala.io.Source.stdin.mkString
    text.split(";;").map(_.trim).filter(_.nonEmpty).foreach { q =>
      var df: org.apache.spark.sql.DataFrame = null
      for (i <- 1 to 2) {
        val c0 = cpuMs; val g0 = gcMs; val s0 = stealJ; val t0 = System.nanoTime()
        df = spark.sql(q)
        val n = df.count()
        println(f"[$i] ${(System.nanoTime() - t0) / 1e9}%.2f s cpu ${(cpuMs - c0) / 1000.0}%.1f s gc ${(gcMs - g0) / 1000.0}%.1f s steal ${(stealJ - s0) / 100.0}%.1f s ($n rows) :: ${q.linesIterator.next().take(70)}")
      }
      // post-execution plan: with AQE the FINAL physical strategy (what
      // actually ran) is only visible after an action
      if (sys.env.get("GRAFT_PROBE_PLAN").contains("1"))
        println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
