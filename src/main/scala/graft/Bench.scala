package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // n timed runs per query, reported value = median (round-3 verdict #8:
    // single-run totals at these SFs are host-noise-dominated). Default 1
    // keeps the driver's single-pass contract; set 3 for local medians.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One untimed trivial action before the loop: JVM/session bring-up
    // (executor start, first codegen, parquet footer cache) otherwise
    // lands entirely on whichever query is declared first — r5 measured
    // scan_project at 3.4 s as query #1 vs 0.15 s mid-run.
    spark.range(16).count()
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    // SPARK_GRAFT_BENCH_TELEMETRY=1 → a second JSON line with per-query GC
    // time and cache occupancy: the r4 driver run showed three late-running
    // queries inflated 5-6x with no way to tell WHY from the timings alone
    // (root cause: transient host contention — see BASELINE.md round 5)
    val telemetry = sys.env.get("SPARK_GRAFT_BENCH_TELEMETRY").contains("1")
    val gcPer = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val cachedPer = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val gc0 = gcMillis
    val results = SparkEntry.queries.map { case (name, fn) =>
      val g0 = gcMillis
      val ts = (1 to reps).map(_ => timeOnce(fn)).sorted
      if (telemetry) {
        gcPer(name) = gcMillis - g0
        cachedPer(name) = spark.sparkContext.getPersistentRDDs.size
      }
      // ANY failed rep marks the query failed (-1): sorting would
      // otherwise hide an intermittent crash behind a healthy median,
      // and a -1 summed into the total would make a BROKEN query look
      // like a speedup
      name -> (if (ts.head < 0) -1.0 else ts(ts.size / 2))
    }
    val gcSec = (gcMillis - gc0) / 1000.0
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A run with a crashed query has no honest total: summing the healthy
    // rest would read as a speedup in naive run-over-run comparison
    // (ADVICE r4). value:-1 + valid:false make the invalidity visible to
    // consumers that only look at the headline number.
    val valid = failed.isEmpty
    val total = if (valid) results.values.sum else -1.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","valid":$valid,"queries":$qs,"failed":$failedJson,"gc_sec":$gcSec,"sf":"$sfDir","reps":$reps}""")
    if (telemetry) {
      val gcJson = gcPer.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val cJson = cachedPer.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      println(s"""{"telemetry":true,"gc_ms":$gcJson,"persistent_rdds":$cJson}""")
    }
    Graft.freeCaches(spark)
    spark.stop()
  }
}
