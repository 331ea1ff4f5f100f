package graft
import org.apache.spark.sql.SparkSession

/** Time a comma-separated list of named queries ONCE each, in the given
  * order, in one JVM — replicates the suite-order cold-cost structure
  * (BenchOne isolates a key but then its reading includes engine
  * first-touch that earlier family members absorb in the real suite). */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(16).count()
    if (sys.env.get("GRAFT_STREAM_WARMUP").contains("1"))
      Graft.streamingBringUp(spark)
    for (n <- names) {
      val q = graft.queries.Registry.byName(n)
      val t0 = System.nanoTime()
      val rows = q.build(spark, sfDir).count()
      println(f"$n: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }
    Graft.freeCaches(spark)
    spark.stop()
  }
}
