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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.queries.Registry.byName(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = q.build(spark, sfDir).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
