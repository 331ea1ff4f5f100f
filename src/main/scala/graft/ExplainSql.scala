package graft
import org.apache.spark.sql.SparkSession

/** Scratch: explain SQL text from stdin (";;"-separated) over a fixture dir. */
object ExplainSql {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.registerViews(spark, sfDir)
    scala.io.Source.stdin.mkString.split(";;").map(_.trim).filter(_.nonEmpty)
      .foreach { q => println(s"===== $q"); spark.sql(q).explain(true) }
    spark.stop()
  }
}
