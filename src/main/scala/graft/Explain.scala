package graft

import org.apache.spark.sql.SparkSession
import graft.queries.Registry

/** Plan-audit utility: prints the formatted physical plan for one or all
  * registered operators. Usage:
  *   runMain graft.Explain <queryName|all> [sfDir]
  * Used to verify scan pruning (PushedFilters/ReadSchema), broadcast vs
  * shuffle join selection, partial aggregation, and WholeStageCodegen
  * coverage before declaring an operator done.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (name == "all") Registry.all else Seq(Registry.byName(name))
    qs.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
