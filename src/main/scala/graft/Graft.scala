package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.util.Tables

/** Library facade: exposes the fixture star schema to SQL-text users.
  * `registerViews` makes every table (including the nanosecond-recipe
  * events reader) available as a temp view, so `spark.sql("SELECT ...")`
  * works against the same data the DataFrame operators see. */
object Graft {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, sfDir).createOrReplaceTempView("events")
      case t => Tables(spark, sfDir, t).createOrReplaceTempView(t)
    }

  /** Convenience: register views and run one SQL text query. */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    registerViews(spark, sfDir)
    spark.sql(query)
  }

  /** Free every memoized build (ANN indexes, signature/edge frames) and
    * unpersist their cached blocks. A long-lived session should call this
    * when done with a fixture dir — the memo cannot free itself (see
    * util.Memo's scaladoc); the next query invocation simply rebuilds. */
  def freeCaches(spark: SparkSession): Unit = graft.util.Memo.clear(spark)
}
