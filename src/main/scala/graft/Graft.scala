package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.util.Tables

/** Library facade: exposes the fixture star schema to SQL-text users.
  * `registerViews` makes every table (including the schema-adaptive
  * events reader) available as a temp view, so `spark.sql("SELECT ...")`
  * works against the same data the DataFrame operators see. */
object Graft {
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register each table as a temp view, independently: a table whose read
    * or recipe fails (missing file, drifted physical type, ...) degrades
    * ONLY queries that reference it. Its stale view (if any) is dropped, so
    * such queries fail with TABLE_OR_VIEW_NOT_FOUND naming the culprit,
    * while the other nine tables stay queryable. (Round-7 lesson: an events
    * schema drift killed the four `sub_*` queries that never touch events,
    * purely because this method was all-or-nothing.) */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      try {
        val df =
          if (t == "events") Tables.events(spark, sfDir)
          else Tables(spark, sfDir, t)
        df.createOrReplaceTempView(t)
      } catch {
        case scala.util.control.NonFatal(e) =>
          spark.catalog.dropTempView(t)
          System.err.println(
            s"[graft] WARN: view '$t' unavailable under $sfDir: ${e.getMessage.linesIterator.next()}")
      }
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
