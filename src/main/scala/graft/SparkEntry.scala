package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Registry
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (TPC-H-Q1-shaped pricing summary) on /root/testdata/sf0.001;
    * driver smoke-checks rows>0 (6 groups). */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("agg_q1_pricing").build(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. Insertion-ordered
    * (ListMap) so harness iteration follows registry order: the cheap scans
    * run first and absorb JVM/codegen warmup instead of whichever heavy
    * query a hash map happens to iterate first. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      Registry.declared.map(q => q.name -> q.build): _*)
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.declared.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
