package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry-path surface (SURVEY §2, round-9): the graded queries are
  * DataFrame plans; this tier drives the OTHER public face — a raw SQL
  * string through `spark.sql(...)` over `Graft.registerViews` — proving
  * the same engine serves ANSI-SQL clients (JDBC/Thrift-style access at
  * scale) against the identical data and decimal discipline. The Spark
  * and DuckDB texts are deliberately near-identical: the point of an SQL
  * surface is that the SAME query text travels between engines.
  */
object SqlSurface {

  /** Decimal-exact revenue expression, shared by both engines verbatim
    * (the D.net/oNet discipline spelled in portable SQL). round(.,2)
    * before the (18,2) narrowing is load-bearing: Spark's decimal
    * downcast rounds HALF_UP but DuckDB's TRUNCATES (measured:
    * 0.4360::DECIMAL(18,2) is 0.44 vs 0.43) — round() is HALF_UP in
    * BOTH, so the identical text yields the identical cent. */
  private val revenue =
    """CAST(CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |  * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |  AS DECIMAL(18,4))), 2) AS DECIMAL(18,2)) AS DOUBLE)""".stripMargin

  private def q3Text(tsType: String): String =
    s"""SELECT l_orderkey,
       |       $revenue AS revenue,
       |       CAST(o_orderdate AS $tsType) AS o_orderdate
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** TPC-H Q3 (shipping priority, adapted to the fixture's columns) via
    * the raw-SQL path. Catalyst gets only the string — broadcast
    * selection, filter pushdown and join order all come from the
    * optimizer, which is the point: the SQL surface inherits every plan
    * property the DataFrame tier demonstrates. The only engine-specific
    * token is the timestamp output type name (TIMESTAMP_NTZ vs
    * TIMESTAMP), substituted into otherwise identical text. */
  val sqlQ3Shipping = Q(
    "sql_q3_shipping",
    (spark: SparkSession, sfDir: String) => {
      graft.Graft.registerViews(spark, sfDir)
      spark.sql(q3Text("TIMESTAMP_NTZ"))
    },
    Some(q3Text("TIMESTAMP")))

  def qs: Seq[Q] = Seq(sqlQ3Shipping)
}
