package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator: the Spark build plus (usually) a DuckDB oracle.
  *
  * `oracle` is ANSI SQL the driver runs in DuckDB over the same parquet
  * tables (registered under their bare table names); `None` marks a
  * consciously oracle-less op (approximate / hash-family-specific) that the
  * driver records with a weaker rows-only check.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The single source of truth for the implemented operator inventory
  * (SURVEY §2). `SparkEntry.queries` / `oracleSql` derive from `declared`.
  *
  * Gating rule (SURVEY §7.3): a Q moves from a module's `qs` into the
  * declared set only after the local parity harness (tools/parity.py)
  * passes at sf0.001, sf0.01 and sf0.1.
  */
object Registry {
  def all: Seq[Q] =
    Scans.qs ++ Aggs.qs ++ Joins.qs ++ Windows.qs ++ SetOps.qs ++
      Fns.qs ++ Arrays.qs ++ TimeSeries.qs ++ MlPrep.qs ++ TextOps.qs ++
      Vectors.qs ++ Approx.qs

  def declared: Seq[Q] = all

  def byName(name: String): Q = all.find(_.name == name).get
}
