package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared vector column algebra — ONE implementation of the fold shapes
  * whose exact left-to-right order the DuckDB oracles mirror (SURVEY §2
  * policy #4). Both the graded queries (queries/Vectors.scala) and the
  * user-facing API (ops/Ops.scala) build on these, so a null/zero-norm
  * semantics fix lands everywhere at once. */
object V {

  /** Cast float[] to double[] BEFORE any arithmetic (policy #4). */
  def dbl(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right sum fold == DuckDB list_aggregate('sum'). */
  def sumArr(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    sumArr(zip_with(a, b, (x, y) => x * y))

  def norm(c: Column): Column = sqrt(sumArr(transform(c, x => x * x)))
}

/** Per-session memo for expensive deterministic builds (ANN indexes,
  * persisted signature/edge frames): reps and repeat invocations reuse one
  * entry instead of re-fitting / re-persisting per call. Keyed WEAKLY on
  * the SparkSession itself, so a stopped session's entries (and their
  * persisted RDDs) become collectable instead of pinning the old session
  * forever — and two sessions can never collide the way an
  * identityHashCode string key could. */
object Memo {
  private val perSession =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      scala.collection.concurrent.TrieMap[String, AnyRef]]

  def apply[T <: AnyRef](spark: org.apache.spark.sql.SparkSession,
      key: String)(build: => T): T = {
    val m = perSession.synchronized {
      var inner = perSession.get(spark)
      if (inner == null) {
        inner = scala.collection.concurrent.TrieMap.empty[String, AnyRef]
        perSession.put(spark, inner)
      }
      inner
    }
    // build under the map's lock: a racy getOrElseUpdate could evaluate a
    // .persist()-ing build twice and strand the loser's cached blocks with
    // no unpersist handle. Builds are plan construction (persist() is lazy
    // metadata), so holding the lock is cheap.
    m.synchronized {
      m.getOrElseUpdate(key, build).asInstanceOf[T]
    }
  }
}
