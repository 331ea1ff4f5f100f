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
  * entry instead of re-fitting / re-persisting per call.
  *
  * Lifecycle is EXPLICIT: `evict`/`clear` dispose entries (unpersisting
  * any cached frames they hold). The session key is weak only to isolate
  * concurrent sessions; it cannot reclaim a stopped session by itself,
  * because cached values (DataFrames, fitted models) strongly reference
  * their SparkSession via `df.sparkSession` — the classic WeakHashMap
  * caveat that a value strongly reaching its key pins the entry forever.
  * A long-lived session must call `Graft.freeCaches` (or `Memo.clear`)
  * when done with a fixture dir; Bench/Verify do so before stopping. */
object Memo {
  import org.apache.spark.sql.SparkSession

  /** One memo slot. The build is deferred behind a lazy val so it runs
    * OUTSIDE the session map's critical section (ADVICE-r9: some builds
    * run real Spark actions — the bloom-filter `head()`, the sink tier's
    * parquet writes — and evaluating those under a session-wide lock
    * serialized every concurrent memoized build). `lazy val` initializes
    * under this Entry's own monitor, so concurrent readers of the SAME
    * key still get exactly one build; `dispose` shares that monitor and
    * only fires if the build actually ran — disposing a never-forced
    * loser entry must not trigger the build it exists to avoid. */
  private final class Entry(build0: () => (AnyRef, () => Unit)) {
    @volatile private var evaluated = false
    private var dead = false        // guarded by this
    private var disposerRan = false // guarded by this
    private lazy val resolved: (AnyRef, () => Unit) = {
      val r = build0(); evaluated = true; r
    }
    /** Forces the build, then closes the remove-vs-force window
      * (ADVICE-r10 medium): an evict/clear that ran while evaluated was
      * still false no-op'd its dispose, after which this force would run
      * a `.persist()`-ing build with the entry already out of the map —
      * stranding cached blocks beyond Memo.clear's reach. dispose() now
      * marks the entry dead, and a forced-after-dispose build runs its
      * disposer immediately (under the same monitor the lazy init uses,
      * so it cannot race a concurrent dispose). The caller still gets a
      * usable value — an unpersisted frame merely recomputes on use. */
    def value: AnyRef = {
      val v = resolved._1
      synchronized { if (dead) runDisposerOnce() }
      v
    }
    def dispose(): Unit = synchronized {
      dead = true
      if (evaluated) runDisposerOnce()
    }
    // callers hold the monitor; disposer must fire at most once even when
    // both the dispose() path and the forced-after-dispose path reach it
    private def runDisposerOnce(): Unit =
      if (!disposerRan) { disposerRan = true; resolved._2() }
  }

  private val perSession =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Entry]]

  /** Memoize `build`, disposing on evict by unpersisting the value when
    * it is a Dataset/DataFrame (the common case). Values that hold cached
    * frames indirectly should use `withDispose`. */
  def apply[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T =
    withDispose(spark, key)(build) {
      case ds: org.apache.spark.sql.Dataset[_] => ds.unpersist(false)
      case _ => ()
    }

  /** Memoize `build` with an explicit disposer run on evict/clear.
    * putIfAbsent elects one winner per key; only the INSERTED entry's
    * build is ever forced, so a racing loser's `.persist()`-ing build
    * never runs and cannot strand cached blocks. Builds for DIFFERENT
    * keys proceed concurrently — the map itself is only touched by the
    * lock-free TrieMap CAS. */
  def withDispose[T <: AnyRef](spark: SparkSession, key: String)
      (build: => T)(dispose: T => Unit): T = {
    val m = mapFor(spark)
    val fresh = new Entry(() => { val v = build; (v, () => dispose(v)) })
    val e = m.putIfAbsent(key, fresh).getOrElse(fresh)
    e.value.asInstanceOf[T]
  }

  /** Dispose and drop one entry (pure no-op when the session has no map —
    * must not insert one, or clears on unused sessions would mutate the
    * registry and pin map churn under the perSession lock). */
  def evict(spark: SparkSession, key: String): Unit =
    existingMapFor(spark).foreach { m =>
      m.remove(key).foreach(_.dispose())
    }

  /** Dispose and drop every entry of this session — unpersists all memoized
    * cached frames. Safe to call mid-session: the next invocation simply
    * rebuilds. Pure no-op for sessions that never memoized. */
  def clear(spark: SparkSession): Unit =
    existingMapFor(spark).foreach { m =>
      m.keys.toList.foreach(k => m.remove(k).foreach(_.dispose()))
    }

  /** Live entry count (test/telemetry hook for bounded-cache assertions). */
  def entryCount(spark: SparkSession): Int =
    existingMapFor(spark).fold(0)(_.size)

  private def existingMapFor(spark: SparkSession)
      : Option[scala.collection.concurrent.TrieMap[String, Entry]] =
    perSession.synchronized { Option(perSession.get(spark)) }

  private def mapFor(spark: SparkSession) = perSession.synchronized {
    var inner = perSession.get(spark)
    if (inner == null) {
      inner = scala.collection.concurrent.TrieMap.empty[String, Entry]
      perSession.put(spark, inner)
    }
    inner
  }
}
