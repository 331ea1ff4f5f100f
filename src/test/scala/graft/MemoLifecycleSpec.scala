package graft

import graft.queries.Registry
import graft.util.Memo

/** Memo lifecycle discipline (r4 verdict #4): repeat invocations of the
  * memoized queries must not grow the session's cache, and clear() must
  * release every cached block — the leak-pattern guard for a long-lived
  * production session reusing one SparkSession across many fixture dirs. */
class MemoLifecycleSpec extends SparkSpec {

  // every query whose plan builds through util.Memo (persisted signature/
  // edge frames + the three ANN index builds)
  private val memoized = Seq("text_simhash_band_pairs", "vec_dup_clusters",
    "minhash_lsh_jaccard", "vec_ann_lsh", "vec_ann_ivf")

  // one persisted RDD per materialized cached frame — the exact resource
  // whose unbounded growth the memo exists to prevent
  private def cachedCount: Int = spark.sparkContext.getPersistentRDDs.size

  test("repeat invocations reuse one cached copy per build — no growth") {
    Memo.clear(spark)
    memoized.foreach(n => Registry.byName(n).build(spark, sf0001).count())
    val entriesAfterFirst = Memo.entryCount(spark)
    val cachedAfterFirst = cachedCount
    (1 to 3).foreach { _ =>
      memoized.foreach(n => Registry.byName(n).build(spark, sf0001).count())
    }
    assert(Memo.entryCount(spark) == entriesAfterFirst,
      "repeat invocations must not add memo entries")
    assert(cachedCount == cachedAfterFirst,
      "repeat invocations must not stack persisted copies")
  }

  test("clear() disposes every entry and unpersists every cached block") {
    Memo.clear(spark)
    val base = cachedCount // residue from non-memo suites, if any
    memoized.foreach(n => Registry.byName(n).build(spark, sf0001).count())
    assert(Memo.entryCount(spark) > 0)
    assert(cachedCount > base)
    Memo.clear(spark)
    assert(Memo.entryCount(spark) == 0)
    assert(cachedCount == base,
      "all memoized persisted frames must be unpersisted after clear()")
    // and the queries still work afterwards — clear is safe mid-session
    assert(Registry.byName("vec_ann_ivf").build(spark, sf0001).count() > 0)
    Memo.clear(spark)
  }

  test("index memo key changes when a fixture file is regenerated in place") {
    // r9 closed the ADVICE-r8 staleness holes by folding the input files'
    // (name, size, mtime) footprint into Ops.indexKey; this pins it: the
    // recurring hazard is the DRIVER regenerating /root/testdata fixtures
    // mid-stream (r7 and r9 both did), which changes bytes under an
    // unchanged path. Replayed here against a temp copy (testdata itself
    // is read-only to us, and the hazard is about the path staying fixed).
    val tmp = new java.io.File(graft.queries.Streaming.tempDir("graft-regen"))
    val path = new java.io.File(tmp, "embeddings.parquet").getAbsolutePath
    try {
      val src = spark.read.parquet(s"$sf0001/embeddings.parquet")
      src.write.mode("overwrite").parquet(path)
      def key(): String = {
        val df = spark.read.parquet(path)
        graft.ops.Ops.indexKey(df, df("vec_id"), df("embedding"))
      }
      val k1 = key()
      assert(key() == k1, "stable fixture -> stable key (cache can hit)")
      var built = 0
      Memo(spark, k1) { built += 1; "idx-v1" }
      Memo(spark, k1) { built += 1; "idx-v1" }
      assert(built == 1, "unchanged fixture must serve the memoized build")
      // the regeneration: same path, new bytes/files (what gen_sf.py does)
      src.limit(100).write.mode("overwrite").parquet(path)
      val k2 = key()
      assert(k2 != k1,
        "in-place fixture regeneration must change the index key")
      Memo(spark, k2) { built += 1; "idx-v2" }
      assert(built == 2,
        "the new key must MISS the cache — the index frame is rebuilt")
      Memo.evict(spark, k1); Memo.evict(spark, k2)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("docToks and mhsig memo keys change when documents.parquet is regenerated in place") {
    // VERDICT-r10 #5: the doctoks/mhsig session memos keyed on sfDir
    // alone survived an in-place fixture regeneration (the r7/r9 driver
    // hazard) and served frames built from the OLD bytes. Their keys now
    // carry Tables.tableKey's (name, size, mtime) footprint. Replayed
    // against a temp copy, same as the index-key test above.
    val tmp = new java.io.File(graft.queries.Streaming.tempDir("graft-dt-regen"))
    val dir = tmp.getAbsolutePath
    try {
      Memo.clear(spark)
      val src = spark.read.parquet(s"$sf0001/documents.parquet")
      src.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val n1 = graft.queries.TextOps.docToks(spark, dir).count()
      Registry.byName("text_minhash_jaccard_est").build(spark, dir).count()
      val entries = Memo.entryCount(spark)
      graft.queries.TextOps.docToks(spark, dir).count()
      Registry.byName("text_minhash_jaccard_est").build(spark, dir).count()
      assert(Memo.entryCount(spark) == entries,
        "stable fixture -> both memos must HIT")
      // the regeneration: same path, new bytes (what gen_sf.py does)
      src.limit(100).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val n2 = graft.queries.TextOps.docToks(spark, dir).count()
      assert(n2 == 100 && n2 != n1,
        "docToks must rebuild from the NEW bytes, not serve the stale frame")
      Registry.byName("text_minhash_jaccard_est").build(spark, dir).count()
      assert(Memo.entryCount(spark) > entries,
        "regeneration must MISS both memos (new footprint-bearing keys)")
    } finally {
      Memo.clear(spark)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("scanCache: regen replaces in place — one live entry per (session, path)") {
    // VERDICT-r17 #6 / ADVICE-r17: the r17 scanCache keyed on the
    // footprint itself, so every in-place fixture regeneration GREW the
    // map (old plan stranded, strongly held). Post-restructure the cache
    // is (session -> path -> (footprint, plan)): a regeneration must
    // REPLACE the entry — serving the new bytes — and freeCaches must
    // drop the session slice entirely.
    val tmp = new java.io.File(graft.queries.Streaming.tempDir("graft-scache-regen"))
    val dir = tmp.getAbsolutePath
    val path = s"$dir/nation.parquet"
    try {
      val src = spark.read.parquet(s"$sf0001/nation.parquet")
      src.write.mode("overwrite").parquet(path)
      val n1 = graft.util.Tables(spark, dir, "nation").count()
      assert(graft.util.Tables.scanCacheEntries(spark, path) == 1)
      graft.util.Tables(spark, dir, "nation").count() // hit, no growth
      assert(graft.util.Tables.scanCacheEntries(spark, path) == 1)
      // the regeneration: same path, new bytes (what gen_sf.py does)
      src.limit(3).write.mode("overwrite").parquet(path)
      val n2 = graft.util.Tables(spark, dir, "nation").count()
      assert(n2 == 3 && n2 != n1,
        "regenerated fixture must be re-read, not served stale")
      assert(graft.util.Tables.scanCacheEntries(spark, path) == 1,
        "regen must REPLACE the (session, path) entry, not strand the old one")
      Graft.freeCaches(spark)
      assert(graft.util.Tables.scanCacheEntries(spark, path) == 0,
        "freeCaches must drop the session's scan-cache slice")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }

  test("an evict that races ahead of the force cannot strand a persist") {
    // ADVICE-r10 (medium): withDispose publishes the Entry via putIfAbsent
    // BEFORE forcing the lazy build, so an evict/clear can land while
    // evaluated=false (disposer no-ops) and the subsequent force then runs
    // a .persist()-ing build with the entry already out of the map —
    // stranding cached blocks beyond Memo.clear's reach. Deterministic
    // replay: the build evicts its OWN key mid-build (dispose() is
    // re-entrant on the Entry monitor the lazy init holds), which is
    // exactly the remove-before-force interleaving. Post-fix, the
    // forced-after-dispose build must immediately run its disposer.
    Memo.clear(spark)
    val df = Memo.withDispose(spark, "race-key") {
      val d = spark.range(32).toDF().persist()
      d.count()
      Memo.evict(spark, "race-key") // lands with evaluated still false
      d
    } { d => d.unpersist(false) }
    assert(Memo.entryCount(spark) == 0)
    assert(df.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "forced-after-dispose build must immediately self-dispose")
    // and the value stays usable — unpersisted merely recomputes
    assert(df.count() == 32)
  }

  test("evict() frees one key, leaves the rest") {
    Memo.clear(spark)
    val a = Memo(spark, "k1") { spark.range(10).toDF().persist() }
    a.count()
    Memo(spark, "k2") { "plain-value" }
    assert(Memo.entryCount(spark) == 2)
    Memo.evict(spark, "k1")
    assert(Memo.entryCount(spark) == 1)
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "evict must unpersist a DataFrame value")
    Memo.evict(spark, "k2") // disposer is a no-op for non-Dataset values
    assert(Memo.entryCount(spark) == 0)
  }
}
