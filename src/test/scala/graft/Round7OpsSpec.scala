package graft

import graft.ops.Ops
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-7 invariants: the clustered-corpus mechanisms measured in
  * BASELINE.md's round-7 tables, pinned at spec scale on a deterministic
  * in-memory Gaussian-mixture corpus (no dependency on generated fixture
  * dirs), plus the fail-loud PQ codebook guard (ADVICE r6).
  */
class Round7OpsSpec extends SparkSpec {

  /** Deterministic 8-center mixture, 400 vectors × 16 dims, unit centers,
    * noise sigma 0.15 (same-cluster cosine ≈ 0.74 — far from both the
    * dedup thresholds used below), plus 5 EXACT duplicates of ids
    * 100..104 appended as ids 400..404. */
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(8) {
      val c = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x / n).toFloat)
    }
    val base = (0 until 400).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    }
    val dups = (0 until 5).map(j => (400L + j, base(100 + j)._2))
    import spark.implicits._
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("semanticDedupCensus: pair work shrinks with cluster granularity, dups conserved") {
    def census(k: Int) = Ops.semanticDedupCensus(clustered,
        col("vec_id"), col("embedding"), k = k, simThreshold = 0.5)
      .agg(sum(col("n_members")).as("n"),
        sum(col("n_members") * (col("n_members") - 1) / 2).as("pairs"),
        sum(col("n_dups")).as("dups"))
      .head()
    val (c4, c16) = (census(4), census(16))
    // membership conservation: every vector lands in exactly one cluster
    assert(c4.getLong(0) == 405L && c16.getLong(0) == 405L)
    // the SemDeDup bound: finer clustering strictly cuts the quadratic
    // candidate stage (the k ∝ n argument measured at sf1c in BASELINE.md)
    val (p4, p16) = (c4.getDouble(1), c16.getDouble(1))
    assert(p16 < p4, s"pairs k=16 ($p16) !< k=4 ($p4)")
    // the dedup RESULT survives finer granularity: only true
    // near-threshold pairs split across cluster boundaries may differ
    val (d4, d16) = (c4.getLong(2), c16.getLong(2))
    assert(d16 >= (d4 * 0.9).toLong && d16 <= d4,
      s"dups k=4 -> k=16 moved $d4 -> $d16 (expected <=10% loss)")
  }

  test("semanticDedupCensus: exact duplicates are flagged at ANY cluster granularity") {
    // identical embeddings get identical centroid distances, hence the
    // same cluster — an exact dup can never be split away from its
    // original, so at a threshold only exact pairs reach (0.999) the
    // census finds exactly the 5 injected dups, at every k
    for (k <- Seq(2, 8, 32)) {
      val dups = Ops.semanticDedupCensus(clustered,
          col("vec_id"), col("embedding"), k = k, simThreshold = 0.999)
        .agg(sum(col("n_dups"))).head().getLong(0)
      assert(dups == 5L, s"k=$k: expected the 5 injected exact dups, got $dups")
    }
  }

  test("pqQuantize: a superset codebook never increases reconstruction error") {
    // seeds are `vec_id < numSeeds`, so the 32-codeword book CONTAINS the
    // 16-codeword book: per-subspace minima over a superset are pointwise
    // <=, and the fixed-order sum preserves that (FP rounding is monotone)
    val emb = graft.util.Tables.embeddings(spark, sf001)
    def errs(seeds: Int) = Ops.pqQuantize(emb, col("vec_id"),
        col("embedding"), m = 4, subDim = 16, numSeeds = seeds)
      .select(col("vec_id"), col("pq_err"))
    val joined = errs(16).withColumnRenamed("pq_err", "e16")
      .join(errs(32).withColumnRenamed("pq_err", "e32"), "vec_id")
    val violations = joined.filter(col("e32") > col("e16")).count()
    assert(violations == 0L, s"$violations vectors got WORSE with more codewords")
    // and strictly better somewhere — the extra codewords are used
    assert(joined.filter(col("e32") < col("e16")).count() > 0L)
  }

  test("pqDistances: a completely missing codebook fails loudly, not empty (ADVICE r6)") {
    // ids all >= numSeeds -> the seed frame is EMPTY; the guard must ride
    // the main path and throw instead of silently returning zero rows
    val noSeeds = clustered.filter(col("vec_id") >= 100)
    val ex = intercept[Exception] {
      Ops.pqQuantize(noSeeds, col("vec_id"), col("embedding"),
        m = 4, subDim = 4, numSeeds = 5).count()
    }
    assert(ex.getMessage != null)
  }
}
