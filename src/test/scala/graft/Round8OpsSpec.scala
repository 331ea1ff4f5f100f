package graft

import graft.ops.Ops
import graft.util.Tables
import org.apache.spark.sql.functions._

/** Round-8 invariants: residual-PQ (IVF-PQ on residuals, the production
  * fix for plain PQ's within-cluster near-tie collapse measured in
  * BASELINE.md round 7). Pins the ADC≡reconstruction identity, probe
  * restriction, determinism, and the within-cluster resolution claim.
  */
class Round8OpsSpec extends SparkSpec {

  private def respq(kCent: Int, nProbes: Int, k: Int, seeds: Int = 16) =
    Ops.ivfResidualPqTopK(Tables.embeddings(spark, sf0001),
      col("vec_id"), col("embedding"), 0L, kCent, nProbes, k,
      m = 4, subDim = 16, numSeeds = seeds)

  test("residual ADC on a seed vector equals its true distance to the query (exact reconstruction)") {
    // A codebook seed's residual slices ARE codewords, so its
    // reconstruction c + r-hat is (floating-point-wise nearly) the vector
    // itself and ADC must equal l2sq(q, e) up to subspace-order rounding.
    val all = respq(kCent = 8, nProbes = 8, k = 500)
    val v = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), graft.util.V.dbl(col("embedding")).as("e"))
    val q = v.filter(col("vec_id") === 0L).select(col("e").as("qe"))
    graft.functions.L2Sq.register(spark)
    val seedRows = all.filter(col("vec_id") < 16 && col("vec_id") =!= 0L)
      .join(v, Seq("vec_id"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("adc_raw"),
        expr("l2sq_native(e, qe)").as("true_d2"))
      .collect()
    assert(seedRows.nonEmpty, "expected seed vectors among top-500")
    seedRows.foreach { r =>
      val (adc, d2) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(adc - d2) < 1e-9,
        s"vec ${r.getLong(0)}: adc=$adc true=$d2")
    }
  }

  test("residual ADC with one probe returns only members of the query's nearest cluster") {
    val one = respq(kCent = 8, nProbes = 1, k = 50).collect()
    assert(one.nonEmpty)
    val cids = one.map(_.getLong(1)).toSet
    assert(cids.size == 1, s"expected a single probed cluster, got $cids")
    // and that cluster is the query's own assignment (query can't beat
    // its own nearest centroid)
    val q = respq(kCent = 8, nProbes = 8, k = 500)
      .filter(col("vec_id") === 0L) // query excluded by construction
    assert(q.count() == 0)
  }

  test("residual ADC is deterministic (two runs bit-identical)") {
    val a = respq(kCent = 8, nProbes = 3, k = 10).collect().toSeq
    val b = respq(kCent = 8, nProbes = 3, k = 10).collect().toSeq
    assert(a == b)
  }

  test("residual coding beats raw-vector coding at equal budget on a clustered corpus") {
    // The round-7 BASELINE measurement at corpus scale, pinned at spec
    // scale: on a Gaussian-mixture corpus the centroid carries the coarse
    // position, so residual codes spend their budget on the within-cluster
    // displacement that raw PQ wastes on cluster structure. Compare mean
    // ADC-vs-true-rank agreement via recall@10 against the exact top-10.
    val rnd = new scala.util.Random(8)
    val dim = 64
    val centers = Array.fill(8) {
      val c = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(c.map(x => x * x).sum)
      c.map(x => (x / n).toFloat)
    }
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val c = centers(i % 8)
      val e = c.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
      val n = math.sqrt(e.map(x => x.toDouble * x).sum)
      (i.toLong, e.map(x => (x / n).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    graft.functions.L2Sq.register(spark)
    val v = df.select(col("vec_id"), graft.util.V.dbl(col("embedding")).as("e"))
    val q = v.filter(col("vec_id") === 0L).select(col("e").as("qe"))
    val exact = v.filter(col("vec_id") =!= 0L).crossJoin(broadcast(q))
      .select(col("vec_id"), expr("l2sq_native(e, qe)").as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val raw = Ops.pqAdcTopK(df, col("vec_id"), col("embedding"), 0L,
        10, 4, 16, 16).collect().map(_.getLong(0)).toSet
    val res = Ops.ivfResidualPqTopK(df, col("vec_id"), col("embedding"),
        0L, 8, 8, 10, 4, 16, 16).collect().map(_.getLong(0)).toSet
    val (rawRecall, resRecall) =
      ((exact & raw).size, (exact & res).size)
    assert(resRecall >= rawRecall,
      s"residual recall $resRecall < raw recall $rawRecall")
    assert(resRecall >= 5, s"residual recall too low: $resRecall/10")
  }
}
