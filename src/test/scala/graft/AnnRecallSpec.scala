package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Pins the LSH ANN path's quality against the exact cosine baseline. */
class AnnRecallSpec extends SparkSpec {
  test("vec_ann_lsh recalls most of the exact cosine top-10") {
    val exact = Registry.byName("vec_cosine_topk").build(spark, sf001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val approx = Registry.byName("vec_ann_lsh").build(spark, sf001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 = $recall (exact=$exact approx=$approx)")
  }

  test("vec_ann_ivf probes 3 of 8 cells and still recalls some exact neighbors") {
    val exact = Registry.byName("vec_cosine_topk").build(spark, sf001)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = Registry.byName("vec_ann_ivf").build(spark, sf001).collect()
    assert(ivf.length == 10)
    val approx = ivf.map(_.getLong(0)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall@10 = $recall")
    // cosine values must be valid similarities
    assert(ivf.forall { r => val c = r.getDouble(1); c >= -1.0 && c <= 1.0 })
  }

  test("vec_prefix_rerank end-to-end recall vs exact full-dim top-10 (coarse dim 32)") {
    // VERDICT-r11 #8: the composed operator's quality claim must cite the
    // graded curve. vec_matryoshka_recall measures prefix-32 ALONE at
    // recall 0.3 (sf0.1); the composition (shortlist 50 + exact re-rank)
    // must do strictly better — pin the floor at both graded SFs.
    for (sf <- Seq(sf001, sf01)) {
      val exact = Registry.byName("vec_cosine_topk").build(spark, sf)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val rr = Registry.byName("vec_prefix_rerank").build(spark, sf)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = (exact intersect rr).size.toDouble / exact.size
      assert(recall >= 0.5,
        s"$sf: prefix-rerank recall@10 = $recall (exact=$exact got=$rr)")
    }
  }

  test("vec_ann_lsh approx cosine tracks the exact similarity within 0.05") {
    val exact = Registry.byName("vec_cosine_topk").build(spark, sf001)
      .withColumnRenamed("cos_sim", "exact_cos")
    val approx = Registry.byName("vec_ann_lsh").build(spark, sf001)
    val joined = approx.join(exact, "vec_id")
    val maxErr = joined.agg(max(abs(col("approx_cos") - col("exact_cos"))))
      .head().getDouble(0)
    assert(maxErr < 0.05, s"max |approx-exact| = $maxErr")
  }
}
