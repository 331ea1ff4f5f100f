package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Vector-tier measurement main (r6 verdict #4/#5): the ANN recall table
  * and the SemDeDup pair-work census, runnable against ANY fixture dir —
  * in particular the clustered Gaussian-mixture embeddings from
  * `tools/gen_sf.py --clusters C`, the non-adversarial shape where IVF
  * cell-pruning and PQ codebooks are claimed to recover recall that the
  * uniform-random driver fixtures (the documented adversarial case)
  * cannot show.
  *
  * Prints one JSON line per measurement; results are recorded in
  * BASELINE.md. Dev-tooling like Bench — the engine itself never calls
  * this.
  *
  * Usage: graft.VecBench <sfDir> [ann|semdedup|all]
  */
object VecBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1c")
    val mode = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(16).count()
    if (mode == "ann" || mode == "all") annTable(spark, sfDir)
    if (mode == "semdedup" || mode == "all") semDedupCensus(spark, sfDir)
    Graft.freeCaches(spark)
    spark.stop()
  }

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, math.rint((System.nanoTime() - t0) / 1e6) / 1e3)
  }

  /** Recall@10 of each ANN method vs the brute-force exact cosine top-10
    * (the vec_cosine_topk definition; for L2-normalized vectors the
    * squared-L2 ordering PQ-ADC approximates is the same ordering, so one
    * exact set serves all methods). Cold = first call (index fit +
    * query), warm = second call (index memoized per session — the
    * production serve shape). */
  private def annTable(spark: SparkSession, sfDir: String): Unit = {
    import graft.queries.{Registry, Approx}
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val (exact, exactCold) =
      timed(ids(Registry.byName("vec_cosine_topk").build(spark, sfDir)))
    val (_, exactWarm) =
      timed(ids(Registry.byName("vec_cosine_topk").build(spark, sfDir)))
    def report(method: String, params: String, cold: Double, warm: Double,
        got: Set[Long]): Unit = {
      val recall = (exact intersect got).size
      println(s"""{"bench":"ann_recall","sf":"$sfDir","method":"$method","params":"$params","cold_sec":$cold,"warm_sec":$warm,"recall_at_10":$recall}""")
    }
    report("exact_brute_force", "fused cosine_native", exactCold, exactWarm,
      exact)
    val (lsh, lshCold) =
      timed(ids(Registry.byName("vec_ann_lsh").build(spark, sfDir)))
    val (_, lshWarm) =
      timed(ids(Registry.byName("vec_ann_lsh").build(spark, sfDir)))
    report("lsh", "6 tables, bucket 0.5", lshCold, lshWarm, lsh)
    for ((cells, probes) <- Seq((8, 3), (8, 8), (32, 3))) {
      val (ivf, cold) = timed(ids(Approx.ivfTopK(spark, sfDir, cells, probes, 10)))
      val (_, warm) = timed(ids(Approx.ivfTopK(spark, sfDir, cells, probes, 10)))
      report("ivf", s"$cells cells, probe $probes", cold, warm, ivf)
    }
    // (16, 4, *) rows: the r8 analysis concluded near-tie corpora need
    // MORE SUBSPACES (finer quantization floor), not better codewords —
    // M=16 × 4-dim is that measured point (r8 verdict #5). fit>0 rows
    // (r9 verdict #4): Lloyd-refined codebooks — the untested lever on
    // the index-only recall ceiling; measurement path only, graded
    // queries stay seeded.
    for ((m, subDim, seeds, fit) <- Seq((4, 16, 16, 0), (8, 8, 16, 0),
        (4, 16, 64, 0), (8, 8, 64, 0), (4, 16, 256, 0), (16, 4, 64, 0),
        (16, 4, 256, 0), (4, 16, 64, 1), (16, 4, 64, 1), (4, 16, 256, 1),
        (16, 4, 256, 1), (4, 16, 256, 2), (16, 4, 256, 2))) {
      val emb = util.Tables.embeddings(spark, sfDir)
      val (pq, cold) = timed(ids(ops.Ops.pqAdcTopK(emb, col("vec_id"),
        col("embedding"), 0L, 10, m, subDim, seeds, fit)))
      val (_, warm) = timed(ids(ops.Ops.pqAdcTopK(emb, col("vec_id"),
        col("embedding"), 0L, 10, m, subDim, seeds, fit)))
      report("pq_adc", s"M=$m x ${subDim}-dim, $seeds codewords" +
        (if (fit > 0) s", $fit Lloyd-fit iters" else ""), cold, warm, pq)
    }
    // residual-PQ (r7 verdict #7 stretch): same PQ budget, but codes
    // resolve the residual to the assigned IVF centroid — the standard
    // production fix for plain PQ's within-cluster near-tie collapse.
    for ((cells, probes, seeds, fit) <- Seq((32, 3, 16, 0), (32, 3, 64, 0),
        (32, 8, 64, 0), (8, 8, 64, 0), (8, 8, 256, 0), (8, 3, 256, 0),
        (8, 8, 64, 1), (8, 8, 256, 1), (32, 3, 256, 1),
        (8, 8, 64, 2), (8, 8, 256, 2), (32, 3, 64, 2))) {
      val emb = util.Tables.embeddings(spark, sfDir)
      val (rpq, cold) = timed(ids(ops.Ops.ivfResidualPqTopK(emb,
        col("vec_id"), col("embedding"), 0L, cells, probes, 10, 4, 16,
        seeds, fit)))
      val (_, warm) = timed(ids(ops.Ops.ivfResidualPqTopK(emb,
        col("vec_id"), col("embedding"), 0L, cells, probes, 10, 4, 16,
        seeds, fit)))
      report("ivf_residual_pq",
        s"$cells cells, probe $probes, M=4 x 16-dim, $seeds codewords" +
          (if (fit > 0) s", $fit Lloyd-fit iters" else ""),
        cold, warm, rpq)
    }
    // Matryoshka prefix-16 coarse rank + exact re-rank (r8): truncation
    // as the coarse stage — no index build, 4x less arithmetic/candidate.
    val (px, pxCold) =
      timed(ids(Registry.byName("vec_prefix_rerank").build(spark, sfDir)))
    val (_, pxWarm) =
      timed(ids(Registry.byName("vec_prefix_rerank").build(spark, sfDir)))
    report("prefix_rerank", "16-dim prefix, shortlist 50", pxCold, pxWarm, px)
  }

  /** SemDeDup pair-work census over the FULL corpus (no vec_id cap — the
    * graded query's 500-vector cap is its fixture-scale instantiation;
    * here the cap is parameterized out, r6 verdict #5): run
    * Ops.semanticDedupCensus at two k settings and derive the
    * within-cluster candidate-pair count sum(n_i·(n_i−1)/2) from the
    * census itself. The claim under test: pair work is bounded by cluster
    * granularity — k× more clusters ⇒ ~k× fewer pairs — which is why
    * production SemDeDup picks k ∝ n. */
  private def semDedupCensus(spark: SparkSession, sfDir: String): Unit = {
    val emb = util.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    for (k <- Seq(8, 64)) {
      val (census, sec) = timed {
        ops.Ops.semanticDedupCensus(emb, col("vec_id"), col("embedding"),
            k = k, simThreshold = 0.9)
          .agg(sum(col("n_members")).as("n"),
            sum(col("n_members") * (col("n_members") - 1) / 2).as("pairs"),
            sum(col("n_dups")).as("dups"),
            max(col("n_members")).as("max_cluster"))
          .head()
      }
      println(s"""{"bench":"semdedup","sf":"$sfDir","n_vectors":$n,"k":$k,"sim_threshold":0.9,"within_cluster_pairs":${census.getAs[Any]("pairs")},"n_dups":${census.getAs[Any]("dups")},"max_cluster":${census.getAs[Any]("max_cluster")},"sec":$sec}""")
    }
  }
}
