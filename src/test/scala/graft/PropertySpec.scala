package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Algebraic/invariant checks over the real operator outputs (SURVEY §5.4):
  * cheap cross-checks that hold at every scale factor by construction. */
class PropertySpec extends SparkSpec {

  test("jaccard scores are within [0,1] and the pair set covers all capped docs") {
    val j = Registry.byName("text_jaccard_pairs").build(spark, sf0001)
    val bad = j.filter(col("jaccard") < 0 || col("jaccard") > 1).count()
    assert(bad == 0)
    assert(j.count() == 50L * 49L / 2) // every pair shares ≥1 token in fixtures
  }

  test("minhash LSH captures every exact-jaccard >= 0.7 pair (the graded recall contract)") {
    val g = Registry.byName("minhash_lsh_jaccard").build(spark, sf0001)
    assert(g.count() > 0, "no high-similarity pairs in the fixture slice")
    assert(g.filter(!col("captured_by_lsh")).count() == 0,
      "seeded LSH missed a j >= 0.7 pair — the graded boolean would break parity")
    // the emitted pair set is exactly text_jaccard_pairs' rows above 0.7
    val exact = Registry.byName("text_jaccard_pairs").build(spark, sf0001)
      .filter(col("jaccard") >= 0.7)
    assert(g.count() == exact.count())
  }

  test("l2-normalized components have magnitude <= 1 and positive norms") {
    val v = Registry.byName("vec_l2_normalize").build(spark, sf0001)
    assert(v.filter(col("l2_norm") <= 0).count() == 0)
    assert(v.filter(abs(col("n1")) > 1 || abs(col("n2")) > 1 ||
      abs(col("n3")) > 1 || abs(col("n4")) > 1).count() == 0)
  }

  test("cosine similarities lie in [-1, 1]") {
    val k = Registry.byName("vec_cosine_topk").build(spark, sf0001)
    assert(k.filter(col("cos_sim") < -1 || col("cos_sim") > 1).count() == 0)
    assert(k.count() == 10)
  }

  test("union-all count additivity; intersect/except partition the left set") {
    val all = Registry.byName("set_union_all").build(spark, sf0001).count()
    assert(all == 150 + 10) // customer + supplier at sf0.001
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_nationkey")).distinct().count()
    val inter = Registry.byName("set_intersect").build(spark, sf0001).count()
    val exc = spark.read.parquet(s"$sf0001/customer.parquet")
      .select(col("c_nationkey").as("nationkey")).distinct()
      .except(Registry.byName("set_union_distinct").build(spark, sf0001)
        .limit(0)) // sanity: except with empty right = identity
      .count()
    assert(exc == cust)
    assert(inter <= cust)
  }

  test("top-k per group is a subset of the full ranking prefix") {
    val top3 = Registry.byName("win_topk_group").build(spark, sf0001)
    assert(top3.filter(col("rn") > 3).count() == 0)
    val perCust = top3.groupBy("o_custkey").count()
    assert(perCust.filter(col("count") > 3).count() == 0)
  }

  test("rollup row count = leaves + per-nation subtotals + grand total") {
    val roll = Registry.byName("agg_rollup").build(spark, sf0001)
    val leaves = spark.read.parquet(s"$sf0001/customer.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_mktsegment").distinct().count()
    val nations = spark.read.parquet(s"$sf0001/customer.parquet")
      .join(spark.read.parquet(s"$sf0001/nation.parquet"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name").distinct().count()
    assert(roll.count() == leaves + nations + 1)
  }

  test("resampled values are bracketed by neighbor observations; cluster labels are component-consistent") {
    // interp invariant: every grid value lies within [min, max] of the two
    // observations that produced it — equivalently within the per-user
    // global [min, max] envelope, plus endpoint grid values equal the
    // boundary observations by construction
    val r = Registry.byName("ts_resample_interp").build(spark, sf0001)
    val env = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("user_id") < 20)
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
    val out = r.join(env, "user_id")
      .filter(col("v_interp") < col("lo") || col("v_interp") > col("hi"))
    assert(out.count() == 0)
    // cluster labels: every vec's label must be <= its own id (labels only
    // travel downward), and two vecs sharing an edge agree after 2 rounds
    // on the diameter<=2 fixture graph components
    val c = Registry.byName("vec_dup_clusters").build(spark, sf0001)
    assert(c.filter(col("cluster") > col("vec_id")).count() == 0)
  }

  test("token chunks tile each document: strides cover every token exactly once per 48-stride") {
    val chunks = Registry.byName("ml_token_chunks").build(spark, sf0001)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ", -1)).as("n_toks"))
    // chunk_no is dense from 0, and the LAST chunk's start (chunk_no*48+1)
    // must be <= n_toks (no empty trailing chunk)
    val agg = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("chunk_no").as("last_no"),
        min("chunk_no").as("first_no"))
      .join(docs, "doc_id")
    assert(agg.filter(col("first_no") =!= 0).count() == 0)
    assert(agg.filter(col("n_chunks") =!= col("last_no") + 1).count() == 0)
    assert(agg.filter(col("last_no") * 48 + 1 > col("n_toks")).count() == 0)
  }

  test("approx distinct is within the graded 5% ε on every group") {
    val a = Registry.byName("agg_approx_distinct").build(spark, sf0001)
    assert(a.filter(!col("within_eps")).count() == 0)
  }
}
