package graft

import graft.functions.DotProduct
import graft.queries.Registry
import org.apache.spark.sql.functions._

/** The native codegen'd DotProduct must be bit-identical to the
  * higher-order formulation — same left-to-right fold. */
class NativeDotSpec extends SparkSpec {

  test("dot_native == aggregate(zip_with(...)) bit-for-bit on all fixture vectors") {
    DotProduct.register(spark)
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val both = graft.util.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), dbl.as("e"))
      .select(col("vec_id"),
        expr("dot_native(e, e)").as("native"),
        aggregate(zip_with(col("e"), col("e"), (a, b) => a * b), lit(0.0),
          (acc, x) => acc + x).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("dot_native handles null arrays and length mismatches") {
    DotProduct.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.0))), // min-length fold
      (2L, None, Some(Seq(1.0)))                           // null → null
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), expr("dot_native(a, b)").as("d"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 11.0)
    assert(out(1).isNullAt(1))
  }

  test("native variant returns the same top-10 as the higher-order variant") {
    val a = Registry.byName("vec_cosine_topk").build(spark, sf001).collect().toSeq
    val b = Registry.byName("vec_cosine_topk_native").build(spark, sf001).collect().toSeq
    assert(a == b)
  }

  test("cosine_native == dot/sqrt composition bit-for-bit, and nulls propagate") {
    DotProduct.register(spark)
    graft.functions.CosineSim.register(spark)
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val emb = graft.util.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), dbl.as("e"))
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val both = emb.filter(col("vec_id") =!= 0).crossJoin(q)
      .select(
        expr("cosine_native(e, qe)").as("fused"),
        (expr("dot_native(e, qe)") /
          (sqrt(expr("dot_native(e, e)")) * sqrt(expr("dot_native(qe, qe)"))))
          .as("composed"))
    assert(both.filter(col("fused") =!= col("composed")).count() == 0)

    import spark.implicits._
    val nulls = Seq((1L, Option.empty[Seq[Double]], Some(Seq(1.0))))
      .toDF("id", "a", "b")
      .select(expr("cosine_native(a, b)").as("c")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("cosine_native unequal-length contract: bit-identical to the composed formulation") {
    // the doc comment's claim, enforced: dot folds over min(len) while
    // |a|² covers ALL of a and |b|² ALL of b — exactly what
    // dot_native(a,b)/(sqrt(dot_native(a,a))*sqrt(dot_native(b,b))) does
    DotProduct.register(spark)
    graft.functions.CosineSim.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 7.0), Seq(3.0, 4.0)),       // a longer
      (2L, Seq(1.0, 2.0), Seq(3.0, 4.0, -5.0, 0.5)), // b longer
      (3L, Seq(2.0, -1.0), Seq(2.0, -1.0))           // equal (control)
    ).toDF("id", "a", "b")
      .select(col("id"),
        expr("cosine_native(a, b)").as("fused"),
        (expr("dot_native(a, b)") /
          (sqrt(expr("dot_native(a, a)")) * sqrt(expr("dot_native(b, b)"))))
          .as("composed"))
    assert(df.filter(col("fused") =!= col("composed")).count() == 0)
  }

  test("wrong arity surfaces as an analysis error, not IndexOutOfBounds") {
    graft.functions.L2Sq.register(spark)
    import spark.implicits._
    Seq(Seq(1.0)).toDF("a").createOrReplaceTempView("arity_t")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT l2sq_native(a) FROM arity_t").collect()
    }
    assert(e.getMessage.contains("l2sq_native"))
    assert(e.getCondition != null && e.getCondition.startsWith("WRONG_NUM_ARGS"))
  }

  test("the generated plan keeps dot_native inside whole-stage codegen") {
    DotProduct.register(spark)
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val q = graft.util.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), dbl.as("e"))
      .select(expr("dot_native(e, e)").as("d"))
      .filter(col("d") > 0)
    // a leading `*(n)` marks an operator inside a WholeStageCodegen stage;
    // note the interpreted `transform` HOF projection between scan and
    // dot_native carries NO star — the exact gap this expression closes
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[dot_native.*"), plan)
  }

  test("l2sq_native == aggregate(zip_with(...)) bit-for-bit, nulls and mismatches included") {
    graft.functions.L2Sq.register(spark)
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val emb = graft.util.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), dbl.as("e"))
    val q = emb.filter(col("vec_id") === 3).select(col("e").as("qe"))
    val both = emb.crossJoin(q)
      .select(
        expr("l2sq_native(e, qe)").as("native"),
        aggregate(zip_with(col("e"), col("qe"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)

    import spark.implicits._
    val edge = Seq(
      (1L, Some(Seq(1.0, 5.0)), Some(Seq(3.0))), // min-length fold → (1-3)^2
      (2L, None, Some(Seq(1.0)))                 // null → null
    ).toDF("id", "a", "b")
      .select(col("id"), expr("l2sq_native(a, b)").as("d")).orderBy("id").collect()
    assert(edge(0).getDouble(1) == 4.0)
    assert(edge(1).isNullAt(1))
  }

  test("hamming_sign_native == size(filter(zip_with(...))) on all fixture vectors, nulls null") {
    graft.functions.HammingSign.register(spark)
    val dbl = transform(col("embedding"), x => x.cast("double"))
    val emb = graft.util.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), dbl.as("e"))
    val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
    val both = emb.crossJoin(q)
      .select(
        expr("hamming_sign_native(e, qe)").as("native"),
        size(filter(zip_with(col("e"), col("qe"),
          (x, y) => (x >= 0.0) =!= (y >= 0.0)), b => b)).cast("bigint").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)

    import spark.implicits._
    val edge = Seq((1L, None: Option[Seq[Double]], Some(Seq(1.0))))
      .toDF("id", "a", "b")
      .select(expr("hamming_sign_native(a, b)").as("h")).collect()
    assert(edge(0).isNullAt(0))
  }
}
