package graft

import graft.queries.{Aggs, MlPrep, TextOps, TimeSeries}
import org.apache.spark.sql.functions._

/** Invariants for the round-3 operators, run at sf0.001 (fast) — parity
  * with DuckDB is the value-level gate; these pin the SEMANTIC claims the
  * oracle compare can't express (consistency between operators, bounds). */
class Round3OpsSpec extends SparkSpec {

  test("agg_minby_maxby: picked names actually achieve the min/max balance in their segment") {
    val out = Aggs.aggMinbyMaxby.build(spark, sf0001).collect()
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .select("c_mktsegment", "c_name", "c_acctbal").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.nonEmpty)
    out.foreach { r =>
      val seg = r.getString(0)
      val inSeg = cust.filter(_._1 == seg)
      val minBal = inSeg.map(_._3).min
      val maxBal = inSeg.map(_._3).max
      assert(r.getDouble(3) == minBal && r.getDouble(4) == maxBal)
      // the picked names hold the extreme balances (smallest custkey on ties,
      // which collect order can't see — so just check balance achievement)
      assert(inSeg.exists(c => c._2 == r.getString(1) && c._3 == minBal))
      assert(inSeg.exists(c => c._2 == r.getString(2) && c._3 == maxBal))
    }
  }

  test("ts_ohlc: open and close lie within [low, high]; candle counts sum to the event count") {
    val out = TimeSeries.tsOhlc.build(spark, sf0001)
    val bad = out.filter(col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low")).count()
    assert(bad == 0)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    val events = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(total == events)
  }

  test("ml_feature_hash: buckets in [0,1024); token totals are conserved") {
    val out = MlPrep.mlFeatureHash.build(spark, sf0001)
    assert(out.filter(col("bucket") < 0 || col("bucket") >= 1024).count() == 0)
    val hashed = out.agg(sum("n_tokens")).collect()(0).getLong(0)
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ", -1)).as("t"))
      .filter(length(col("t")) > 0).count()
    assert(hashed == raw)
  }

  test("ml_stratified_split: every segment splits into train+test covering all its rows") {
    val out = MlPrep.mlStratifiedSplit.build(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySegment = out.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cust = spark.read.parquet(s"$sf0001/customer.parquet")
      .groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySegment == cust)
    // both splits occur in every segment at this size
    assert(out.groupBy(_._1).forall(_._2.map(_._2).toSet == Set("train", "test")))
  }

  test("text_tfidf: df never exceeds the corpus size and score = tf*(N+1)/(df+1)") {
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count().toDouble
    val rows = TextOps.textTfidf.build(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tf, df, score) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(df >= 1 && df <= n)
      assert(score == tf.toDouble * (n + 1.0) / (df.toDouble + 1.0))
    }
  }

  test("text_minhash_band_pairs: identical token sets always collide; candidates are a strict subset of all pairs") {
    val pairs = TextOps.textMinhashBandPairs.build(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"),
        array_sort(array_distinct(
          filter(split(col("text"), " ", -1), t => length(t) > 0))).as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    // same token set ⇒ same signature ⇒ same bands ⇒ must be a candidate pair
    for {
      (d1, t1) <- docs; (d2, t2) <- docs
      if d1 < d2 && t1 == t2
    } assert(pairs.contains((d1, d2)))
    val nDocs = docs.length.toLong
    assert(pairs.size < nDocs * (nDocs - 1) / 2, "banding must prune the all-pairs space")
  }
}
