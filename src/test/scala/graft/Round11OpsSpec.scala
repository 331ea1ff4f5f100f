package graft

import org.apache.spark.sql.functions._

/** Round-11 operator semantics: BPE apply's rewrite discipline. The
  * graded hash compare proves Spark==DuckDB; these pin that what both
  * compute is the INTENDED BPE semantics (rank order, fixpoint per rule,
  * consumed-delimiter recovery) on hand-checked tokens. */
class Round11OpsSpec extends SparkSpec {

  private def encode(tokens: String*): Map[String, String] = {
    import spark.implicits._
    tokens.toDF("tok")
      .select(col("tok"), trim(graft.queries.MlPrep.bpeEncodeExpr).as("enc"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("bpeEncodeExpr applies the frozen merges in rank order") {
    // expectations recomputed for the round-13 saturation-trained table
    val enc = encode("tower", "tor", "stat", "miner", "query", "customer")
    // t o w e r: rank-0 (e,r) -> er, rank-4 (o,w) -> ow; no later rule
    // merges 't ow' or 'ow er'
    assert(enc("tower") == "t ow er")
    // t o r: rank-2 (o,r) consumes the 'o' — once 'or' forms, (or,t)
    // needs the OTHER order and (or,der) needs 'der', absent here
    assert(enc("tor") == "t or")
    // s t a t: rank-3 (s,t) wins the first 't'; (t,a)'s pattern ' t a '
    // is gone by then, so the tail merges via (a,t)
    assert(enc("stat") == "st at")
    // m i n e r: (i,n) and (e,r) merge; (m,er) CANNOT — 'in' sits
    // between 'm' and 'er', so the pair is never adjacent
    assert(enc("miner") == "m in er")
    // saturation: whole vocabulary words collapse to ONE symbol
    assert(enc("query") == "query")
    assert(enc("customer") == "customer")
  }

  test("bpeEncodeExpr's double replace pass reaches the per-rule fixpoint on adjacent chains") {
    // ' e r e r ': one replace pass merges the first pair but its scan
    // consumes the delimiter ahead of the second; the second pass must
    // catch it — 2x 'er', never a leftover ' e r '
    val enc = encode("erer", "atatat", "atat")
    assert(enc("erer") == "er er")
    // rank-5 (t,a) fires before (a,t) in the retrained table, then
    // rank-36 (a,ta) stacks on it — ground truth replayed offline with
    // the identical leftmost-non-overlapping replace semantics
    assert(enc("atatat") == "ata ta t")
    assert(enc("atat") == "ata t")
  }

  test("bpeEncodeExpr is a no-op on tokens containing no ranked pair") {
    val enc = encode("xyz", "q")
    assert(enc("xyz") == "x y z")
    assert(enc("q") == "q")
  }

  test("minhashBandKeysExpr (row-local) == minhashBandsArr (agg) on fixture docs") {
    // the streaming probe's banding must be value-identical to the batch
    // banding or the incremental-dedup stream mirror silently diverges
    import graft.ops.Ops
    val docs = graft.queries.TextOps.docToks(spark, sf0001)
      .filter(col("doc_id") < 200)
    val agg = Ops.minhashBandsArr(docs, col("doc_id"), col("tk"), 8, 2)
      .select(col("id"), col("band_no").cast("int").as("band_no"),
        col("bkey"))
    val rowwise = docs.select(col("doc_id").as("id"),
        explode(Ops.minhashBandKeysExpr(col("tk"), 8, 2)).as("b"))
      .select(col("id"), col("b.band_no"), col("b.bkey"))
    assert(rowwise.except(agg).count() == 0)
    assert(agg.except(rowwise).count() == 0)
    assert(agg.count() == 400) // 200 docs x 2 bands
  }
}
