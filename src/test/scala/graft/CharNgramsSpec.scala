package graft

import graft.functions.CharNgrams
import org.apache.spark.sql.functions._

/** char_ngrams_native must be value-identical to the composed
  * transform(sequence, substring) + length-filter form it replaced
  * (the r9 fix for the O(chars²) trigram regression) — including on
  * multi-byte UTF-8, where codepoint offsets and byte offsets diverge. */
class CharNgramsSpec extends SparkSpec {

  private def composed(n: Int) =
    expr(s"filter(transform(sequence(1, greatest(length(text) - ${n - 1}, 1))," +
      s" p -> substring(text, p, $n)), g -> length(g) = $n)")

  test("char_ngrams_native == composed substring form on all fixture texts, n=3 and n=8") {
    CharNgrams.register(spark)
    val docs = graft.util.Tables.documents(spark, sf001)
    for (n <- Seq(3, 8)) {
      val bad = docs.select(
        expr(s"char_ngrams_native(text, $n)").as("native"),
        composed(n).as("comp"))
        .filter(not(col("native") <=> col("comp")))
      assert(bad.count() == 0, s"n=$n mismatch")
    }
  }

  test("multi-byte codepoints slice on codepoint boundaries, not bytes") {
    CharNgrams.register(spark)
    import spark.implicits._
    // 2-byte (é), 3-byte (中), and 4-byte (𝄞 — one "char" to Spark's
    // UTF8String, which counts UTF-8 sequences) codepoints in one string.
    val df = Seq("aé中𝄞b").toDF("text")
    val native = df.select(expr("char_ngrams_native(text, 3)")).head.getSeq[String](0)
    val comp = df.select(composed(3)).head.getSeq[String](0)
    assert(native == comp)
    assert(native == Seq("aé中", "é中𝄞", "中𝄞b"))
  }

  test("edge cases: short string, exact length, n=1, n<1, empty, null") {
    CharNgrams.register(spark)
    import spark.implicits._
    val df = Seq(Some("ab"), Some("abc"), Some(""), None).toDF("text")
    val r3 = df.select(expr("char_ngrams_native(text, 3)").as("g"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[String](0))
    assert(r3(0) == Seq())            // shorter than n → empty
    assert(r3(1) == Seq("abc"))       // exact length → the one window
    assert(r3(2) == Seq())            // empty string
    assert(r3(3) == null)             // null in → null out
    val r1 = Seq("abc").toDF("text")
      .select(expr("char_ngrams_native(text, 1)")).head.getSeq[String](0)
    assert(r1 == Seq("a", "b", "c"))
    val r0 = Seq("abc").toDF("text")
      .select(expr("char_ngrams_native(text, 0)")).head.getSeq[String](0)
    assert(r0 == Seq())
  }

  test("regressed queries keep their oracle shape: trigram profile and winnow rows") {
    val tri = graft.queries.Registry.byName("text_trigram_profile").build(spark, sf001)
    val rows = tri.collect()
    assert(rows.length == 15) // 5 langs × top-3
    assert(rows.forall(_.getLong(3) <= 3))
    val win = graft.queries.Registry.byName("text_winnow_fingerprint").build(spark, sf001)
    assert(win.count() > 0)
  }
}
