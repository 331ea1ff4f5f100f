package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Text-analysis / dedup tier over documents (SURVEY §2.11).
  *
  * 100-TB notes: exact dedup is a hash-partitioned window on md5(text) —
  * one shuffle keyed by content hash, scales like any groupBy. The exact
  * pairwise Jaccard is capped (doc_id < 50) because all-pairs token joins
  * are inherently quadratic — the uncapped scale path for near-dup
  * detection is minhash_lsh_jaccard (bucketed LSH join, Approx module).
  */
object TextOps {

  /** Exact duplicate-text removal: keep the lowest doc_id per md5(text).
    * The fixture corpus has no exact dups, so output == input — still a
    * graded identity that exercises the full dedup plan. */
  val textExactDedup = Q(
    "text_exact_dedup",
    (spark, sfDir) => {
      val w = Window.partitionBy("h").orderBy("doc_id")
      Tables.documents(spark, sfDir)
        .withColumn("h", md5(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "h")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, h FROM (
              SELECT doc_id, md5(text) AS h,
                     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents)
            WHERE rn = 1 ORDER BY doc_id"""))

  /** Exact token-set Jaccard similarity for all pairs among doc_id < 50:
    * inverted-index self-join on token → |A∩B| / (|A|+|B|−|A∩B|). */
  val textJaccardPairs = Q(
    "text_jaccard_pairs",
    (spark, sfDir) => {
      val toks = Tables.documents(spark, sfDir)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("tok"))
        .distinct()
      val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = toks.select(col("doc_id").as("d1"), col("tok"))
        .join(toks.select(col("doc_id").as("d2"), col("tok").as("tok2")),
          col("tok") === col("tok2") && col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("c"))
      inter
        .join(broadcast(sizes.select(col("doc_id").as("sd1"), col("n").as("n1"))),
          col("d1") === col("sd1"))
        .join(broadcast(sizes.select(col("doc_id").as("sd2"), col("n").as("n2"))),
          col("d2") === col("sd2"))
        .select(col("d1"), col("d2"),
          round(col("c").cast("double") / (col("n1") + col("n2") - col("c")), 4)
            .as("jaccard"))
        .orderBy("d1", "d2")
    },
    Some("""WITH toks AS (
              SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents WHERE doc_id < 50),
            sizes AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c
              FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT d1, d2,
                   round(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 4) AS jaccard
            FROM inter
            JOIN sizes s1 ON d1 = s1.doc_id
            JOIN sizes s2 ON d2 = s2.doc_id
            ORDER BY d1, d2"""))

  /** Corpus quality stats per (lang, source): doc counts, char totals,
    * n_chars consistency check, average token count. */
  val textStats = Q(
    "text_stats",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(length(col("text")) === col("n_chars"), 1).otherwise(0))
            .as("n_len_ok"),
          round(avg(size(split(col("text"), " ", -1))), 4).as("avg_tokens"))
        .orderBy("lang", "source"),
    Some("""SELECT lang, source, count(*) AS n_docs,
            CAST(sum(n_chars) AS BIGINT) AS total_chars,
            CAST(sum(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_len_ok,
            round(avg(len(string_split(text, ' '))), 4) AS avg_tokens
            FROM documents GROUP BY lang, source ORDER BY lang, source"""))

  def qs: Seq[Q] = Seq(textExactDedup, textJaccardPairs, textStats)
}
