package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Array / map / generator surface over embeddings, events.props and
  * documents (SURVEY §2.8) — the "multimodal columns" substrate.
  *
  * Determinism: float elements are cast to double BEFORE any arithmetic on
  * both engines, and higher-order folds (`aggregate` ↔ `list_aggregate`)
  * run left-to-right in both, so sums are bit-identical; results are still
  * rounded to 4dp as belt-and-braces. All higher-order expressions are
  * codegen-friendly built-ins evaluated row-local — no shuffle, scales
  * linearly with rows at any sf.
  */
object Arrays {

  // single shared fold implementation (util/V.scala) — see Vectors/Ops
  import graft.util.V.{dbl, sumArr}

  val arrBasics = Q(
    "arr_basics",
    (spark, sfDir) =>
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          size(col("embedding")).cast("bigint").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("e1"),
          // + 0.0: -0.0 canonicalization (sf1 rehearsal), see vec_l2_normalize
          (round(sumArr(dbl(slice(col("embedding"), 1, 8))), 4) + 0.0).as("sum8"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id,
            len(embedding) AS dim,
            CAST(embedding[1] AS DOUBLE) AS e1,
            round(list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum'), 4) + 0.0 AS sum8
            FROM embeddings ORDER BY vec_id"""))

  val arrHigherOrder = Q(
    "arr_higher_order",
    (spark, sfDir) => {
      val e = dbl(col("embedding"))
      Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          round(sqrt(sumArr(transform(e, x => x * x))), 4).as("l2_norm"),
          size(filter(e, x => x > 0)).cast("bigint").as("n_pos"),
          round(sumArr(zip_with(e, e, (a, b) => a * b)), 4).as("dot_self"))
        .orderBy("vec_id")
    },
    Some("""SELECT vec_id,
            round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum')), 4) AS l2_norm,
            len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
            round(list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum'), 4) AS dot_self
            FROM embeddings ORDER BY vec_id"""))

  /** JSON string → typed MapType → exploded (key, value) rows. The fixture
    * props always carry the single key 'k', which the oracle mirrors. */
  val mapFromJson = Q(
    "map_from_json",
    (spark, sfDir) =>
      Tables.events(spark, sfDir)
        .select(col("event_id"),
          explode(from_json(col("props"), lit("map<string,int>"))))
        .select(col("event_id"), col("key").as("k"), col("value").as("v"))
        .orderBy("event_id", "k"),
    Some("""SELECT event_id, 'k' AS k,
            CAST(json_extract_string(props, '$.k') AS INTEGER) AS v
            FROM events ORDER BY event_id, k"""))

  /** Word count over whitespace-split tokens, top-20 (generator surface). */
  val fnExplodeTokens = Q(
    "fn_explode_tokens",
    (spark, sfDir) =>
      Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ", -1)).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20),
    Some("""SELECT token, count(*) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token ORDER BY n DESC, token LIMIT 20"""))

  /** Positional explode → bigrams via lead() per document. */
  val fnPosexplodeBigrams = Q(
    "fn_posexplode_bigrams",
    (spark, sfDir) => {
      val w = Window.partitionBy("doc_id").orderBy("pos")
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), posexplode(split(col("text"), " ", -1)))
        .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("pos"), col("col").as("tok"))
        .withColumn("next_tok", lead(col("tok"), 1).over(w))
        .filter(col("next_tok").isNotNull)
        .select(col("doc_id"), col("pos"),
          concat_ws(" ", col("tok"), col("next_tok")).as("bigram"))
        .orderBy("doc_id", "pos")
    },
    Some("""SELECT doc_id, pos, tok || ' ' || next_tok AS bigram FROM (
              SELECT doc_id, pos, tok,
                     lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS next_tok
              FROM (SELECT doc_id,
                           CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS pos,
                           unnest(string_split(text, ' ')) AS tok
                    FROM documents))
            WHERE next_tok IS NOT NULL
            ORDER BY doc_id, pos"""))

  /** Array set algebra over token arrays: distinct-sort, prefix slice,
    * stopword intersection size, overlap flag. */
  val arrSetops = Q(
    "arr_setops",
    (spark, sfDir) => {
      val toks = split(col("text"), " ", -1)
      val stop = array(lit("the"), lit("a"), lit("of"), lit("and"), lit("to"))
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          size(array_distinct(toks)).cast("bigint").as("n_distinct"),
          concat_ws(",", slice(sort_array(array_distinct(toks)), 1, 5)).as("first5"),
          size(array_intersect(array_distinct(toks), stop)).cast("bigint").as("n_stop"),
          arrays_overlap(toks, stop).as("has_stop"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
            len(list_distinct(string_split(text, ' '))) AS n_distinct,
            array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5,
            CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                    ['the','a','of','and','to'])) AS BIGINT) AS n_stop,
            list_has_any(string_split(text, ' '), ['the','a','of','and','to']) AS has_stop
            FROM documents ORDER BY doc_id"""))

  /** Struct construction + field access + map construction + key lookup —
    * the nested-type building surface (the inverse of map_from_json's
    * parsing direction). */
  val fnStructNested = Q(
    "fn_struct_nested",
    (spark, sfDir) =>
      Tables.customer(spark, sfDir)
        .select(col("c_custkey"),
          struct(col("c_mktsegment").as("seg"), col("c_acctbal").as("bal"))
            .as("st"),
          map(lit("name"), col("c_name")).as("mp"))
        .select(col("c_custkey"),
          col("st").getField("seg").as("seg"),
          col("st").getField("bal").as("bal"),
          element_at(col("mp"), "name").as("name"))
        .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
            struct_extract(struct_pack(seg := c_mktsegment, bal := c_acctbal), 'seg') AS seg,
            struct_extract(struct_pack(seg := c_mktsegment, bal := c_acctbal), 'bal') AS bal,
            MAP(['name'], [c_name])['name'][1] AS name
            FROM customer ORDER BY c_custkey"""))

  /** Sorted-distinct-slice composition (round-9) — the canonical-form
    * array pipeline (dedupe, canonical order, bounded head) every
    * feature store applies before hashing or serving a list feature:
    * per doc, the first 3 tokens of sort_array(array_distinct(tk)),
    * emitted as a joined string. Deterministic by construction (sort
    * imposes the total order the raw collect order lacks). */
  val arrSortSlice = Q(
    "arr_sort_slice",
    (spark, sfDir) =>
      graft.queries.TextOps.docToks(spark, sfDir)
        .select(col("doc_id"),
          array_join(slice(sort_array(array_distinct(col("tk"))), 1, 3), ",")
            .as("head3"),
          size(array_distinct(col("tk"))).cast("bigint").as("n_distinct"))
        .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
                     AS head3,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                     AS n_distinct
            FROM documents ORDER BY doc_id"""))

  def qs: Seq[Q] = Seq(arrBasics, arrHigherOrder, mapFromJson,
    fnExplodeTokens, fnPosexplodeBigrams, arrSetops, fnStructNested,
    arrSortSlice)
}
