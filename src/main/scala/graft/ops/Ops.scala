package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The user-facing operator API: generic DataFrame-in / DataFrame-out
  * transforms, parameterized on the caller's columns — the library surface
  * a pipeline author programs against. The graded fixture queries
  * (`graft.queries.*`) delegate to these where the operator is generic by
  * nature, so each transform has exactly ONE implementation: the registry
  * grades it against the DuckDB oracle, and callers reuse it on their own
  * schemas.
  *
  * Determinism contract (inherited from SURVEY §2's policy): every
  * transform that picks representatives or assigns ordinals does so under
  * an explicit total order — never `dropDuplicates` / unordered `first()`,
  * which are partition-order-dependent.
  *
  * 100-TB notes are per-method; the common theme: one shuffle keyed on
  * something high-cardinality, broadcast only provably-small sides, and
  * banding/bucketing instead of all-pairs anywhere quadratic threatens.
  */
object Ops {

  /** Exact content dedup: keep the first row (by `keepOrder`) of each
    * `contentKey` group. One shuffle keyed on the content hash; pass
    * `md5(payload)` (16 bytes) rather than the payload itself so the
    * shuffle moves hashes, not blobs.
    *
    * Output: input columns plus `h` (the content key). */
  def exactDedup(df: DataFrame, contentKey: Column, keepOrder: Column*): DataFrame = {
    val w = Window.partitionBy("h").orderBy(keepOrder: _*)
    df.withColumn("h", contentKey)
      .withColumn("graft_rn", row_number().over(w))
      .filter(col("graft_rn") === 1)
      .drop("graft_rn")
  }

  /** Deterministic per-group reservoir sample: exactly min(k, |group|)
    * rows per `group`, chosen by md5 rank over `id` — reproducible across
    * engines, runs, and partitionings; parallelizes freely (no sequential
    * reservoir state). Output: input columns plus `rk` (1-based bigint).
    *
    * 100-TB: one shuffle on the group key; per-group sort bounded by group
    * size, and the window emits k rows per group. For a pathological
    * single hot group, pre-split with a salt (see SURVEY §7.7). */
  def reservoirPerGroup(df: DataFrame, group: Column, id: Column, k: Int,
      saltPrefix: String = "r"): DataFrame = {
    val w = Window.partitionBy(group)
      .orderBy(md5(concat(lit(saltPrefix), id.cast("string"))), id)
    df.withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
  }

  /** Context-window chunking: split `textCol` into `chunkSize`-token
    * chunks at `stride` (overlap = chunkSize − stride), content-addressed
    * by md5 — the LLM training-data shape. Row-local (no shuffle).
    * Output: `id`, `chunk_no`, `n_chunk_tokens`, `chunk_hash`. */
  def tokenChunks(df: DataFrame, id: Column, textCol: Column,
      chunkSize: Int = 64, stride: Int = 48): DataFrame =
    df.select(id.as("doc_id"), split(textCol, " ", -1).as("graft_toks"))
      .select(col("doc_id"), col("graft_toks"),
        explode(sequence(lit(1), greatest(size(col("graft_toks")), lit(1)),
          lit(stride))).as("graft_start"))
      .select(col("doc_id"),
        ((col("graft_start") - 1) / stride).cast("bigint").as("chunk_no"),
        size(slice(col("graft_toks"), col("graft_start"), lit(chunkSize)))
          .cast("bigint").as("n_chunk_tokens"),
        md5(array_join(slice(col("graft_toks"), col("graft_start"),
          lit(chunkSize)), " ")).as("chunk_hash"))

  /** Exact cosine top-k: the `k` nearest rows to `queryId`'s vector. The
    * single query vector is broadcast; the scan is linear (1-vs-all, the
    * shape that scales to any corpus); top-k is TakeOrdered (per-partition
    * heaps, no global sort). Ordering uses the ROUNDED similarity with id
    * tiebreak so the cut is total. Vectors must share dimensionality.
    * Output: `vec_id`, `cos_sim` (rounded 4dp). */
  def cosineTopK(df: DataFrame, id: Column, vec: Column, queryId: Any,
      k: Int): DataFrame = {
    val dbl = (c: Column) => transform(c, x => x.cast("double"))
    val sumArr = (c: Column) => aggregate(c, lit(0.0), (a, x) => a + x)
    val dot = (a: Column, b: Column) => sumArr(zip_with(a, b, (x, y) => x * y))
    val norm = (c: Column) => sqrt(sumArr(transform(c, x => x * x)))
    val q = df.filter(id === lit(queryId))
      .select(dbl(vec).as("graft_qe"), norm(dbl(vec)).as("graft_qn"))
    df.filter(id =!= lit(queryId))
      .select(id.as("vec_id"), dbl(vec).as("graft_e"),
        norm(dbl(vec)).as("graft_en"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(dot(col("graft_e"), col("graft_qe"))
          / (col("graft_en") * col("graft_qn")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Nearest as-of: for each left row, the `rightTs` closest in time
    * either direction (inclusive both ways; equidistant ties → earlier).
    * ONE shuffle+sort serves both directions: each right row enters the
    * union twice — tag 0 before left rows at equal ts (feeds the backward
    * `last`), tag 2 after (feeds the forward `first`); both windows share
    * the (key; ts, tag) sort, so Catalyst evaluates them in a single
    * WindowExec. Right rows are deduped on (key, ts).
    * Output: left columns plus `nearest_ts`. */
  def asofNearest(left: DataFrame, leftKey: Column, leftTs: Column,
      right: DataFrame, rightKey: Column, rightTs: Column): DataFrame = {
    val leftCols = left.columns
    val base = left
      .withColumn("graft_key", leftKey)
      .withColumn("graft_ts", leftTs.cast("timestamp_ntz"))
      .withColumn("graft_tag", lit(1))
      .withColumn("graft_sts", lit(null).cast("timestamp_ntz"))
    val obs = right
      .select(rightKey.as("graft_key"), rightTs.cast("timestamp_ntz").as("graft_ts"))
      .distinct()
    def tagged(t: Int) = {
      val cols = leftCols.map(c => lit(null).cast(base.schema(c).dataType).as(c))
      obs.select(cols :+ col("graft_key") :+ col("graft_ts") :+
        lit(t).as("graft_tag") :+ col("graft_ts").as("graft_sts"): _*)
    }
    val ord = Window.partitionBy("graft_key")
      .orderBy(col("graft_ts"), col("graft_tag"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    base.unionByName(tagged(0)).unionByName(tagged(2))
      .withColumn("graft_back",
        last(when(col("graft_tag") === 0, col("graft_sts")), ignoreNulls = true)
          .over(wBack))
      .withColumn("graft_fwd",
        first(when(col("graft_tag") === 2, col("graft_sts")), ignoreNulls = true)
          .over(wFwd))
      .filter(col("graft_tag") === 1)
      .withColumn("nearest_ts",
        when(col("graft_back").isNull, col("graft_fwd"))
          .when(col("graft_fwd").isNull, col("graft_back"))
          .when(unix_micros(col("graft_ts").cast("timestamp"))
            - unix_micros(col("graft_back").cast("timestamp"))
            <= unix_micros(col("graft_fwd").cast("timestamp"))
            - unix_micros(col("graft_ts").cast("timestamp")),
            col("graft_back"))
          .otherwise(col("graft_fwd")))
      .select(leftCols.map(col) :+ col("nearest_ts"): _*)
  }

  /** MinHash signatures + LSH band keys for near-dup candidate generation:
    * `numHashes` md5-family min-hashes per id over its distinct tokens,
    * grouped into `bands` band keys. Two ids are CANDIDATES iff they share
    * a band key — downstream joins on (band_no, bkey) are EQUI-joins, so
    * no all-pairs comparison exists anywhere and the plan survives any
    * corpus size. numHashes must divide evenly into bands.
    * Output: `id`, `band_no`, `bkey` (long layout, one self-join covers
    * all bands). Min-hashes are BIGINTs (first 15 hex digits of md5) so
    * the min aggregate runs in HashAggregate's mutable buffer, not a
    * string SortAggregate. */
  def minhashBands(df: DataFrame, id: Column, textCol: Column,
      numHashes: Int = 8, bands: Int = 2): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val toks = df.select(id.as("graft_id"),
        explode(split(textCol, " ", -1)).as("graft_tok"))
      .filter(length(col("graft_tok")) > 0)
      .distinct()
    def h(s: Int) = min(
      conv(substring(md5(concat(lit(s + ":"), col("graft_tok"))), 1, 15), 16, 10)
        .cast("bigint")).as(s"graft_h$s")
    val sig = toks.groupBy("graft_id")
      .agg(h(0), (1 until numHashes).map(h): _*)
    val bandCols = (0 until bands).map { b =>
      md5(concat_ws("|",
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"graft_h$i")): _*))
    }
    sig.select(col("graft_id").as("id"),
      posexplode(array(bandCols: _*)).as(Seq("band_no", "bkey")))
  }

  /** Candidate near-dup pairs from shared minhash bands: the banded
    * EQUI-join over `minhashBands` output. Returns distinct (id1, id2)
    * with id1 < id2; verify with an exact measure (Jaccard, edit
    * distance) on THESE pairs only — never all pairs. */
  def minhashCandidatePairs(df: DataFrame, id: Column, textCol: Column,
      numHashes: Int = 8, bands: Int = 2): DataFrame = {
    val b = minhashBands(df, id, textCol, numHashes, bands)
    val l = b.select(col("id").as("id1"), col("band_no"), col("bkey"))
    val r = b.select(col("id").as("id2"),
      col("band_no").as("graft_bn2"), col("bkey").as("graft_bk2"))
    l.join(r, col("band_no") === col("graft_bn2")
        && col("bkey") === col("graft_bk2"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Rolling z-score anomaly detection: each row's `value` against the
    * mean/stddev of its trailing `frameRows`-row window per `part`
    * (ordered by `order` — pass a TOTAL order). Frame sums run in exact
    * decimal (engine-portable, evaluation-order-independent); z is NULL
    * for windows with n < 2 or zero variance. `value` must carry ≤ 2
    * decimal digits (the library's money/measurement convention).
    * Output: input columns plus `n` and `z`. */
  def movingZscore(df: DataFrame, part: Column, order: Seq[Column],
      value: Column, frameRows: Int = 5): DataFrame = {
    val w = Window.partitionBy(part).orderBy(order: _*)
      .rowsBetween(-(frameRows - 1), 0)
    val dec = value.cast(graft.util.D.Money)
    val s = sum(dec).over(w).cast(graft.util.D.Money).cast("double")
    val sq = sum((dec * dec).cast(graft.util.D.Money4)).over(w)
      .cast(graft.util.D.Money4).cast("double")
    val n = count(lit(1)).over(w).cast("double")
    df.withColumn("graft_sum", s).withColumn("graft_sumsq", sq)
      .withColumn("graft_n", n)
      .withColumn("graft_var",
        when(col("graft_n") > 1.0,
          (col("graft_sumsq") - col("graft_sum") * col("graft_sum") / col("graft_n"))
            / (col("graft_n") - 1.0)))
      .withColumn("z",
        when(col("graft_n") > 1.0 && col("graft_var") > 0.0,
          (value - col("graft_sum") / col("graft_n")) / sqrt(col("graft_var"))))
      .withColumn("n", col("graft_n").cast("bigint"))
      .drop("graft_sum", "graft_sumsq", "graft_n", "graft_var")
  }
}
