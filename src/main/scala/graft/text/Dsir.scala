package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * DSIR-style data selection via importance resampling (Xie et al. 2023,
 * "Data Selection for Language Models via Importance Resampling" — public
 * method): score every raw document by the log-likelihood ratio of its
 * hashed n-gram bag under a TARGET distribution (a curated/quality slice)
 * vs the RAW corpus distribution, then keep the top-k.
 *
 * Model: unigrams + bigrams hashed into `buckets` buckets (the paper's
 * hashed n-gram generative model). Bucket probabilities are add-one
 * smoothed: p_b = (ct_b + 1) / (T + B), q_b = (cr_b + 1) / (R + B). A
 * document's log importance weight is the sum over its n-gram OCCURRENCES
 * of ln(p_b / q_b) — documents that look like the target score high.
 *
 * Scale shape (the 100 TB story): feature extraction is two codegen calls
 * per row (tokens + windowNgrams) exploded once; the "model" is ONE
 * combinable per-bucket count pass (B rows out, map-side partials absorb
 * everything); scoring joins the exploded stream to the BROADCAST B-row
 * ratio table and sums per doc — one doc-keyed exchange total. Selection
 * is orderBy+limit → TakeOrderedAndProject (per-partition heaps + driver
 * merge of k rows), never a global sort; the kth-row threshold is
 * broadcast back, so the selected flag costs no extra exchange.
 *
 * Determinism / oracle parity: the bucket hash is the engine-wide portable
 * sha60 (DuckDB recomputes it as a base-16 hex fold); per-bucket log
 * ratios are rounded to 7 dp and summed as DECIMAL, so per-doc weights are
 * exact and order-insensitive — DuckDB replays every weight bit-for-bit
 * from the same parquet.
 */
object Dsir {

  /** Default bucket count. Small so sf0.001 tests exercise real collisions;
    * production would use 10k+ (the paper uses 10^4) — a config, not a
    * shape change. */
  val Buckets = 64

  /** Per-document DSIR log importance weights plus a deterministic top-k
    * `selected` flag.
    *
    * @param isTarget row predicate marking the target (curated) slice; the
    *                 slice still counts toward the raw distribution, as in
    *                 the paper's raw-vs-target formulation
    * @param k        selection budget (top-k by weight, doc_key tiebreak)
    * @return (doc_key, n_feats: int, dsir_logw: double — null when the doc
    *         has no features, selected: boolean)
    */
  def dsirSelect(docs: DataFrame, key: Column, text: Column,
                 isTarget: Column, k: Int,
                 buckets: Int = Buckets): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    val uni = TextAnalysis.tokens(text)
    val bi = TextFunctions.windowNgrams(text, lit(2))
    // explode(concat(...)) in its own projection; n_feats is recomputed on
    // the docs side below — size() next to explode() would make
    // CollapseProject re-tokenize the document once per feature row (the
    // measured lmScore trap).
    val ex = docs
      .select(key.as("doc_key"), isTarget.as("is_t"),
        explode(concat(uni, bi)).as("g"))
      .select(col("doc_key"), col("is_t"),
        pmod(TextFunctions.sha60(col("g")), lit(buckets.toLong)).as("b"))
    // One combinable pass: raw + target counts per bucket (B rows out).
    val counts = ex.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_t"), lit(1L)).otherwise(lit(0L))).as("ct"))
    val tots = counts.agg(sum("cr").as("r_tot"), sum("ct").as("t_tot"))
    // Buckets with zero raw count can't appear in any document, so the
    // counts table IS the full needed domain; add-one smoothing still uses
    // the full bucket count B in the denominators.
    val llr = round(log(
        ((col("ct") + lit(1L)).cast("double") /
          (col("t_tot") + lit(buckets.toLong)).cast("double")) /
        ((col("cr") + lit(1L)).cast("double") /
          (col("r_tot") + lit(buckets.toLong)).cast("double"))), 7)
      .cast("decimal(20,7)")
    val ratio = counts.crossJoin(broadcast(tots)).select(col("b"), llr.as("llr"))
    val scored = ex.join(broadcast(ratio), "b")
      .groupBy("doc_key").agg(sum("llr").as("__w_dec"))
    // persisted: the scored table is re-read by the kth-threshold job and
    // the final projection — without it the explode + two aggregation
    // passes re-evaluate per consumer (the same ~4x re-evaluation trap as
    // the LSH band fan-out, and per-doc weights are tiny relative to the
    // feature stream)
    val weights = docs
      .select(key.as("doc_key"),
        (size(uni) + greatest(size(uni) - 1, lit(0))).cast("int").as("n_feats"))
      .join(scored, Seq("doc_key"), "left")
      .select(col("doc_key"), col("n_feats"),
        col("__w_dec").cast("double").as("dsir_logw"))
      .persist()
    // kth row of the top-k under (weight desc, key asc): two
    // TakeOrderedAndProject jobs on k rows, broadcast back as a 1-row
    // threshold — selection never globally sorts the corpus.
    val kth = weights.filter(col("dsir_logw").isNotNull)
      .orderBy(col("dsir_logw").desc, col("doc_key").asc).limit(k)
      .orderBy(col("dsir_logw").asc, col("doc_key").desc).limit(1)
      .select(col("dsir_logw").as("kth_w"), col("doc_key").as("kth_key"))
    weights.crossJoin(broadcast(kth))
      .select(col("doc_key"), col("n_feats"), col("dsir_logw"),
        coalesce(
          col("dsir_logw") > col("kth_w") ||
            (col("dsir_logw") === col("kth_w") &&
              col("doc_key") <= col("kth_key")),
          lit(false)).as("selected"))
  }
}
