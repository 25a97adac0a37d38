package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ranked full-text retrieval over the corpus: inverted term-frequency
 * postings and Okapi BM25 scoring (the Lucene/"+1" idf variant, so idf is
 * never negative: idf = ln(1 + (N - df + 0.5) / (df + 0.5))).
 *
 * Scale shape (the 100 TB plan):
 *  - postings are ONE combinable aggregate over (doc, token) — tokens
 *    explode map-side, the query-term filter applies BEFORE the exchange
 *    when scoring (so a 4-term query shuffles only matching tokens, not
 *    the corpus vocabulary);
 *  - corpus stats (N, total token count) are a scalar aggregate folded in
 *    via a 1-row broadcast; per-term document frequencies are a broadcast
 *    the size of the query;
 *  - top-k is TakeOrdered (orderBy.limit), never a single-partition
 *    window; the rank column is added over the <= k survivors.
 *
 * Determinism: each per-term score is rounded to 7 dp and summed as
 * DECIMAL(20,7), so the per-document total is exact and order-insensitive
 * — an external engine replaying the same double arithmetic reproduces
 * every score bit-for-bit.
 */
object Search {

  /** Inverted postings: one row per (doc_key, token) with term frequency
    * and the document's token length. One combinable count aggregate. */
  def postings(docs: DataFrame, key: Column, text: Column): DataFrame = {
    val toks = TextAnalysis.tokens(text)
    // dl joins back per doc instead of riding the explode: size(toks) in the
    // same projection as explode(toks) makes CollapseProject re-tokenize the
    // document once per token row (the lmScore lesson — measured 13x there)
    val lens = docs.select(key.as("doc_key"), size(toks).as("dl"))
    docs.select(key.as("doc_key"), explode(toks).as("token"))
      .groupBy("doc_key", "token")
      .agg(count(lit(1)).as("tf"))
      .join(lens, "doc_key")
      .select("doc_key", "dl", "token", "tf")
  }

  /**
   * BM25 top-k retrieval for one query.
   *
   * @return (doc_key, n_terms: int — query terms matched, bm25_score:
   *         double, rank: int 1-based; ties broken by doc_key ascending)
   */
  def bm25(docs: DataFrame, key: Column, text: Column,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(topK > 0, "topK must be positive")
    val toks = TextAnalysis.tokens(text)
    val lens = docs.select(key.as("doc_key"), size(toks).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))

    // query-term postings: the isin filter runs on the exploded tokens
    // BEFORE the aggregate exchange — only matching tokens shuffle. dl joins
    // back per doc (the lmScore lesson: size(toks) next to explode(toks)
    // re-tokenizes per token row)
    val qtf = docs
      .select(key.as("doc_key"), explode(toks).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy("doc_key", "token")
      .agg(count(lit(1)).as("tf"))
      .join(lens, "doc_key")
    val df = qtf.groupBy("token").agg(count(lit(1)).as("df"))

    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    val termScore = round(idf * tfNorm, 7).cast("decimal(20,7)")

    val scored = qtf
      .join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .groupBy("doc_key")
      .agg(count(lit(1)).cast("int").as("n_terms"),
        sum(termScore).as("__score_dec"))
      .withColumn("bm25_score", col("__score_dec").cast("double"))
      .select("doc_key", "n_terms", "bm25_score")
    val top = scored.orderBy(col("bm25_score").desc, col("doc_key")).limit(topK)
    top.withColumn("rank", row_number().over(
      Window.orderBy(col("bm25_score").desc, col("doc_key"))))
  }

  /**
   * TF-IDF keyword extraction: the top-k highest-scoring terms of every
   * document, with the smooth idf that never zeroes a term present in all
   * documents (idf = ln((N+1)/(df+1)) + 1 — the sklearn smooth variant).
   * This is the per-document characteristic-terms signal (topic tagging,
   * near-dup explanation, index pruning), complementing [[bm25]]'s
   * per-query ranking.
   *
   * Scale shape: term frequencies are ONE combinable (doc, token) count
   * with map-side partials; document frequencies are one combinable count
   * over the (doc, token) distincts (never a countDistinct — the tf
   * aggregate already collapsed to distinct pairs); N folds in as a 1-row
   * broadcast. The top-k window partitions BY DOCUMENT — millions of
   * independent k-row heaps, no global sort anywhere.
   *
   * Determinism: the score is rounded to 7 dp into DECIMAL(20,7) before
   * ranking (each score is computed once, not summed, so the only IEEE
   * sensitivity is the final-ulp ln boundary — same accepted contract as
   * [[bm25]]), and ties break by term ascending.
   *
   * @return (doc_key, term, tf, df, tfidf7: decimal(20,7), term_rank) —
   *         k rows per doc (fewer when the doc has < k distinct terms)
   */
  def tfIdfTopK(docs: DataFrame, key: Column, text: Column,
                k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val toks = TextAnalysis.tokens(text)
    val tf = docs.select(key.as("doc_key"), explode(toks).as("term"))
      .groupBy("doc_key", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val idf = log((col("n_docs") + lit(1L)).cast("double") /
      (col("df") + lit(1L)).cast("double")) + lit(1.0)
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf7",
        round(idf * col("tf").cast("double"), 7).cast("decimal(20,7)"))
    scored
      .withColumn("term_rank", row_number().over(Window
        .partitionBy(col("doc_key"))
        .orderBy(col("tfidf7").desc, col("term"))))
      .filter(col("term_rank") <= k)
      .select("doc_key", "term", "tf", "df", "tfidf7", "term_rank")
  }
}
