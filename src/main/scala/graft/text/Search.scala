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
}
