package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Adjacent-token co-occurrence and pointwise mutual information — the
 * corpus-statistics operator behind collocation mining and phrase-vocabulary
 * induction (a training pipeline runs it to decide which multi-word units
 * deserve their own tokens, and as a corpus-drift signal between crawls).
 *
 * Scale shape: bigram generation is ONE codegen call per row
 * ([[TextFunctions.windowNgrams]] — not a HOF lambda, which Catalyst would
 * inline into per-element re-tokenization), followed by two combinable
 * hash aggregations (bigram counts, unigram counts) whose map-side partials
 * absorb the Zipf head before any shuffle. The PMI join touches only pairs
 * past `minPairCount` — the heavy tail never reaches the join — and the
 * final top-k is a TakeOrdered (per-partition heads), never a global sort.
 *
 * Determinism: counts are exact integers; the only floating-point step is
 * one fixed-order multiply/divide chain into `ln`, rounded to 6 decimals
 * (`pmi6`), and the top-k orders by (pmi6 desc, tok_a, tok_b) so ties cut
 * identically on any engine.
 */
object Cooccur {

  /**
   * Top-k adjacent-token pairs by PMI.
   *
   * PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) ) with P(a,b) = n_ab / N_pairs and
   * P(a) = n_a / N_tokens, i.e. ln( (n_ab·Nt·Nt) / (Np·n_a·n_b) ) — the
   * products are evaluated left-to-right in DOUBLE so an external engine
   * replays the identical IEEE chain (longs would overflow at crawl scale).
   *
   * @param minPairCount drop pairs seen fewer times (PMI of rare pairs is
   *                     noise — and the filter keeps the join input sparse)
   * @return (tok_a, tok_b, n_ab, n_a, n_b, pmi6), k rows
   */
  def pmiTopK(docs: DataFrame, text: Column, minPairCount: Long,
              k: Int): DataFrame = {
    require(minPairCount >= 1 && k > 0)
    val uni = docs.select(explode(TextAnalysis.tokens(text)).as("t"))
    val unigrams = uni.groupBy("t").agg(count(lit(1)).as("n"))
    val nt = broadcast(uni.agg(count(lit(1)).as("__nt")))
    val bg = docs.select(
      explode(TextFunctions.windowNgrams(text, lit(2))).as("g"))
    val np = broadcast(bg.agg(count(lit(1)).as("__np")))
    val pairs = bg.groupBy("g").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
      .select(split(col("g"), " ").getItem(0).as("tok_a"),
        split(col("g"), " ").getItem(1).as("tok_b"), col("n_ab"))
    val ua = unigrams.select(col("t").as("tok_a"), col("n").as("n_a"))
    val ub = unigrams.select(col("t").as("tok_b"), col("n").as("n_b"))
    pairs.join(ua, "tok_a").join(ub, "tok_b")
      .crossJoin(nt).crossJoin(np)
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(log(
          (col("n_ab").cast("double") * col("__nt").cast("double")
            * col("__nt").cast("double"))
            / (col("__np").cast("double") * col("n_a").cast("double")
              * col("n_b").cast("double"))), 6).as("pmi6"))
      .orderBy(col("pmi6").desc, col("tok_a"), col("tok_b"))
      .limit(k)
  }
}
