package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Margin-based parallel-pair mining over embeddings — the bitext-mining
 * step of a multilingual training-data pipeline (the ratio-margin shape of
 * Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining in
 * Low-Resource Conditions"): a source/target pair scores by its cosine
 * RELATIVE to both endpoints' neighborhood means,
 *
 *   margin(x, y) = cos(x, y) / ((avg_{z in NNk(x)} cos(x, z)
 *                              + avg_{z in NNk(y)} cos(y, z)) / 2)
 *
 * which suppresses hub vectors that are near everything (high absolute
 * cosine, margin ~ 1) and surfaces genuinely aligned pairs (margin >> 1).
 *
 * Scale shape: the kNN stage is pluggable — [[Similarity.bruteForceKnn]]
 * is the exact baseline/verifier; at 10^12 vectors swap in the bucketed
 * IVF ([[Similarity.ivfKnnBucketed]]) or LSH ([[Similarity.lshKnn]]) path,
 * which emits the same (query_id, knn_rank, item_id, cos) shape. Past the
 * kNN, everything is candidate-sized: two tiny per-id aggregates (at most
 * one row per vector, broadcast back onto the candidate pairs), a
 * candidate-keyed window for best-target selection, and a semi-join for
 * the mutuality flag — no additional corpus-side exchange exists.
 *
 * Float determinism (the oracle contract): neighborhood sums are 7dp
 * DECIMAL (order-insensitive under any partitioning / tree shape); the
 * margin is ONE fixed-order double chain over those exact decimal inputs
 * (sf/nf + sb/nb, halved, divided into the raw cosine), and the keep gate
 * compares the 6dp-ROUNDED margin so the decision boundary is
 * engine-independent.
 */
object BitextMine {

  private def bruteKnn(q: DataFrame, c: DataFrame, k: Int): DataFrame =
    Similarity.bruteForceKnn(q, c, k)

  /** Decimal-exact neighborhood sum + size per query of a kNN result. */
  private def hoodStats(knn: DataFrame): DataFrame =
    knn.groupBy("query_id").agg(
      sum(round(col("cos"), 7).cast("decimal(20,7)")).as("hood_sum"),
      count(lit(1)).as("hood_n"))

  /**
   * Mine parallel pairs from `src` into `tgt` (both (vec_id, embedding)
   * shaped). Returns one row per source vector whose best-margin target
   * clears `minMargin` (compared at 6dp):
   * (src_id, tgt_id, cos, margin, mutual) — `mutual` marks pairs where the
   * source is also inside the target's own k-neighborhood (the two-way
   * check the mining literature applies before accepting a pair).
   */
  def mine(src: DataFrame, tgt: DataFrame, k: Int, minMargin: Double,
           knn: (DataFrame, DataFrame, Int) => DataFrame = bruteKnn): DataFrame = {
    val fwd = knn(src, tgt, k)
    val bwd = knn(tgt, src, k)
    val sf = hoodStats(fwd)
    val sb = hoodStats(bwd)
      .select(col("query_id").as("item_id"),
        col("hood_sum").as("hood_sum_b"), col("hood_n").as("hood_n_b"))
    // one fixed-order double chain over exact decimal inputs
    val denom = (col("hood_sum").cast("double") / col("hood_n").cast("double")
      + col("hood_sum_b").cast("double") / col("hood_n_b").cast("double")) / lit(2.0)
    val scored = fwd
      .join(broadcast(sf), "query_id")
      .join(broadcast(sb), "item_id")
      .withColumn("margin", col("cos") / denom)
    val wS = Window.partitionBy(col("query_id"))
      .orderBy(col("margin").desc, col("item_id"))
    val bwdPairs = bwd.select(col("item_id").as("m_src"),
      col("query_id").as("m_tgt")).distinct()
    scored.withColumn("pick", row_number().over(wS))
      .filter(col("pick") === 1 && round(col("margin"), 6) >= minMargin)
      .join(bwdPairs,
        col("query_id") === col("m_src") && col("item_id") === col("m_tgt"),
        "left")
      .select(col("query_id").as("src_id"), col("item_id").as("tgt_id"),
        col("cos"), col("margin"), col("m_src").isNotNull.as("mutual"))
  }
}
