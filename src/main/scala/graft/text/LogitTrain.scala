package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed training of the logistic quality filter — the step that
 * PRODUCES the frozen weights [[TextAnalysis.withLogitQuality]] ships into
 * a scoring pass. This is the fastText/CCNet quality-classifier recipe:
 * label a curated slice positive (here: a source whitelist, the "wiki as
 * positive" convention), featurize every document with the deterministic
 * quality signals, and fit w by full-batch gradient descent.
 *
 * Scale shape: featurization is map-only; each GD round is ONE combinable
 * aggregation (d+1 decimal sums, map-side partials absorb everything) over
 * the persisted feature table, so a round costs a single 1-row-out pass no
 * matter the corpus size. The model state is d+1 doubles on the driver —
 * the same bounded-collect role as the BPE trainer's per-round argmax —
 * and rides back into the next round's plan as literals.
 *
 * Determinism / oracle parity: the per-sample gradient terms
 * (p_i - y_i) * x_ij are rounded to 7 dp and summed as DECIMAL, so the
 * gradient is exact and order-insensitive; the weight update
 * w_j - lr * (g_j / n) is a fixed-order double chain. DuckDB replays every
 * round bit-for-bit from unrolled CTEs (doc_logit_train).
 */
object LogitTrain {

  /**
   * Full-batch GD on logistic loss. `ftab` columns: `features` (numeric)
   * and `label` (0/1). Returns the weight history: row r = weights AFTER r
   * rounds (row 0 = all-zero init), each as (bias +: feature weights).
   */
  def train(ftab0: DataFrame, features: Seq[String], label: String,
            rounds: Int, lr: Double): Seq[(Int, Vector[Double])] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(lr > 0.0, s"lr must be positive, got $lr")
    val d = features.size
    val ftab = ftab0.select(
      features.map(f => col(f).cast("double").as(f)) :+
        col(label).cast("double").as("__y"): _*).persist()
    val n = ftab.count().toDouble
    require(n > 0, "empty training table")
    val w = Array.fill(d + 1)(0.0)
    val hist = Vector.newBuilder[(Int, Vector[Double])]
    hist += ((0, w.toVector))
    for (r <- 1 to rounds) {
      var z: Column = lit(w(0))
      for (i <- 0 until d) z = z + col(features(i)) * lit(w(i + 1))
      val err = lit(1.0) / (lit(1.0) + exp(-z)) - col("__y")
      val terms = round(err, 7).cast("decimal(20,7)") +:
        features.map(f => round(err * col(f), 7).cast("decimal(20,7)"))
      val aggs = terms.zipWithIndex.map { case (t, j) => sum(t).as(s"g$j") }
      val row = ftab.agg(aggs.head, aggs.tail: _*).head()
      for (j <- 0 to d)
        w(j) = w(j) - lr * (row.getDecimal(j).doubleValue / n)
      hist += ((r, w.toVector))
    }
    ftab.unpersist()
    hist.result()
  }

  /** The quality-filter instance: [[TextAnalysis.withQuality]] features
    * (the frozen scorer's exact transforms), `isTarget` as the positive
    * label. Returns (iter, b, w_ntok, w_mtl, w_punct, w_digit, w_stop). */
  def trainQuality(spark: SparkSession, docs: DataFrame, isTarget: Column,
                   rounds: Int = 3, lr: Double = 0.5): DataFrame = {
    import spark.implicits._
    val q = TextAnalysis.withQuality(docs)
    val ftab = q.select(
      least(col("n_tokens") / lit(50.0), lit(1.0)).as("f_ntok"),
      col("mean_token_len").as("f_mtl"),
      col("punct_ratio").as("f_punct"),
      col("digit_ratio").as("f_digit"),
      col("stopword_ratio").as("f_stop"),
      isTarget.cast("double").as("y"))
    train(ftab, Seq("f_ntok", "f_mtl", "f_punct", "f_digit", "f_stop"),
        "y", rounds, lr)
      .map { case (r, ws) => (r, ws(0), ws(1), ws(2), ws(3), ws(4), ws(5)) }
      .toDF("iter", "b", "w_ntok", "w_mtl", "w_punct", "w_digit", "w_stop")
  }
}
