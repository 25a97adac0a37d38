package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Mergeable quantile sketch over non-negative longs: a fixed-boundary
 * base-2 log histogram with 4 sub-buckets per octave (~25% relative error),
 * the quantile member of the sketch family ([[Kmv]]/[[Hll]] distinct,
 * Count-Min frequency, Bloom membership). The bucket function is pure
 * integer bit math — msb via the binary-string length (`bin()`, identical
 * no-leading-zeros semantics in Spark and DuckDB) and a 2-bit sub-bucket —
 * so an external engine rebuilds every cell and replays every estimate
 * bit-for-bit; nothing is sampled and nothing depends on row order.
 *
 * Scale shape: the cell table is ONE combinable (key, bucket) count whose
 * map-side partials absorb hot keys; its merge is cell-wise SUM
 * (commutative/associative — safe under retries, shard unions, any
 * aggregation-tree shape), which is how per-executor / per-day partial
 * histograms compose at crawl scale. Estimation runs over ≤ ~250 cells per
 * key (62 octaves × 4), so the cumulative window is narrow by construction.
 *
 * Bucket layout: v in [0,4) → bucket v (exact); v ≥ 4 → bucket
 * 4·msb + sub with msb = bitlength(v) − 1 ≥ 2 and sub = (v >> (msb−2)) & 3,
 * covering [(4+sub)·2^(msb−2), (5+sub)·2^(msb−2)). Buckets 4–7 are unused
 * (v < 4 is exact) — a documented hole, not a collision.
 */
object QuantileHist {

  /** Bucket id of the non-negative long column named `v` (the shift amount
    * is itself a column, which the SQL ShiftRight expression accepts but the
    * Scala `functions.shiftright` overload does not). */
  private def bucketExpr(v: String): Column = expr(
    s"CAST(CASE WHEN $v < 4 THEN $v ELSE (length(bin($v)) - 1) * 4 + " +
    s"(shiftright($v, CAST(length(bin($v)) AS INT) - 3) & 3) END AS INT)")

  /** Inclusive upper bound of the bucket column named `b` — the
    * deterministic value every quantile landing in the bucket reports. */
  private def upperExpr(b: String): Column = expr(
    s"CASE WHEN $b < 4 THEN CAST($b AS BIGINT) ELSE " +
    s"shiftleft(CAST($b % 4 + 5 AS BIGINT), ($b div 4) - 2) - 1 END")

  /** Per-(key, bucket) cell counts — the sketch state. */
  def cells(df: DataFrame, keyCol: Column, valueCol: Column): DataFrame =
    df.select(keyCol.as("key"), valueCol.as("__v"))
      .select(col("key"), bucketExpr("__v").as("bucket"))
      .groupBy("key", "bucket").agg(count(lit(1)).as("cnt"))

  /** Cell-wise sum of unioned cell tables — the histogram merge. */
  def merge(cells: DataFrame): DataFrame =
    cells.groupBy("key", "bucket").agg(sum(col("cnt")).as("cnt"))

  /**
   * Quantile estimates from a cell table: for each percentile p, the upper
   * bound of the first bucket whose cumulative count reaches
   * ceil(n_total · p / 100) — integer threshold arithmetic, no float path
   * at all.
   *
   * @return (key, pct: int, est_value: long, n_total: long)
   */
  def quantiles(cells: DataFrame, pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100))
    val tot = cells.groupBy("key").agg(sum(col("cnt")).as("n_total"))
    val cum = cells.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy("key").orderBy("bucket")))
    cum.join(tot, "key")
      .select(col("key"), col("bucket"), col("cum"), col("n_total"),
        explode(array(pcts.map(p => lit(p)): _*)).as("pct"))
      .filter(col("cum") >= expr("(n_total * pct + 99) div 100"))
      .groupBy("key", "pct")
      .agg(min(col("bucket")).as("b"), min(col("n_total")).as("n_total"))
      .select(col("key"), col("pct"), upperExpr("b").as("est_value"),
        col("n_total"))
  }

  /** One-shot per-key quantile sketch. */
  def sketch(df: DataFrame, keyCol: Column, valueCol: Column,
             pcts: Seq[Int]): DataFrame =
    quantiles(cells(df, keyCol, valueCol), pcts)
}
