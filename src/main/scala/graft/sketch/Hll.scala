package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * HyperLogLog cardinality sketch on the portable sha60 hash — the
 * register-MERGEABLE distinct estimator for crawl-scale per-group counts.
 * [[Kmv]] gives the k-minimum-values estimator whose state is a value list;
 * HLL's state is a fixed m-register vector whose merge is element-wise MAX,
 * which is what a 1000-executor tree aggregation (or a cross-datacenter
 * union of shard sketches) actually wants: constant-size state, one
 * combinable aggregate, no per-value retention.
 *
 * Everything here is reproducible bit-for-bit by an external engine:
 * the hash is the validated sha60 family, the register value is derived
 * from the binary-string length of the hash remainder (both Spark and
 * DuckDB expose `bin()` with identical no-leading-zeros semantics), the
 * harmonic denominator is accumulated as an EXACT integer (sum of
 * 2^(55-reg) — order-insensitive, no float-summation drift), and the only
 * floating-point steps are a fixed-order multiply/divide chain and one
 * `ln` whose 63 possible linear-counting inputs all sit far from rounding
 * boundaries (validated against DuckDB).
 *
 * Parameters are fixed at p=6 (m=64 registers, alpha=0.709, standard error
 * ~13%) — small enough that an oracle can rebuild every register, the same
 * trade the Count-Min contract row makes. Production would raise p; the
 * plan shape is p-independent.
 */
object Hll {

  /** Number of registers m = 2^p with p = 6. */
  val M = 64
  /** Bias constant alpha for m = 64 (Flajolet et al. 2007). */
  val Alpha = 0.709
  /** The hash remainder width: sha60 minus the 6 bucket bits. */
  val WBits = 54
  /** 2^54, the bucket divisor. */
  val BucketDiv = 18014398509481984L

  /**
   * Per-(key, bucket) register table: `reg` = max over values of
   * (leading zeros of the 54-bit hash remainder + 1), in 1..55.
   *
   * Scale shape: map-only hash + bucket math, then ONE combinable max
   * aggregation on (key, bucket) — map-side partials absorb hot keys, the
   * shuffle carries only (key, int, int) rows, and the result is the
   * sketch state itself: union further shards and re-run [[merge]] to
   * combine, which is exactly how per-executor / per-day partial sketches
   * compose at crawl scale.
   */
  def registers(df: DataFrame, keyCol: Column, valueCol: Column): DataFrame = {
    val h = TextFunctions.sha60(valueCol)
    df.select(keyCol.as("key"), h.as("h"))
      .select(col("key"),
        expr(s"h div $BucketDiv").cast("int").as("bucket"),
        expr(s"h % $BucketDiv").as("w"))
      .withColumn("rho",
        when(col("w") === 0, lit(WBits + 1))
          .otherwise(lit(WBits + 1) - length(bin(col("w")))).cast("int"))
      .groupBy("key", "bucket").agg(max(col("rho")).as("reg"))
  }

  /** Element-wise max-merge of unioned register tables — the HLL merge
    * operation (idempotent, commutative, associative: safe under retries,
    * shard unions, and any aggregation-tree shape). */
  def merge(regs: DataFrame): DataFrame =
    regs.groupBy("key", "bucket").agg(max(col("reg")).as("reg"))

  /**
   * Estimate per key from a register table.
   *
   * The harmonic denominator sum(2^-reg) over all m registers (absent
   * bucket = register 0) is carried as the exact integer
   * `reg_sum` = sum(2^(55-reg)) + (m - nb) * 2^55 — at most 64 * 2^55 <
   * 2^62, no overflow, and bit-identical regardless of partitioning or
   * summation order. Small-range (linear counting) correction applies
   * below 2.5m with empty registers present, per the standard algorithm.
   *
   * @return (key, v_zero: int — empty registers, reg_sum: long — exact
   *          harmonic state, est_distinct: long)
   */
  def estimate(regs: DataFrame): DataFrame = {
    val twoPow = expr(s"shiftleft(CAST(1 AS BIGINT), ${WBits + 1} - reg)")
    val agg = regs.groupBy("key").agg(
      count(lit(1)).cast("int").as("nb"),
      sum(twoPow).as("sp"))
    val full = agg.select(col("key"),
      (lit(M) - col("nb")).cast("int").as("v_zero"),
      (col("sp") + (lit(M.toLong) - col("nb").cast("long"))
        * lit(1L << (WBits + 1))).as("reg_sum"))
    // fixed-order IEEE chain, identical in the oracle: alpha * m^2 * 2^55 / S
    val estRaw = lit(Alpha) * lit((M * M).toDouble) *
      lit(BucketDiv.toDouble * 2.0) / col("reg_sum").cast("double")
    full.withColumn("est_distinct",
      when(estRaw <= lit(2.5 * M) && col("v_zero") > 0,
        round(lit(M.toDouble) * log(lit(M.toDouble) / col("v_zero").cast("double"))))
        .otherwise(round(estRaw)).cast("long"))
  }

  /** One-shot per-key distinct sketch, with the exact count riding along
    * for error inspection (drop `n_exact` at crawl scale — it is the
    * expensive full-distinct shuffle the sketch exists to avoid). */
  def hllDistinct(df: DataFrame, keyCol: Column, valueCol: Column): DataFrame = {
    val est = estimate(registers(df, keyCol, valueCol))
    val exact = df.select(keyCol.as("key"), valueCol.as("v")).distinct()
      .groupBy("key").agg(count(lit(1)).as("n_exact"))
    est.join(exact, Seq("key"))
  }
}
