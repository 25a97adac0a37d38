package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Portable Bloom filter — the bounded-memory set-membership gate
 * (URL blocklists, seen-before fingerprints) for domains too wide to
 * broadcast exactly. k hash rows over m bits; a candidate "might be in the
 * set" iff ALL k of its bits are set, so misses are exact (no false
 * negatives) and false positives are bounded by (set bits / m)^k.
 *
 * Built on the PORTABLE sha60 hash family ("bf:<row>:<item>"), so an
 * external engine rebuilds every set bit and every membership verdict
 * bit-for-bit — same contract as the Count-Min / KMV / MinHash sketches.
 *
 * Scale shape: construction is one map-side generator + a DISTINCT over at
 * most m rows (the exchange carries bit positions, never items); the
 * materialized filter is <= m rows regardless of set size and broadcasts to
 * the membership join, so the probe stream never reshuffles.
 */
object Bloom {

  /** The k hash bits of one item as array<long> of positions in [0, m). */
  private def bitsOf(item: Column, k: Int, m: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), r =>
      pmod(TextFunctions.sha60(
        concat(lit("bf:"), r.cast("string"), lit(":"), item)), lit(m.toLong)))

  /** Build the filter: one row per SET bit, (bf_bit: long), de-duplicated. */
  def build(items: DataFrame, item: Column, k: Int, m: Int): DataFrame = {
    require(k >= 1 && m >= 2, "need k >= 1, m >= 2")
    items.select(explode(bitsOf(item, k, m)).as("bf_bit")).distinct()
  }

  /** Union filters built with the SAME (k, m, hash family) by OR-ing bits —
    * per-shard blocklist filters combine into the corpus filter without
    * re-reading the sets: union(build(A), build(B)) == build(A ∪ B)
    * bit-for-bit. */
  def union(filters: DataFrame*): DataFrame = {
    require(filters.nonEmpty, "need at least one filter")
    filters.reduce(_ unionByName _).distinct()
  }

  /** Membership verdicts for candidate items against a built filter:
    * bloom_hit iff all k bits are present. The filter side is bounded
    * (<= m rows) and broadcast; candidates never shuffle. */
  def mightContain(bloomDf: DataFrame, candidates: DataFrame, item: Column,
                   k: Int, m: Int): DataFrame =
    candidates.select(item.as("item"))
      .select(col("item"), explode(bitsOf(col("item"), k, m)).as("bf_bit"))
      .join(broadcast(bloomDf.withColumn("__set", lit(1))), Seq("bf_bit"), "left")
      .groupBy("item")
      .agg((count(col("__set")) === k).as("bloom_hit"))
}
