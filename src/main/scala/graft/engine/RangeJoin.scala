package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join — the second classic operator family Spark's
 * equi-joins lack (with [[AsOf]]): match each left point row (key, v) to
 * every right interval row (key, lo, hi) with lo <= v <= hi, inclusive.
 *
 * Scale-correct shape: BAND the value domain. Each interval explodes to the
 * bands it covers, each point maps to exactly ONE band, and the join is an
 * equi-join on (key, band) plus a residual BETWEEN filter. No range/theta
 * join (quadratic per key), no duplicates to clean up (a point's single band
 * meets an interval's distinct band list at most once). `bandSize` trades
 * the interval explode factor (≈ interval_length / bandSize + 1 rows)
 * against bucket selectivity — size it near the typical interval length.
 */
object RangeJoin {

  /** @param maxBands fail-fast bound on one interval's band fan-out: a dirty
    *                  row with a sentinel bound (hi = Long.MaxValue) would
    *                  otherwise ask sequence() for ~2^52 elements and abort
    *                  the job with an opaque array-allocation error — raise
    *                  an explicit one instead; clamp sentinels upstream. */
  /** Exact floor-division on longs: `(v - pmod(v, b)) div b`. Double
    * arithmetic (`floor(v / b.toDouble)`) loses integer resolution past 2^53
    * and can place a point and its interval bound in DIFFERENT bands —
    * silently dropping a true match (the residual BETWEEN only removes false
    * positives, never restores false negatives). pmod keeps the numerator a
    * non-negative-adjusted exact multiple of b, so truncating `div` == floor
    * for negative operands too. */
  private def floorDiv(v: org.apache.spark.sql.Column, b: Long) =
    call_function("div", v.cast("long") - pmod(v.cast("long"), lit(b)), lit(b))

  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                vCol: String, loCol: String, hiCol: String,
                bandSize: Long, maxBands: Int = 65536): DataFrame = {
    require(bandSize > 0, "bandSize must be positive")
    val p = points.withColumn("__band", floorDiv(col(vCol), bandSize))
    val loB = floorDiv(col(loCol), bandSize)
    val hiB = floorDiv(col(hiCol), bandSize)
    // the guard is folded INTO the sequence bound (a dropped side-channel
    // column would be pruned away by Catalyst along with its raise_error)
    val hiGuarded = when(hiB - loB >= maxBands.toLong,
      raise_error(concat(
        lit(s"rangeJoin: interval wider than maxBands=$maxBands bands ("),
        col(loCol), lit(".."), col(hiCol), lit(")"))).cast("long"))
      .otherwise(hiB)
    val iv = intervals.withColumn("__band", explode(sequence(loB, hiGuarded)))
    p.withColumn("__band", col("__band").cast("long"))
      .join(iv, keyCols :+ "__band")
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__band")
  }

  /**
   * Broadcast DICTIONARY variant of the range join — the GeoIP / tariff-table
   * / threshold-schedule shape: the interval table is a small-to-medium
   * lookup dimension (an IPv4 geolocation table is a few million rows), the
   * probe side is the 100 TB fact table, and every probe row must SURVIVE
   * (left-outer: an unmatched value carries NULL payload — a lookup that
   * silently drops rows corrupts the corpus it annotates).
   *
   * Plan shape: the banded dimension is broadcast, each probe row computes
   * its single band and hash-probes once — the probe side is MAP-ONLY with
   * zero exchanges, which is what makes this the right variant whenever the
   * dimension fits the broadcast budget ([[rangeJoin]] is the symmetric
   * shuffle variant for when it doesn't). Banding keeps the broadcast build
   * side small under wide intervals: for DISJOINT intervals the banded row
   * count is <= domain/bandSize + n REGARDLESS of individual interval widths
   * (each band is entered by at most one interval plus its tail), e.g. any
   * disjoint IPv4 table at bandSize 2^16 is <= 65536 + n rows.
   *
   * Overlapping intervals emit one output row per containing interval —
   * callers wanting at-most-one match keep the dictionary disjoint (the
   * GeoIP contract) or pick their winner downstream.
   */
  def broadcastLookup(probes: DataFrame, ranges: DataFrame, vCol: String,
                      loCol: String, hiCol: String, bandSize: Long,
                      maxBands: Int = 65536): DataFrame = {
    require(bandSize > 0, "bandSize must be positive")
    val p = probes.withColumn("__pband", floorDiv(col(vCol), bandSize))
    val loB = floorDiv(col(loCol), bandSize)
    val hiB = floorDiv(col(hiCol), bandSize)
    val hiGuarded = when(hiB - loB >= maxBands.toLong,
      raise_error(concat(
        lit(s"broadcastLookup: interval wider than maxBands=$maxBands bands ("),
        col(loCol), lit(".."), col(hiCol), lit(")"))).cast("long"))
      .otherwise(hiB)
    val iv = ranges.withColumn("__rband", explode(sequence(loB, hiGuarded)))
    p.join(broadcast(iv),
        col("__pband") === col("__rband") &&
          col(vCol) >= col(loCol) && col(vCol) <= col(hiCol), "left")
      .drop("__pband", "__rband")
  }
}
