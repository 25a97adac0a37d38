package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bbox-overlap spatial join: all (a, b) pairs of axis-aligned lon/lat boxes
 * that intersect (closed edges — touching boxes match). The rectangle verb
 * the point-family operators ([[DistanceJoin]] point-radius, Reverse
 * point-in-polygon, Knn point-nearest) don't cover: joining extracted page
 * viewports / map embeds / polygon MBRs against admin-region or tile-pyramid
 * extents.
 *
 * Shape is textbook PBSM (Patel & DeWitt, SIGMOD 1996) on an EXACT integer
 * grid: each box enumerates the full integer range of `gridDeg`-sized cells
 * it touches in each axis (floor(min/g)..floor(max/g) — exhaustive by
 * construction, unlike a sampled cover), the join is an equi-join on the
 * (cx, cy) cell, and the exact rectangle test filters false cell-mates.
 *
 * Duplicate avoidance WITHOUT a distinct/groupBy shuffle: two overlapping
 * boxes share every cell their overlap rectangle touches, so a naive cell
 * join emits the pair once per shared cell. Each candidate row instead keeps
 * the pair only in the REFERENCE cell — the cell containing the overlap
 * rectangle's SW corner (greatest of the min corners). That cell intersects
 * both boxes, so both integer-range covers contain it (exactly once), and no
 * other cell passes the equality — each true pair survives exactly once,
 * each false pair never, with zero post-join aggregation.
 *
 * Scale shape: with a dimension-sized b side (admin regions, tile extents)
 * the join is a BROADCAST hash join and the a side is map-only — explode,
 * probe, filter, zero exchanges. Past the broadcast wall both sides bucket
 * on the cell key (the DistanceJoin.writeBucketed story). Skewed cells
 * (every box overlapping one metro cell) are the same salted two-path story
 * as [[Salt]]; first remedy is a finer `gridDeg`, which PBSM lets you pick
 * per-deployment because correctness never depends on it.
 *
 * @param gridDeg        partitioning cell size in degrees — tune toward the
 *                       typical box edge; correctness is grid-independent
 * @param maxCellsPerBox fail-fast bound on one box's PER-AXIS cell fan-out
 *                       (a dirty row spanning the globe at a fine grid would
 *                       otherwise explode unbounded — raise loudly instead)
 */
object BboxJoin {

  private def cellOf(v: Column, gridDeg: Double): Column =
    floor(v / lit(gridDeg)).cast("long")

  /** Exhaustive per-axis integer cell range, with the fan-out guard folded
    * into the sequence bound (the RangeJoin idiom — a side-channel guard
    * column would be pruned along with its raise_error). */
  private def axisCells(lo: Column, hi: Column, gridDeg: Double,
                        maxCells: Int): Column = {
    val loC = cellOf(lo, gridDeg)
    val hiC = cellOf(hi, gridDeg)
    val hiGuarded = when(hiC - loC >= maxCells.toLong,
      raise_error(concat(
        lit(s"BboxJoin: box spans more than maxCellsPerBox=$maxCells cells on one axis ("),
        lo, lit(".."), hi, lit(s") at gridDeg=$gridDeg"))).cast("long"))
      .otherwise(hiC)
    sequence(loC, hiGuarded)
  }

  /**
   * a: (a_id, a_min_lon, a_min_lat, a_max_lon, a_max_lat);
   * b: (b_id, b_min_lon, b_min_lat, b_max_lon, b_max_lat).
   * Output: one row per intersecting pair — ids plus the exact overlap
   * rectangle (pure max/min of the inputs, no rounding).
   *
   * @param broadcastB force a broadcast hash join with `b` as the build
   *                   side (the default — right whenever the exploded b
   *                   side fits an executor, which covers the
   *                   polygon-catalog shapes this engine joins against).
   *                   Pass `false` past the broadcast wall: strategy
   *                   selection then falls to AQE/the planner, and both
   *                   exploded sides shuffle (or read bucketed) on the
   *                   (__cx, __cy) cell key — the PBSM partition join —
   *                   instead of OOMing the driver on the forced build.
   */
  def overlapJoin(a: DataFrame, b: DataFrame, gridDeg: Double,
                  maxCellsPerBox: Int = 4096,
                  broadcastB: Boolean = true): DataFrame = {
    require(gridDeg > 0, s"gridDeg must be positive, got $gridDeg")
    val ac = a
      .withColumn("__cx", explode(axisCells(
        col("a_min_lon"), col("a_max_lon"), gridDeg, maxCellsPerBox)))
      .withColumn("__cy", explode(axisCells(
        col("a_min_lat"), col("a_max_lat"), gridDeg, maxCellsPerBox)))
    val bPlain = b
      .withColumn("__cx", explode(axisCells(
        col("b_min_lon"), col("b_max_lon"), gridDeg, maxCellsPerBox)))
      .withColumn("__cy", explode(axisCells(
        col("b_min_lat"), col("b_max_lat"), gridDeg, maxCellsPerBox)))
    val bc = if (broadcastB) broadcast(bPlain) else bPlain
    ac.join(bc, Seq("__cx", "__cy"))
      .filter(col("a_min_lon") <= col("b_max_lon") &&
        col("b_min_lon") <= col("a_max_lon") &&
        col("a_min_lat") <= col("b_max_lat") &&
        col("b_min_lat") <= col("a_max_lat"))
      .withColumn("ov_min_lon", greatest(col("a_min_lon"), col("b_min_lon")))
      .withColumn("ov_min_lat", greatest(col("a_min_lat"), col("b_min_lat")))
      // PBSM reference point: keep the pair only in its overlap-SW-corner cell
      .filter(col("__cx") === cellOf(col("ov_min_lon"), gridDeg) &&
        col("__cy") === cellOf(col("ov_min_lat"), gridDeg))
      .select(col("a_id"), col("b_id"),
        col("ov_min_lon"), col("ov_min_lat"),
        least(col("a_max_lon"), col("b_max_lon")).as("ov_max_lon"),
        least(col("a_max_lat"), col("b_max_lat")).as("ov_max_lat"))
  }
}
