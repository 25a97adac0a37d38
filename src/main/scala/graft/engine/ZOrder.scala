package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/**
 * Z-order (Morton) locality layout and pruned bbox scans over web-mercator
 * tiles — the data-layout half of the tiler story (SURVEY.md §2.7 E7; the
 * north_star's raster<->vector tiler assigns hits to tiles, THIS decides how
 * those rows sit on disk so a spatial read doesn't scan the world).
 *
 * At 100 TB the dominant cost of "give me everything in this bbox" is the
 * scan, not the math: rows laid out in ingestion order force a full pass.
 * Sorting by the Morton interleave of (tileX, tileY) places spatially-near
 * tiles in the same files, and because the code is monotone in quadtree
 * depth-first order, ANY axis-aligned tile bbox decomposes into a small set
 * of CONTIGUOUS z-ranges (aligned quadtree nodes, merged). A reader then
 * pushes `z BETWEEN lo AND hi` disjuncts to the parquet scan where row-group
 * min/max stats prune everything outside — the same mechanism as Delta's
 * OPTIMIZE ZORDER, built from scratch on the engine's own tile math.
 *
 * Range semantics: [[bboxRanges]] returns an exact cover when the quad
 * decomposition stays under `maxRanges`, else a superset cover (coarser
 * nodes); [[scanBbox]] therefore always re-applies the exact tile-bbox
 * predicate after the range disjunction — ranges are a PRUNING device, never
 * a correctness device.
 */
object ZOrder {

  /** Tile coordinates and their Morton code at `zoom` for (lonCol, latCol). */
  def withZ(df: DataFrame, lonCol: Column, latCol: Column, zoom: Int): DataFrame = {
    require(zoom >= 0 && zoom <= 30, s"zoom out of range: $zoom")
    df.withColumn("tile_x", GeoFunctions.tileX(lonCol, lit(zoom)))
      .withColumn("tile_y", GeoFunctions.tileY(latCol, lit(zoom)))
      .withColumn("z", GeoFunctions.morton(col("tile_x"), col("tile_y")))
  }

  /** Locality layout: range-partition by the Morton code and sort within
    * partitions, so each output file covers a contiguous z-interval and
    * carries tight min/max stats for [[scanBbox]] pruning. `numFiles` sizes
    * the layout (at cluster scale: total bytes / target file size). */
  def layout(df: DataFrame, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive: $numFiles")
    df.repartitionByRange(numFiles, col("z")).sortWithinPartitions(col("z"))
  }

  /** Decompose the tile bbox [minTx..maxTx] x [minTy..maxTy] at `zoom` into
    * merged contiguous Morton ranges (inclusive). Exact cover unless the
    * aligned-quad decomposition would exceed `maxRanges`, in which case
    * partially-covered nodes at the frontier are emitted whole (superset). */
  def bboxRanges(minTx: Long, minTy: Long, maxTx: Long, maxTy: Long,
                 zoom: Int, maxRanges: Int = 64): Seq[(Long, Long)] = {
    val n = 1L << zoom
    require(minTx >= 0 && maxTx < n && minTy >= 0 && maxTy < n &&
      minTx <= maxTx && minTy <= maxTy,
      s"bbox out of range at zoom $zoom: ($minTx,$minTy)-($maxTx,$maxTy)")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    // emit in increasing z (depth-first, children in z quadrant order), so
    // adjacent ranges merge with a single look-back
    def emit(lo: Long, hi: Long): Unit =
      if (out.nonEmpty && out.last._2 + 1 == lo)
        out(out.length - 1) = (out.last._1, hi)
      else out += ((lo, hi))
    // quad budget: every split adds <= 3 ranges; stop splitting when full
    def walk(x0: Long, y0: Long, size: Long, zBase: Long): Unit = {
      if (x0 > maxTx || y0 > maxTy || x0 + size - 1 < minTx || y0 + size - 1 < minTy) return
      val zSpan = size * size
      val contained = x0 >= minTx && x0 + size - 1 <= maxTx &&
        y0 >= minTy && y0 + size - 1 <= maxTy
      if (contained || size == 1L || out.length + 3 > maxRanges) {
        emit(zBase, zBase + zSpan - 1)
      } else {
        val h = size / 2
        val q = zSpan / 4
        walk(x0, y0, h, zBase)
        walk(x0 + h, y0, h, zBase + q)
        walk(x0, y0 + h, h, zBase + 2 * q)
        walk(x0 + h, y0 + h, h, zBase + 3 * q)
      }
    }
    walk(0L, 0L, n, 0L)
    out.toSeq
  }

  /** Bbox scan over a [[withZ]] table: the z-range disjunction prunes (pushed
    * to the parquet scan as min/max-filterable BETWEENs on a sorted layout),
    * the exact tile predicate decides. */
  def scanBbox(df: DataFrame, minTx: Long, minTy: Long, maxTx: Long, maxTy: Long,
               zoom: Int, maxRanges: Int = 64): DataFrame = {
    val ranges = bboxRanges(minTx, minTy, maxTx, maxTy, zoom, maxRanges)
    val zPrune = ranges.map { case (lo, hi) => col("z").between(lo, hi) }
      .reduce(_ || _)
    df.filter(zPrune)
      .filter(col("tile_x").between(minTx, maxTx) &&
        col("tile_y").between(minTy, maxTy))
  }
}
