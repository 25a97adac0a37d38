package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._

/**
 * E7 — raster<->vector tiler: assign every geocoded hit to web-mercator
 * slippy tiles (z/x/y) and aggregate per tile. Pure arithmetic expressions —
 * whole-stage codegen end to end; the groupBy is the only shuffle and is
 * map-side-combined by HashAggregateExec automatically.
 */
object Tiler {

  /** Add tile_z/tile_x/tile_y for (lon, lat) at zoom z. */
  def assign(hits: DataFrame, z: Int): DataFrame =
    hits.withColumn("tile_z", lit(z))
      .withColumn("tile_x", tileX(col("lon"), lit(z)))
      .withColumn("tile_y", tileY(col("lat"), lit(z)))

  /** Per-tile rollup: hit count + distinct-page estimate. `idCol` names the
    * page/url column for the distinct estimate (HLL sketch, mergeable —
    * exact distinct would force a second shuffle). */
  def aggregate(hits: DataFrame, z: Int, idCol: String = "url"): DataFrame =
    assign(hits, z)
      .groupBy("tile_z", "tile_x", "tile_y")
      .agg(count(lit(1)).as("n_hits"),
        approx_count_distinct(col(idCol)).as("approx_pages"))

  /** Tile pyramid: per-tile hit counts at every zoom in [zMin, zMax]. The
    * base level pays the single hit-level shuffle; every coarser level
    * aggregates the PREVIOUS level's exponentially smaller tile table by
    * integer-halving x/y (`shiftright`, exact for the non-negative tile
    * domain) — raw hits are scanned exactly once no matter how many zooms
    * are emitted, which is what makes a 20-level pyramid affordable at
    * crawl scale. Valid because floor(floor(a)/2) == floor(a/2) for a >= 0:
    * halving a zoom-z index IS the zoom-(z-1) index. */
  def pyramid(hits: DataFrame, zMin: Int, zMax: Int): DataFrame = {
    require(0 <= zMin && zMin <= zMax, s"bad zoom range [$zMin, $zMax]")
    val base = assign(hits, zMax)
      .groupBy("tile_z", "tile_x", "tile_y")
      .agg(count(lit(1)).as("n_hits"))
    Iterator.iterate(base)(prev =>
        prev.groupBy((col("tile_z") - 1).as("tile_z"),
            shiftright(col("tile_x"), 1).as("tile_x"),
            shiftright(col("tile_y"), 1).as("tile_y"))
          .agg(sum(col("n_hits")).as("n_hits")))
      .take(zMax - zMin + 1).reduce(_ unionByName _)
  }

  /** Kernel-smoothed density raster ("heatmap"): every hit contributes an
    * integer binomial 3x3 kernel (4 center / 2 edge / 1 corner — the
    * separable [1 2 1] stencil) to its tile's neighborhood. Integer weights
    * keep the per-tile sum EXACT and order-insensitive — a double-valued
    * kernel would make the rollup partitioning-dependent in the last bit.
    * Shape: map-only 9-way explode per hit, then ONE map-side-combinable
    * sum; x wraps at the antimeridian, y rows off the mercator square drop. */
  def heatmap(hits: DataFrame, z: Int): DataFrame = {
    val n = 1L << z
    val kernel = for (dx <- -1 to 1; dy <- -1 to 1) yield
      struct(lit(dx).as("dx"), lit(dy).as("dy"),
        lit(4L >> (dx.abs + dy.abs)).as("w"))
    assign(hits, z)
      .select(col("tile_x"), col("tile_y"), explode(array(kernel: _*)).as("o"))
      .select(pmod(col("tile_x") + col("o.dx") + n, lit(n)).as("tile_x"),
        (col("tile_y") + col("o.dy")).as("tile_y"), col("o.w").as("w"))
      .filter(col("tile_y") >= 0 && col("tile_y") < n)
      .groupBy("tile_x", "tile_y").agg(sum("w").as("heat"))
  }

  /**
   * RASTER -> VECTOR: binary marching squares over a density grid — the
   * iso-contour of `grid` at `threshold` as line segments, the step that
   * turns the tiler's raster back into drawable vector geometry (density
   * outlines of where a crawl's geocoded output concentrates).
   *
   * Formulation: grid cells are the SAMPLE POINTS (corners of 2x2 blocks).
   * Each dense cell (value >= threshold) contributes its corner bit to the
   * four blocks that touch it (TL=1, TR=2, BR=4, BL=8) — one 4-way explode
   * and ONE map-side-combinable sum, never a self-join of shifted grids —
   * and the per-block 4-bit case index picks segments from a broadcast
   * 16-case lookup. Saddle cases (5, 10) use the fixed standard resolution
   * (two segments each), so output is deterministic with no ambiguity rule
   * hidden in data order. Segment endpoints are EDGE MIDPOINTS in integer
   * half-units (block (bx,by) spans half-coords [2bx, 2bx+2]) — exact
   * integers end to end, no interpolation float in the contract.
   *
   * Scale shape: work after the density aggregation is proportional to the
   * number of blocks touching dense cells, and emitted segments scale with
   * contour BOUNDARY length, not dense area (interior case-15 blocks are
   * dropped) — the compact-index argument applied to rasters. The x wrap at
   * the antimeridian is the raster's concern ([[heatmap]] wraps); seam
   * blocks appear once per side, unwrapped.
   */
  def contours(grid: DataFrame, threshold: Long,
               xCol: String = "tile_x", yCol: String = "tile_y",
               vCol: String = "heat"): DataFrame = {
    val dense = grid.filter(col(vCol) >= threshold)
      .select(col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val contrib = dense.select(explode(array(
        struct(col("x").as("bx"), col("y").as("by"), lit(1L).as("bit")),
        struct((col("x") - 1).as("bx"), col("y").as("by"), lit(2L).as("bit")),
        struct((col("x") - 1).as("bx"), (col("y") - 1).as("by"), lit(4L).as("bit")),
        struct(col("x").as("bx"), (col("y") - 1).as("by"), lit(8L).as("bit"))))
        .as("c"))
      .select(col("c.bx").as("bx"), col("c.by").as("by"), col("c.bit").as("bit"))
    val cases = contrib.groupBy("bx", "by").agg(sum("bit").as("case_idx"))
      .filter(col("case_idx") < 15)
    val spark = grid.sparkSession
    import spark.implicits._
    val segs = broadcast(MarchingSquaresSegments
      .toDF("case_idx", "seg_idx", "d1x", "d1y", "d2x", "d2y"))
    cases.join(segs, Seq("case_idx"))
      .select(col("bx"), col("by"), col("case_idx"), col("seg_idx"),
        (col("bx") * 2 + col("d1x")).as("x1h"),
        (col("by") * 2 + col("d1y")).as("y1h"),
        (col("bx") * 2 + col("d2x")).as("x2h"),
        (col("by") * 2 + col("d2y")).as("y2h"))
  }

  /** The 16-case marching-squares segment table over edge midpoints
    * T=(1,0) R=(2,1) B=(1,2) L=(0,1) in block-local half-units; saddles
    * (5, 10) emit the fixed standard pair. */
  private val MarchingSquaresSegments: Seq[(Long, Int, Long, Long, Long, Long)] = {
    val T = (1L, 0L); val R = (2L, 1L); val B = (1L, 2L); val L = (0L, 1L)
    val byCase: Seq[(Int, Seq[((Long, Long), (Long, Long))])] = Seq(
      1 -> Seq((L, T)), 2 -> Seq((T, R)), 3 -> Seq((L, R)), 4 -> Seq((R, B)),
      5 -> Seq((L, T), (R, B)), 6 -> Seq((T, B)), 7 -> Seq((L, B)),
      8 -> Seq((B, L)), 9 -> Seq((T, B)), 10 -> Seq((T, R), (B, L)),
      11 -> Seq((R, B)), 12 -> Seq((R, L)), 13 -> Seq((T, R)),
      14 -> Seq((L, T)))
    for ((c, ss) <- byCase; (((x1, y1), (x2, y2)), i) <- ss.zipWithIndex)
      yield (c.toLong, i, x1, y1, x2, y2)
  }

  /** Vector side: decode tile ids back to their lon/lat bounding box
    * (raster->vector direction). Inverse of the assignment math. */
  def tileBounds(tiles: DataFrame): DataFrame = {
    val n = pow(lit(2.0), col("tile_z"))
    val lonMin = col("tile_x") / n * 360.0 - 180.0
    val lonMax = (col("tile_x") + 1) / n * 360.0 - 180.0
    def lat(ty: org.apache.spark.sql.Column) =
      degrees(atan(sinh(lit(math.Pi) * (lit(1.0) - lit(2.0) * ty / n))))
    tiles.withColumn("min_lon", lonMin).withColumn("max_lon", lonMax)
      .withColumn("max_lat", lat(col("tile_y")))
      .withColumn("min_lat", lat(col("tile_y") + 1))
  }
}
