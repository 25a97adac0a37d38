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
