package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions._
import graft.geo.CellIndex

/**
 * Within-distance spatial join: all (point, place) pairs at great-circle
 * distance <= radiusM — the "find everything within R meters" verb that sits
 * between reverse geocoding (R1, point -> containing polygon) and kNN (E6,
 * point -> k nearest). The reference exposes this shape as GeoAdmin's 50 m
 * reverse tolerance (/root/reference/src/geoadmin.rs:219-231 — reverse is
 * literally "places within tolerance of the point, nearest first"); this
 * operator generalizes it to an arbitrary radius and ALL matches.
 *
 * Candidate generation is a k-ring cell cover, not a theta join: each point
 * explodes the deduplicated k-ring of its cell at an auto-chosen level and
 * equi-joins places on the cell id — a pure hash join. Exactness comes from
 * the coverage guarantee (CellIndex.minEdgeMeters): every place strictly
 * outside kRing(cell, r) is at ground distance > r * minEdge(level), so
 * choosing r with r * minEdge >= radiusM makes the cover a superset of the
 * true result and the exact haversine filter does the rest. No dedup pass is
 * needed: kRing returns distinct cells, so a place joins at most once per
 * point.
 *
 * Level selection: the FINEST level whose ring radius stays <= maxRing keeps
 * the per-point fan-out bounded at (2*maxRing+1)^2 cells while cells stay as
 * small as the radius allows (coarser cells = fewer exploded rows but more
 * false-positive candidates per cell; both ends of the dial are bad, this
 * picks the knee).
 *
 * Scale shape (100 TB): with a gazetteer-sized places side the join is a
 * BROADCAST hash join and the points side is map-only — explode, probe,
 * filter, zero exchanges. Past the broadcast wall, bucket BOTH sides by the
 * cover-level cell id (the exploded points side on cand_cell, places on
 * cell) exactly as Reverse.reverseBucketed does for PIP, and the join runs
 * as a zero-exchange sort-merge join; radius skew (dense urban cells) is the
 * same salted two-path story as engine/Salt.
 */
object DistanceJoin {

  /** Finest cell level whose coverage-guaranteed ring for `radiusM` needs at
    * most `maxRing` rings. */
  /** Hard ceiling on the ring radius even after the level floors at 1:
    * beyond this the (2r+1)^2 per-point kRing explode is a fan-out bomb, so
    * a continent-scale `radiusM` is an explicit error (ADVICE r4), not a
    * silent tens-of-thousands-of-rows-per-point plan. At level 1 this
    * corresponds to a radius of ~MaxRingCap x quarter-hemisphere cells —
    * radii that large want a coarser algorithm (cross of the two coarse
    * grids), not a ring cover. */
  val MaxRingCap: Int = 16

  def coverLevel(radiusM: Double, maxRing: Int = 4): Int = {
    require(radiusM > 0, s"radiusM must be positive, got $radiusM")
    var lv = CellIndex.FineLevel
    while (lv > 1 && radiusM / CellIndex.minEdgeMeters(lv) > maxRing) lv -= 1
    val ring = coverRing(radiusM, lv)
    require(ring <= MaxRingCap,
      s"radiusM=$radiusM needs a ring of $ring cells even at level $lv " +
        s"(cap $MaxRingCap): unsupported radius for the k-ring cover join")
    lv
  }

  /** Ring radius at `level` that guarantees full coverage of `radiusM`. */
  def coverRing(radiusM: Double, level: Int): Int =
    math.max(1, math.ceil(radiusM / CellIndex.minEdgeMeters(level)).toInt)

  /**
   * points: (query_id, lon, lat). places: (place_id, name, lon, lat).
   * Output: one row per (point, place) pair with haversine(point, place) <=
   * radiusM — exact, coverage-guaranteed. `level` <= 0 auto-selects.
   */
  def withinRadius(points: DataFrame, places: DataFrame, radiusM: Double,
                   level: Int = -1): DataFrame = {
    val lv = if (level > 0) level else coverLevel(radiusM)
    val r = coverRing(radiusM, lv)
    val pts = points
      .withColumn("__cell", cellId(col("lon"), col("lat"), lit(lv)))
      .withColumn("__cand", explode(kRing(col("__cell"), lit(r))))
    val plc = broadcast(places.select(
      cellId(col("lon"), col("lat"), lit(lv)).as("__pcell"),
      col("place_id"), col("name"),
      col("lon").as("place_lon"), col("lat").as("place_lat")))
    pts.join(plc, pts("__cand") === plc("__pcell"), "inner")
      .withColumn("dist_m",
        haversineM(col("lon"), col("lat"), col("place_lon"), col("place_lat")))
      .filter(col("dist_m") <= radiusM)
      .select(col("query_id"), col("place_id"), col("name"),
        col("place_lon"), col("place_lat"), col("dist_m"))
  }

  /**
   * World-scale layout: both sides materialized as tables BUCKETED on the
   * cover-level cell (mirrors Pipeline.geocodeWorldScale / Reverse's packed
   * bucketed tables) — for when the places side outgrows the broadcast
   * budget. The exploded point-side cover and the places both pay their
   * shuffle ONCE at write time; every subsequent query-batch join is a
   * zero-exchange sort-merge join.
   */
  def writeBucketed(spark: org.apache.spark.sql.SparkSession,
                    points: DataFrame, places: DataFrame, radiusM: Double,
                    ptsTable: String, plcTable: String, basePath: String,
                    buckets: Int, level: Int = -1): Int = {
    val lv = if (level > 0) level else coverLevel(radiusM)
    val r = coverRing(radiusM, lv)
    val pts = points
      .withColumn("cell", cellId(col("lon"), col("lat"), lit(lv)))
      .withColumn("cand_cell", explode(kRing(col("cell"), lit(r))))
      .select("query_id", "lon", "lat", "cand_cell")
    val plc = places.select(
      cellId(col("lon"), col("lat"), lit(lv)).as("cand_cell"),
      col("place_id"), col("name"),
      col("lon").as("place_lon"), col("lat").as("place_lat"))
    Seq((ptsTable, pts), (plcTable, plc)).foreach { case (t, df) =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      df.write.bucketBy(buckets, "cand_cell").sortBy("cand_cell")
        .option("path", s"$basePath/$t").mode("overwrite").saveAsTable(t)
    }
    lv
  }

  /** The query-time half of the bucketed layout: a zero-exchange SMJ on the
    * cover cell + the exact haversine filter. */
  def withinRadiusBucketed(spark: org.apache.spark.sql.SparkSession,
                           ptsTable: String, plcTable: String,
                           radiusM: Double): DataFrame =
    spark.table(ptsTable).hint("merge")
      .join(spark.table(plcTable), Seq("cand_cell"), "inner")
      .withColumn("dist_m",
        haversineM(col("lon"), col("lat"), col("place_lon"), col("place_lat")))
      .filter(col("dist_m") <= radiusM)
      .select(col("query_id"), col("place_id"), col("name"),
        col("place_lon"), col("place_lat"), col("dist_m"))
}
