package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Hotspots, Tiler}

/** Grid-DBSCAN hotspot clustering + the kernel heatmap. */
class HotspotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // zoom-4 grid: 16x16 tiles of 22.5 degrees; tile centers are easy to hit
  private val zoom = 4
  private def tileCenterLonLat(tx: Long, ty: Long): (Double, Double) = {
    val n = 1 << zoom
    val lon = (tx + 0.5) / n * 360.0 - 180.0
    val latR = math.atan(math.sinh(math.Pi * (1 - 2.0 * (ty + 0.5) / n)))
    (lon, math.toDegrees(latR))
  }

  private def pts(cells: (Long, Long, Int)*) = {
    val rows = cells.flatMap { case (tx, ty, k) =>
      val (lon, lat) = tileCenterLonLat(tx, ty)
      Seq.fill(k)((lon, lat))
    }
    rows.toDF("lon", "lat")
  }

  test("adjacent dense tiles cluster; sparse tiles drop; singletons survive") {
    val out = Hotspots.cluster(
      pts((3, 3, 5), (4, 3, 5), (5, 4, 5), // L-shaped diagonal-touching run
        (10, 10, 5), // isolated dense tile
        (8, 2, 2)), // below minPts
      zoom, minPts = 3).collect()
    assert(out.length == 4)
    val byTile = out.map(r => (r.getAs[Long]("tile_x"), r.getAs[Long]("tile_y")) -> r).toMap
    assert(!byTile.contains((8L, 2L)))
    // the run is one cluster (diagonal adjacency counts)
    val runIds = Seq((3L, 3L), (4L, 3L), (5L, 4L))
      .map(t => byTile(t).getAs[Long]("cluster_id")).distinct
    assert(runIds.size == 1)
    assert(byTile((3L, 3L)).getAs[Long]("cluster_size") == 3)
    assert(byTile((3L, 3L)).getAs[Long]("cluster_points") == 15)
    // singleton labels itself
    val solo = byTile((10L, 10L))
    assert(solo.getAs[Long]("cluster_id") == 10L * (1 << zoom) + 10L)
    assert(solo.getAs[Long]("cluster_size") == 1)
  }

  test("clusters connect across the antimeridian (x wrap)") {
    val out = Hotspots.cluster(pts((0, 7, 4), (15, 7, 4)), zoom, minPts = 3)
      .collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("cluster_id")).distinct.length == 1)
  }

  test("clusterResumable matches cluster() and serves rounds from checkpoint") {
    val ck = java.nio.file.Files.createTempDirectory("graft-hs-ck").toString
    val p = pts((3, 3, 5), (4, 3, 5), (5, 4, 5), (10, 10, 5))
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("tile_x"), r.getAs[Long]("tile_y"),
        r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))
    val base = Hotspots.cluster(p, zoom, minPts = 3).collect().map(key).toSet
    val r1 = Hotspots.clusterResumable(spark, p, zoom, minPts = 3, ck, "hs|fp",
      rounds = 4).collect().map(key).toSet
    assert(r1 == base)
    // rerun: every label round must come back from checkpoint
    val r2 = Hotspots.clusterResumable(spark, p, zoom, minPts = 3, ck, "hs|fp",
      rounds = 4).collect().map(key).toSet
    assert(r2 == base)
    import org.apache.spark.sql.functions.col
    assert(graft.engine.Checkpoint.metrics(spark, ck)
      .filter(col("resumed") === true).count() > 0)
  }

  test("heatmap: integer binomial kernel sums, x wraps, y clamps drop") {
    // one point in tile (0, 0): corner of the grid — y-1 rows drop, x-1 wraps
    val n = 1 << zoom
    val out = Tiler.heatmap(pts((0, 0, 1)), zoom).collect()
      .map(r => (r.getAs[Long]("tile_x"), r.getAs[Long]("tile_y")) -> r.getAs[Long]("heat"))
      .toMap
    assert(out((0L, 0L)) == 4)
    assert(out((1L, 0L)) == 2)
    assert(out((0L, 1L)) == 2)
    assert(out((1L, 1L)) == 1)
    assert(out(((n - 1).toLong, 0L)) == 2) // wrapped x
    assert(out(((n - 1).toLong, 1L)) == 1)
    assert(out.size == 6) // the three y=-1 contributions dropped
    assert(out.values.sum == 4 + 2 + 2 + 2 + 1 + 1)
  }
}
