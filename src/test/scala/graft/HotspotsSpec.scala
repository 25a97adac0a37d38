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

  private def runContours(cells: Seq[(Long, Long)], threshold: Long = 1) = {
    val grid = cells.map { case (x, y) => (x, y, 5L) }
      .toDF("tile_x", "tile_y", "heat")
    Tiler.contours(grid, threshold).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        (r.getLong(4), r.getLong(5)), (r.getLong(6), r.getLong(7))))
  }

  test("contours: an isolated dense cell vectorizes to a closed diamond") {
    val segs = runContours(Seq((5L, 7L)))
    // 4 blocks, one segment each; endpoints form the closed 4-cycle around
    // the sample point (10, 14) in half-units
    assert(segs.length === 4)
    val undirected = segs.map { case (_, _, _, _, a, b) => Set(a, b) }.toSet
    assert(undirected === Set(
      Set((10L, 15L), (11L, 14L)), Set((9L, 14L), (10L, 15L)),
      Set((10L, 13L), (9L, 14L)), Set((11L, 14L), (10L, 13L))))
  }

  test("contours: interior case-15 blocks are dropped (boundary not area)") {
    val segs = runContours(Seq((2L, 2L), (3L, 2L), (2L, 3L), (3L, 3L)))
    // center block (2,2) is all-inside -> no segments from it
    assert(!segs.exists { case (bx, by, _, _, _, _) => bx == 2 && by == 2 })
    assert(segs.forall { case (_, _, c, _, _, _) => c > 0 && c < 15 })
    // outline of a 2x2 point square: 8 boundary blocks, one segment each
    assert(segs.length === 8)
  }

  test("contours: diagonal saddle emits the fixed two-segment pair") {
    val segs = runContours(Seq((0L, 0L), (1L, 1L)))
    val saddle = segs.filter { case (bx, by, c, _, _, _) =>
      bx == 0 && by == 0 && c == 5 }
    assert(saddle.map(_._4).sorted.toSeq === Seq(0, 1))
    // block (0,0): L-T then R-B in half-units
    val byIdx = saddle.map(s => s._4 -> ((s._5, s._6))).toMap
    assert(byIdx(0) === (((0L, 1L), (1L, 0L))))
    assert(byIdx(1) === (((2L, 1L), (1L, 2L))))
  }

  test("contours: threshold is inclusive and sub-threshold cells vanish") {
    val grid = Seq((4L, 4L, 7L), (9L, 9L, 6L)).toDF("tile_x", "tile_y", "heat")
    val segs = Tiler.contours(grid, threshold = 7).collect()
    assert(segs.length === 4) // only the heat=7 cell survives
    assert(segs.forall(r => math.abs(r.getLong(0) - 4) <= 1))
  }
}
