package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PolyStats

/** Shoelace area / centroid / bbox over the packed-ring polygon layout. */
class PolyStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def statsOf(offsets: Seq[Int], lons: Seq[Double], lats: Seq[Double]) =
    PolyStats.stats(Seq((1L, offsets, lons, lats))
        .toDF("polygon_id", "ring_offsets", "ring_lons", "ring_lats"))
      .collect()(0)

  test("unit square: area 1, centroid (0.5, 0.5), bbox exact") {
    val r = statsOf(Seq(0), Seq(0.0, 1.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0, 1.0))
    assert(r.getAs[Int]("n_rings") === 1 && r.getAs[Int]("n_vertices") === 4)
    assert(r.getAs[Double]("area_deg2") === 1.0)
    assert(r.getAs[Double]("centroid_lon") === 0.5)
    assert(r.getAs[Double]("centroid_lat") === 0.5)
    assert(r.getAs[Double]("min_lon") === 0.0 && r.getAs[Double]("max_lat") === 1.0)
  }

  test("clockwise winding flips the sign; centroid unchanged") {
    val r = statsOf(Seq(0), Seq(0.0, 0.0, 1.0, 1.0), Seq(0.0, 1.0, 1.0, 0.0))
    assert(r.getAs[Double]("area_deg2") === -1.0)
    assert(r.getAs[Double]("centroid_lon") === 0.5)
  }

  test("hole with opposite winding subtracts from the signed area") {
    // outer 4x4 CCW square + inner 1x1 CW hole (vertices 4..7)
    val r = statsOf(Seq(0, 4),
      Seq(0.0, 4.0, 4.0, 0.0, 1.0, 1.0, 2.0, 2.0),
      Seq(0.0, 0.0, 4.0, 4.0, 1.0, 2.0, 2.0, 1.0))
    assert(r.getAs[Int]("n_rings") === 2 && r.getAs[Int]("n_vertices") === 8)
    assert(r.getAs[Double]("area_deg2") === 15.0)
  }

  test("triangle centroid matches the vertex mean") {
    val r = statsOf(Seq(0), Seq(0.0, 3.0, 0.0), Seq(0.0, 0.0, 3.0))
    assert(r.getAs[Double]("area_deg2") === 4.5)
    assert(r.getAs[Double]("centroid_lon") === 1.0)
    assert(r.getAs[Double]("centroid_lat") === 1.0)
  }

  test("degenerate polygons: empty -> area 0 + null centroid") {
    val r = statsOf(Seq.empty, Seq.empty, Seq.empty)
    assert(r.getAs[Double]("area_deg2") === 0.0)
    assert(r.isNullAt(r.fieldIndex("centroid_lon")))
    // a zero-area sliver also yields a null centroid rather than NaN/Inf
    val s = statsOf(Seq(0), Seq(0.0, 1.0, 2.0), Seq(0.0, 1.0, 2.0))
    assert(s.getAs[Double]("area_deg2") === 0.0)
    assert(s.isNullAt(s.fieldIndex("centroid_lat")))
  }

  test("geodesic perimeter: haversine fold over the successor pairs exactly") {
    import graft.geo.Geo
    val lons = Seq(2.0, 2.1, 2.1, 2.0)
    val lats = Seq(41.0, 41.0, 41.1, 41.1)
    val r = PolyStats.perimeter(Seq((1L, Seq(0, 4), lons, lats))
        .toDF("polygon_id", "ring_offsets", "ring_lons", "ring_lats"))
      .collect()(0)
    // replicate the exact left fold: ((0 + h01) + h12) + h23) + h30
    val edges = Seq((0, 1), (1, 2), (2, 3), (3, 0))
    val expect = edges.foldLeft(0.0) { case (acc, (a, b)) =>
      acc + Geo.haversineM(lons(a), lats(a), lons(b), lats(b))
    }
    assert(r.getAs[Int]("n_vertices") === 4)
    assert(r.getAs[Double]("perimeter_m") === expect)
  }

  test("stats is map-only (no Exchange in the plan)") {
    val df = Seq((1L, Seq(0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0)))
      .toDF("polygon_id", "ring_offsets", "ring_lons", "ring_lats")
    val plan = PolyStats.stats(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
