package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PolyStats
import graft.geo.{Geo, Simplify}

/** Douglas-Peucker ring simplification: hand-computed keep sets, packed
  * multi-ring independence, and the map-only DataFrame rewrite. */
class SimplifySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("collinear midpoint drops, corners survive (hand-computed)") {
    // square with one collinear midpoint on the bottom edge
    val lons = Array(0.0, 0.5, 1.0, 1.0, 0.0)
    val lats = Array(0.0, 0.0, 0.0, 1.0, 1.0)
    val kept = Simplify.simplifyRing(lons, lats, 0, 5, epsDeg = 0.01)
    assert(kept.toSeq === Seq(0, 2, 3, 4))
  }

  test("spike keeps or drops exactly at the tolerance") {
    val lons = Array(0.0, 0.5, 1.0, 1.0, 0.0)
    val lats = Array(0.0, 0.015, 0.0, 1.0, 1.0)
    // spike height 0.015 above the bottom chord
    assert(Simplify.simplifyRing(lons, lats, 0, 5, 0.01).toSeq ===
      Seq(0, 1, 2, 3, 4))
    assert(Simplify.simplifyRing(lons, lats, 0, 5, 0.02).toSeq ===
      Seq(0, 2, 3, 4))
  }

  test("tiny rings (<= 3 vertices) are untouched") {
    val lons = Array(0.0, 1.0, 0.5)
    val lats = Array(0.0, 0.0, 1.0)
    assert(Simplify.simplifyRing(lons, lats, 0, 3, 10.0).toSeq === Seq(0, 1, 2))
  }

  test("packed rings simplify independently") {
    // ring 1: square + collinear midpoint (vertices 0-4)
    // ring 2: triangle hole (vertices 5-7); fence-post offsets [0, 5, 8]
    val offsets = Array(0, 5, 8)
    val lons = Array(0.0, 0.5, 1.0, 1.0, 0.0, 0.4, 0.6, 0.5)
    val lats = Array(0.0, 0.0, 0.0, 1.0, 1.0, 0.4, 0.4, 0.6)
    val kept = Simplify.simplifyPacked(offsets, lons, lats, 0.01)
    assert(kept.toSeq === Seq(0, 2, 3, 4, 5, 6, 7))
  }

  test("DataFrame simplify rewrites packed arrays and offsets, map-only") {
    val df = Seq((1L, Seq(0, 5, 8), Seq(0.0, 0.5, 1.0, 1.0, 0.0, 0.4, 0.6, 0.5),
        Seq(0.0, 0.0, 0.0, 1.0, 1.0, 0.4, 0.4, 0.6)))
      .toDF("polygon_id", "ring_offsets", "ring_lons", "ring_lats")
    val out = PolyStats.simplify(df, epsDeg = 0.01)
    val r = out.head()
    assert(r.getAs[Int]("n_vertices_in") === 8)
    assert(r.getAs[Int]("n_vertices_out") === 7)
    assert(r.getAs[Seq[Int]]("ring_offsets") === Seq(0, 4, 7))
    assert(r.getAs[Seq[Double]]("ring_lons") ===
      Seq(0.0, 1.0, 1.0, 0.0, 0.4, 0.6, 0.5))
    // the simplified polygon still classifies an interior point correctly
    val off = r.getAs[Seq[Int]]("ring_offsets").toArray
    val lons = r.getAs[Seq[Double]]("ring_lons").toArray
    val lats = r.getAs[Seq[Double]]("ring_lats").toArray
    assert(Geo.rayCast(0.1, 0.9, off, lons, lats))       // inside outer ring
    assert(!Geo.rayCast(0.5, 0.45, off, lons, lats))     // inside the hole
    assert(!Geo.rayCast(2.0, 2.0, off, lons, lats))      // outside
    // map-only plan: no exchange at all
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
