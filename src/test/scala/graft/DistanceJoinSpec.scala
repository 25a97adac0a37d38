package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.DistanceJoin
import graft.geo.{CellIndex, Geo}

/** Within-distance spatial join: coverage-guaranteed exactness vs brute
  * force, auto level selection, and the zero-exchange plan shape. */
class DistanceJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-random coords (no Math.random in tests)
  private def coord(seed: Long, lo: Double, span: Double): Double =
    lo + (graft.text.TextCore.mix(seed) % 100000L + 100000L) % 100000L / 100000.0 * span

  private val pts = (0 until 60).map { i =>
    (i.toLong, coord(i * 31L + 7, 2.0, 1.0), coord(i * 57L + 3, 41.0, 0.8))
  }
  private val plc = (0 until 400).map { j =>
    (j.toLong, s"P$j", coord(j * 13L + 11, 2.0, 1.0), coord(j * 89L + 5, 41.0, 0.8))
  }

  private def brute(radiusM: Double): Set[(Long, Long)] =
    (for {
      (q, qlon, qlat) <- pts
      (p, _, plon, plat) <- plc
      if Geo.haversineM(qlon, qlat, plon, plat) <= radiusM
    } yield (q, p)).toSet

  private def viaJoin(radiusM: Double, level: Int = -1): Set[(Long, Long)] = {
    val points = pts.toDF("query_id", "lon", "lat")
    val places = plc.toDF("place_id", "name", "lon", "lat")
    DistanceJoin.withinRadius(points, places, radiusM, level)
      .select("query_id", "place_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("withinRadius == brute force at a fine-level radius (800 m)") {
    val r = 800.0
    val expect = brute(r)
    assert(expect.nonEmpty, "fixture should produce matches")
    assert(viaJoin(r) === expect)
  }

  test("withinRadius == brute force at a coarse-level radius (20 km)") {
    val r = 20000.0
    val expect = brute(r)
    assert(expect.size > 100, s"fixture should be dense, got ${expect.size}")
    assert(viaJoin(r) === expect)
  }

  test("explicit finer level agrees with auto level (coverage, not tuning)") {
    val r = 5000.0
    assert(viaJoin(r, level = CellIndex.FineLevel) === viaJoin(r))
  }

  test("coverLevel picks the finest level within the ring budget") {
    val lv = DistanceJoin.coverLevel(5000.0, maxRing = 4)
    // chosen level covers in <= 4 rings...
    assert(DistanceJoin.coverRing(5000.0, lv) <= 4)
    // ...and one level finer would not
    assert(DistanceJoin.coverRing(5000.0, lv + 1) > 4)
  }

  test("bucketed layout: zero-exchange SMJ equals the broadcast variant") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dj-bucketed").toString
    val points = pts.toDF("query_id", "lon", "lat")
    val places = plc.toDF("place_id", "name", "lon", "lat")
    val r = 5000.0
    graft.engine.DistanceJoin.writeBucketed(spark, points, places, r,
      "graft_dj_pts_test", "graft_dj_plc_test", dir, buckets = 4)
    val df = graft.engine.DistanceJoin.withinRadiusBucketed(spark,
      "graft_dj_pts_test", "graft_dj_plc_test", r)
    val got = df.select("query_id", "place_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === viaJoin(r))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // the bucketed layout IS the shuffle: the join key never exchanges
    assert(!plan.contains("Exchange hashpartitioning(cand_cell"), plan.take(3000))
    assert(plan.contains("Bucketed: true"), plan.take(3000))
  }

  test("plan: broadcast hash join, zero exchanges on the points side") {
    val points = pts.toDF("query_id", "lon", "lat")
    val places = plc.toDF("place_id", "name", "lon", "lat")
    val df = DistanceJoin.withinRadius(points, places, 2000.0)
    df.count() // force AQE finalization
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the probe side is map-only: the only exchange permitted is the
    // broadcast of the places side
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
