package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.ZOrder
import graft.geo.Geo

/** Morton codes, z-range bbox decomposition, and the locality layout:
  * the data-layout half of the tiler (SURVEY.md §2.7 E7). */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("morton interleave round-trips and is monotone in quadtree order") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val x = rnd.nextInt(1 << 20).toLong
      val y = rnd.nextInt(1 << 20).toLong
      val z = Geo.morton(x, y)
      assert(Geo.mortonX(z) == x && Geo.mortonY(z) == y, s"roundtrip ($x,$y)")
    }
    // known small-case table (the published 2-bit interleave)
    assert(Geo.morton(0, 0) == 0L)
    assert(Geo.morton(1, 0) == 1L)
    assert(Geo.morton(0, 1) == 2L)
    assert(Geo.morton(1, 1) == 3L)
    assert(Geo.morton(2, 0) == 4L)
    assert(Geo.morton(7, 7) == 63L)
  }

  test("bboxRanges is an exact, merged, disjoint cover of the bbox") {
    val zoom = 6 // 64x64 grid — exhaustively checkable
    val cases = Seq((3L, 5L, 17L, 12L), (0L, 0L, 63L, 63L), (10L, 10L, 10L, 10L),
      (0L, 31L, 63L, 32L), (31L, 0L, 32L, 63L))
    for ((x0, y0, x1, y1) <- cases) {
      val ranges = ZOrder.bboxRanges(x0, y0, x1, y1, zoom, maxRanges = 4096)
      // disjoint + sorted + merged
      ranges.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(h1 + 1 < l2, "adjacent ranges must be merged")
        case _ =>
      }
      // exact cover: total width == bbox area, and every bbox tile's z in a range
      val area = (x1 - x0 + 1) * (y1 - y0 + 1)
      assert(ranges.map { case (l, h) => h - l + 1 }.sum == area,
        s"exact cover for ($x0,$y0)-($x1,$y1)")
      for (x <- x0 to x1; y <- y0 to y1) {
        val z = Geo.morton(x, y)
        assert(ranges.exists { case (l, h) => z >= l && z <= h })
      }
    }
  }

  test("capped bboxRanges is a superset cover and scanBbox stays exact") {
    val zoom = 10
    val (x0, y0, x1, y1) = (101L, 203L, 517L, 411L)
    val capped = ZOrder.bboxRanges(x0, y0, x1, y1, zoom, maxRanges = 8)
    assert(capped.length <= 8)
    val exact = ZOrder.bboxRanges(x0, y0, x1, y1, zoom, maxRanges = 100000)
    // superset: every exact range is inside some capped range
    for ((l, h) <- exact)
      assert(capped.exists { case (cl, ch) => cl <= l && h <= ch })

    // scanBbox = plain bbox predicate on a point sample (pruning never
    // changes results, only the scanned row count)
    val pts = spark.range(0, 4000).select(
      ((col("id") * 131) % 360000 / 1000.0 - 180.0).as("lon"),
      ((col("id") * 137) % 160000 / 1000.0 - 80.0).as("lat"))
    val withZ = ZOrder.withZ(pts, col("lon"), col("lat"), zoom)
    val viaScan = ZOrder.scanBbox(withZ, x0, y0, x1, y1, zoom, maxRanges = 8)
      .select("tile_x", "tile_y").collect().toSet
    val direct = withZ.filter(col("tile_x").between(x0, x1) &&
        col("tile_y").between(y0, y1))
      .select("tile_x", "tile_y").collect().toSet
    assert(viaScan == direct && direct.nonEmpty)
  }

  test("scanBbox z-ranges reach the parquet scan as PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val pts = spark.range(0, 3000).select(
      ((col("id") * 131) % 360000 / 1000.0 - 180.0).as("lon"),
      ((col("id") * 137) % 160000 / 1000.0 - 80.0).as("lat"))
    ZOrder.layout(ZOrder.withZ(pts, col("lon"), col("lat"), 10), 4)
      .write.mode("overwrite").parquet(dir)
    val scan = ZOrder.scanBbox(spark.read.parquet(dir),
      101, 203, 517, 411, zoom = 10, maxRanges = 8)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("GreaterThanOrEqual(z,") || plan.contains("Or(")),
      s"z-range disjunction must reach the scan:\n$plan")
    // and it still returns the exact bbox rows
    val direct = ZOrder.withZ(pts, col("lon"), col("lat"), 10)
      .filter(col("tile_x").between(101, 517) && col("tile_y").between(203, 411))
      .count()
    assert(scan.count() == direct && direct > 0)
  }

  test("layout produces disjoint contiguous z-intervals per partition") {
    val pts = spark.range(0, 5000).select(
      ((col("id") * 131) % 360000 / 1000.0 - 180.0).as("lon"),
      ((col("id") * 137) % 160000 / 1000.0 - 80.0).as("lat"))
    val laid = ZOrder.layout(ZOrder.withZ(pts, col("lon"), col("lat"), 10), 8)
    val bounds = laid.select(spark_partition_id().as("p"), col("z"))
      .groupBy("p").agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo").collect()
    assert(bounds.length > 1)
    bounds.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        "partition z-ranges must not overlap")
      case _ =>
    }
  }
}
