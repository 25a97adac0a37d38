package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Reverse
import graft.functions.GeoFunctions
import graft.geo.CellIndex
import graft.model.ReverseParams

/** Compact (mixed-level) covering index: cell-union normalization and the
  * multi-level-probe reverse path built on it. */
class CompactCoverSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // a wide rectangle (~0.6 x 0.5 deg) — hundreds of level-13 cells
  private val (lo1, la1, lo2, la2) = (2.0, 41.0, 2.6, 41.5)
  private lazy val cover13 = CellIndex.coverBbox(lo1, la1, lo2, la2, 13)
  private lazy val compacted = CellIndex.compact(cover13, minLevel = 7)

  test("compact shrinks an area cover substantially") {
    assert(cover13.length > 200, s"fixture too small: ${cover13.length}")
    assert(compacted.length < cover13.length / 3,
      s"${cover13.length} -> ${compacted.length}")
    // mixed levels actually present
    assert(compacted.map(CellIndex.level).distinct.length > 1)
  }

  test("compact preserves coverage exactly (ancestor-chain membership)") {
    val orig = cover13.toSet
    val comp = compacted.toSet
    def inCompact(c13: Long): Seq[Long] =
      (7 to 13).map(lv => CellIndex.parent(c13, lv)).filter(comp.contains)
    // every original cell is covered by EXACTLY ONE compact ancestor
    cover13.foreach { c =>
      assert(inCompact(c).size === 1, s"cell $c covered ${inCompact(c).size}x")
    }
    // points sampled around the rect: membership must agree with the
    // original single-level cover
    for (i <- 0 until 400) {
      val lon = lo1 - 0.2 + (graft.text.TextCore.mix(i * 7L + 1) % 1000 + 1000) % 1000 / 1000.0
      val lat = la1 - 0.2 + (graft.text.TextCore.mix(i * 13L + 5) % 900 + 900) % 900 / 1000.0
      val c13 = CellIndex.encode(lon, lat, 13)
      assert(inCompact(c13).nonEmpty === orig.contains(c13), s"($lon, $lat)")
    }
  }

  test("compact is canonical: no complete sibling group survives") {
    val set = compacted.toSet
    compacted.foreach { c =>
      val lv = CellIndex.level(c)
      if (lv > 7) {
        val p = CellIndex.parent(c, lv - 1)
        val siblings = for {
          di <- 0 to 1; dj <- 0 to 1
        } yield CellIndex.pack(CellIndex.face(p), lv,
          (CellIndex.rawI(p) << 1) + di, (CellIndex.rawJ(p) << 1) + dj)
        assert(!siblings.forall(set.contains), s"uncollapsed siblings under $p")
      }
    }
  }

  test("reverseCompact == reverse on rect polygons (and stays map-only)") {
    val nullS = (n: String) => lit(null).cast("string").as(n)
    val nullM = (n: String) => lit(null).cast("map<string,string>").as(n)
    val base = spark.range(0, 12).select(col("id").as("polygon_id"),
      ((col("id") * 7 % 10) / lit(10.0) + 2.0).as("c_lon"),
      (lit(41.0) + (col("id") * 11 % 10) / lit(10.0)).as("c_lat"),
      ((col("id") % 4) / lit(10.0) + 0.15).as("d_lon"),
      ((col("id") % 3) / lit(10.0) + 0.12).as("d_lat"),
      (lit(4) + col("id") % 6).cast("int").as("admin_level"))
    val polys = base.select(col("polygon_id"),
      concat(lit("R"), col("polygon_id")).as("name"),
      col("admin_level"), lit("xx").as("country_code"),
      array(lit(0), lit(4)).as("ring_offsets"),
      array(col("c_lon") - col("d_lon"), col("c_lon") + col("d_lon"),
        col("c_lon") + col("d_lon"), col("c_lon") - col("d_lon")).as("ring_lons"),
      array(col("c_lat") - col("d_lat"), col("c_lat") - col("d_lat"),
        col("c_lat") + col("d_lat"), col("c_lat") + col("d_lat")).as("ring_lats"),
      nullS("fmt_house"), nullS("fmt_road"), nullS("fmt_suburb"), nullS("fmt_city"),
      nullS("fmt_county"), nullS("fmt_state"), nullS("fmt_region"),
      nullS("fmt_postcode"), nullS("fmt_country"), nullM("loc_city"), nullM("loc_country"))
    val coverExpr = GeoFunctions.coverBbox(
      col("c_lon") - col("d_lon"), col("c_lat") - col("d_lat"),
      col("c_lon") + col("d_lon"), col("c_lat") + col("d_lat"),
      lit(CellIndex.FineLevel))
    val cellsFlat = base.select(col("polygon_id"), explode(coverExpr).as("cell"))
    val cellsCompact = base.select(col("polygon_id"),
      explode(GeoFunctions.compactCells(coverExpr, lit(7))).as("cell"))
    // compaction must shrink the materialized index
    assert(cellsCompact.count() < cellsFlat.count() / 2)

    val pts = spark.range(0, 500).select(col("id").as("query_id"),
      ((col("id") * 7919 % 1000) / lit(1000.0) + 1.9).as("lon"),
      (lit(40.9) + (col("id") * 104729 % 1200) / lit(1000.0)).as("lat"))
    val expect = Reverse.reverse(pts, polys, cellsFlat, ReverseParams())
      .select("query_id", "polygon_id", "geocode_status")
      .collect().map(_.toString).sorted.toSeq
    val gotDf = Reverse.reverseCompact(pts, polys, cellsCompact, ReverseParams())
    val got = gotDf.select("query_id", "polygon_id", "geocode_status")
      .collect().map(_.toString).sorted.toSeq
    assert(got === expect)
    assert(got.count(_.contains("ok")) > 0 || expect.exists(_.contains("ok")))
    // the points side stays map-only: one broadcast probe per present
    // level, never a shuffle of the points (the only hash exchange in the
    // plan is the broadcast-side packed-index groupBy, keyed by cell)
    val plan = gotDf.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
    assert(!plan.contains("Exchange hashpartitioning(query_id"), plan.take(3000))
    assert("BroadcastHashJoin".r.findAllMatchIn(plan).size >= 2, plan.take(3000))
  }
}
