package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._
import graft.model.{Bounds, ForwardParams, ReverseParams}

/**
 * Golden-fixture parity: the reference's own mocked test inputs/outputs
 * (FIXTURES.md §3, reference file:line cited per case) re-run through the
 * Spark engine against the fixture world.
 */
class GeocodingParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val gaz = Gazetteer.gazetteerDF(spark).cache()
  lazy val idx = Gazetteer.nameIndex(gaz).cache()
  lazy val polys = Gazetteer.polygonsDF(spark).cache()
  lazy val polyCells = Gazetteer.polygonCellIndex(polys).cache()

  private def fwd(q: String, params: ForwardParams = ForwardParams()) =
    Forward.forward(Seq((1L, q)).toDF("query_id", "query"), idx, params)

  private def rev(lon: Double, lat: Double, params: ReverseParams = ReverseParams()) =
    Reverse.reverse(Seq((1L, lon, lat)).toDF("query_id", "lon", "lat"), polys,
      polyCells, params)

  // osm_forward / oc_forward — openstreetmap.rs:395-408,439-452; opencage.rs:761-780
  test("forward: Schwabing, München -> (11.5884858, 48.1700887)") {
    val r = fwd("Schwabing, München").orderBy($"result_rank").collect()
    assert(r.nonEmpty)
    assert(r.head.getAs[Double]("x") === 11.5884858)
    assert(r.head.getAs[Double]("y") === 48.1700887)
  }

  // osm_forward_full — openstreetmap.rs:410-437
  test("forward_full: UCL with viewbox + addressdetails") {
    val vb = Bounds(-0.13806939125061035, 51.51989264641164,
      -0.13427138328552246, 51.52319711775629)
    val r = fwd("UCL Centre for Advanced Spatial Analysis",
      ForwardParams(addressDetails = true, viewbox = Some(vb))).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("display_name").contains("Tottenham Court Road"))
    assert(r.head.getAs[org.apache.spark.sql.Row]("address").getAs[String]("city") === "London")
    assert(math.abs(r.head.getAs[Double]("x") - (-0.1361)) < 1e-9)
    assert(math.abs(r.head.getAs[Double]("y") - 51.5215) < 1e-9)
  }

  test("forward_full: viewbox excludes out-of-box matches") {
    val vb = Bounds(10.0, 40.0, 11.0, 41.0) // nowhere near London
    val r = fwd("UCL Centre for Advanced Spatial Analysis",
      ForwardParams(viewbox = Some(vb))).collect()
    assert(r.isEmpty)
  }

  // oc_forward_full_bbox — opencage.rs:803-905
  test("forward_full: UCL formatted contains UCL and 90 Tottenham Court Road") {
    val r = fwd("UCL Centre for Advanced Spatial Analysis",
      ForwardParams(annotations = true)).collect()
    assert(r.length === 1)
    val f = r.head.getAs[String]("formatted")
    assert(f.contains("UCL"))
    assert(f.contains("Tottenham Court Road") && f.contains("90"), f)
    val ann = r.head.getAs[org.apache.spark.sql.Row]("annotations")
    assert(ann.getAs[String]("geohash").nonEmpty)
  }

  // oc_forward_full_nobox — opencage.rs:907-920
  test("forward_full NOBOX: Moabit, Berlin, Germany") {
    val r = fwd("Moabit, Berlin, Germany").collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("formatted") === "Moabit, Berlin, Germany")
    assert(r.head.getAs[Double]("x") === 13.34)
    assert(r.head.getAs[Double]("y") === 52.53)
  }

  // ga_forward — geoadmin.rs:620-642
  test("forward: Seftigenstrasse 264, 3084 Wabern (WGS84, limit 1)") {
    val r = fwd("Seftigenstrasse 264, 3084 Wabern",
      ForwardParams(limit = Some(1), origins = Some(Seq("address")))).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("x") === 7.451352119445801)
    assert(r.head.getAs[Double]("y") === 46.92793655395508)
  }

  // ga_forward_lv95 — geoadmin.rs:517-536 (axis swap: easting first)
  test("forward sr=2056: LV95 easting-first within approximation tolerance") {
    val r = fwd("Seftigenstrasse 264, 3084 Wabern",
      ForwardParams(limit = Some(1), sr = "2056")).collect()
    assert(r.length === 1)
    // reference mock returns server-projected (2600968.75, 1197427.0); the
    // published approximate polynomial (geoadmin.rs:311-328) lands within ~2 m
    assert(math.abs(r.head.getAs[Double]("x") - 2600968.75) < 5.0)
    assert(math.abs(r.head.getAs[Double]("y") - 1197427.0) < 5.0)
  }

  // ga_forward_full — geoadmin.rs:563-618
  test("forward_full: Seftigenstrasse Bern label with origins=address + bbox") {
    val vb = Bounds(7.4513398, 46.92792859, 7.4513662, 46.9279467)
    val r = fwd("Seftigenstrasse Bern",
      ForwardParams(origins = Some(Seq("address")), viewbox = Some(vb))).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("label") === "Seftigenstrasse 264 <b>3084 Wabern</b>")
  }

  // osm_reverse — openstreetmap.rs:454-475
  test("reverse: (2.12870, 41.40139) display_name contains Barcelona chain") {
    val r = rev(2.12870, 41.40139).collect()
    assert(r.length === 1)
    val dn = r.head.getAs[String]("display_name")
    assert(dn.contains("Barcelona, Barcelonès, Barcelona, Catalunya"), dn)
  }

  // oc_reverse — opencage.rs:716-737
  test("reverse: formatted = Carrer de Calatrava, 64, 08017 Barcelona, Spain") {
    val r = rev(2.12870, 41.40139).collect()
    assert(r.head.getAs[String]("formatted") ===
      "Carrer de Calatrava, 64, 08017 Barcelona, Spain")
    assert(r.head.getAs[String]("geocode_status") === "ok")
  }

  // oc_reverse_lang_fr — opencage.rs:739-759,782-801
  test("reverse language=fr: Barcelone, Espagne") {
    val r = rev(2.12870, 41.40139, ReverseParams(language = Some("fr"))).collect()
    assert(r.head.getAs[String]("formatted") ===
      "Carrer de Calatrava, 64, 08017 Barcelone, Espagne")
  }

  // specificity: building polygon beats enclosing city polygon
  test("reverse picks most specific polygon (single result, opencage.rs:192)") {
    val r = rev(2.12870, 41.40139).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("name") === "Carrer de Calatrava 64")
  }

  // ga_reverse — geoadmin.rs:662-678
  test("reverse GeoAdmin: Seftigenstrasse 264, 3084 Wabern within 50 m") {
    val r = Reverse.reverseGeoAdmin(
      Seq((1L, 7.451352119445801, 46.92793655395508)).toDF("query_id", "lon", "lat"),
      gaz).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("formatted") === "Seftigenstrasse 264, 3084 Wabern")
  }

  // GeoAdmin reverse empty -> None (geoadmin.rs:295-304): no panic, null row
  test("reverse GeoAdmin: middle of the ocean -> no_result, not error") {
    val r = Reverse.reverseGeoAdmin(
      Seq((1L, -40.0, -40.0)).toDF("query_id", "lon", "lat"), gaz).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("geocode_status") === "no_result")
    assert(r.head.getAs[String]("formatted") === null)
  }

  test("reverse: point outside every polygon -> no_result row preserved") {
    val r = rev(-40.0, -40.0).collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("geocode_status") === "no_result")
  }

  // P3 countrycode filter — opencage.rs:59,67
  test("forward countrycode filter excludes other countries") {
    assert(fwd("Barcelona", ForwardParams(countrycode = Some("es"))).count() === 1)
    assert(fwd("Barcelona", ForwardParams(countrycode = Some("de"))).count() === 0)
  }

  // P4 language selector — opencage.rs:58 + altnames
  test("forward language=fr localizes formatted output") {
    val r = fwd("Barcelona", ForwardParams(language = Some("fr"))).collect()
    assert(r.head.getAs[String]("formatted").contains("Barcelone"))
  }

  // S1 — InputBounds wire format (lib.rs:168-182)
  test("bounds wire format matches the reference's Display impl") {
    val b = Bounds(-0.13806939125061035, 51.51989264641164,
      -0.13427138328552246, 51.52319711775629)
    assert(b.wire ===
      "-0.13806939125061035,51.51989264641164,-0.13427138328552246,51.52319711775629")
  }

  // E6 iterative expansion: kNN keeps widening rings until k found
  test("knnComplete finds k places even when ring 1 is empty") {
    // point ~15 km from the nearest fixture place: ring 1 at level 13
    // (~1.2 km cells) cannot reach it, iterative doubling must
    val q = Seq((1L, 2.32, 41.50)).toDF("query_id", "lon", "lat")
    assert(Knn.knn(q, gaz, k = 1, maxRing = 1).count() === 0)
    val r = Knn.knnComplete(q, gaz, k = 1, startRing = 1, maxRingCap = 16)
      .orderBy($"knn_rank").collect()
    assert(r.nonEmpty)
    assert(r.head.getAs[String]("name") === "Barcelona")
  }

  // E6 coverage guarantee: >=k candidates in ring r is NOT enough — a nearer
  // place can sit one ring further out when the query hugs a cell boundary.
  // knnComplete must match brute-force haversine top-k exactly, membership
  // AND order, over a dense random field (50 queries x 60 places).
  test("knnComplete equals brute-force top-k (ring-boundary correctness)") {
    def mix(i: Long) = { // splitmix-ish, deterministic
      var z = i * 0x9E3779B97F4A7C15L + 7L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      (z ^ (z >>> 27)) & 0xfffffffL
    }
    val places = (0 until 60).map { i =>
      graft.model.GazetteerRow(9000L + i, s"P$i", Seq(s"p$i"), Map.empty,
        2.10 + mix(i) % 10000 / 100000.0, 41.40 + mix(i + 999) % 10000 / 100000.0,
        "gazetteer", "es", null, null, null, null, null, null, null, 20, 0.5, 100)
    }
    val gazDf = Gazetteer.gazetteerDF(spark, places)
    val queries = (0 until 50).map { i =>
      (i.toLong, 2.10 + mix(i + 5555) % 10000 / 100000.0,
        41.40 + mix(i + 7777) % 10000 / 100000.0)
    }
    val q = queries.toDF("query_id", "lon", "lat")
    val got = Knn.knnComplete(q, gazDf, k = 3, startRing = 1, maxRingCap = 64)
      .orderBy($"query_id", $"knn_rank")
      .select($"query_id", $"place_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    queries.foreach { case (qid, qlon, qlat) =>
      val want = places.map(p => (graft.geo.Geo.haversineM(qlon, qlat, p.lon, p.lat),
        p.place_id)).sorted.take(3).map(_._2)
      assert(got(qid) === want, s"query $qid at ($qlon, $qlat)")
    }
  }

  // kNN (E6)
  test("kNN: nearest place to a point just off Calatrava 64 is Calatrava 64") {
    val q = Seq((1L, 2.1289, 41.4015)).toDF("query_id", "lon", "lat")
    val r = Knn.knn(q, gaz, k = 3).orderBy($"knn_rank").collect()
    assert(r.nonEmpty)
    assert(r.head.getAs[String]("name") === "Carrer de Calatrava 64")
    assert(r.head.getAs[Double]("dist_m") < 100)
    // ranks are contiguous and distances non-decreasing
    assert(r.map(_.getAs[Int]("knn_rank")).toSeq === (1 to r.length))
    val d = r.map(_.getAs[Double]("dist_m"))
    assert(d.zip(d.tail).forall { case (a, b) => a <= b })
  }

  // Tiler (E7): known anchor — (0,0) at z=1 -> tile (1,0)... z=12 check vs math
  test("tiler assigns web-mercator tiles and aggregates") {
    val hits = Seq(("u1", 11.5884858, 48.1700887), ("u2", 11.5884858, 48.1700887),
      ("u3", 2.12870, 41.40139)).toDF("url", "lon", "lat")
    val agg = Tiler.aggregate(hits, z = 12).collect()
    assert(agg.map(_.getAs[Long]("n_hits")).sum === 3)
    val munich = agg.find(_.getAs[Long]("n_hits") === 2).get
    // slippy math: x = floor((11.5884858+180)/360*4096) = 2179
    assert(munich.getAs[Long]("tile_x") === 2179L)
    assert(agg.length === 2)
  }

  test("tile pyramid: rollup levels agree with direct per-level assignment") {
    val hits = Seq(("u1", 11.5884858, 48.1700887), ("u2", 11.5884858, 48.1700887),
      ("u3", 2.12870, 41.40139), ("u4", -73.9857, 40.7484))
      .toDF("url", "lon", "lat")
    val pyr = Tiler.pyramid(hits, zMin = 3, zMax = 6).collect()
    // every zoom level present, each conserving the total hit count
    (3 to 6).foreach { z =>
      val lvl = pyr.filter(_.getAs[Int]("tile_z") === z)
      assert(lvl.map(_.getAs[Long]("n_hits")).sum === 4, s"z=$z")
      // rolled-up coordinates match direct assignment at that zoom
      val direct = Tiler.assign(hits, z)
        .groupBy("tile_x", "tile_y").count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val rolled = lvl
        .map(r => (r.getAs[Long]("tile_x"), r.getAs[Long]("tile_y")) ->
          r.getAs[Long]("n_hits")).toMap
      assert(rolled === direct, s"z=$z")
    }
  }

  test("tileBounds inverts tile assignment") {
    val tiles = Seq((12, 2179L, 1433L)).toDF("tile_z", "tile_x", "tile_y")
    val b = Tiler.tileBounds(tiles).collect()(0)
    assert(b.getAs[Double]("min_lon") <= 11.5884858 &&
      11.5884858 < b.getAs[Double]("max_lon"))
  }
}
