package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{CellIndex, Geo}
import graft.text.TextCore

/** Property-based tests (SURVEY.md §5.3) — pure Scala core, no session.
  * Uses scalacheck Gens sampled under deterministic seeds (the
  * scalatestplus bridge isn't in the offline artifact cache). */
class GeoPropertySpec extends AnyFunSuite {

  private val N = 200

  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    (0 until N).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"gen failed at $i")))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb)) { case (a, b) => f(a, b) }

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])
                             (f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc)) { case (a, b, c) => f(a, b, c) }

  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])
                                (f: (A, B, C, D) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc, gd)) { case (a, b, c, d) => f(a, b, c, d) }

  // web-mercator domain, away from cube-face seams (FIXTURES.md §5)
  private val lonGen = Gen.choose(-179.9, 179.9)
  private val latGen = Gen.choose(-84.9, 84.9)

  test("cell encode/center round-trip: center lands in the same cell") {
    forAll(lonGen, latGen) { (lon, lat) =>
      val c = CellIndex.encode(lon, lat, 13)
      val (clon, clat) = CellIndex.center(c)
      assert(CellIndex.encode(clon, clat, 13) === c)
    }
  }

  test("cell id is stable under sub-cell jitter near the center") {
    forAll(lonGen, latGen) { (lon, lat) =>
      val c = CellIndex.encode(lon, lat, 13)
      val (clon, clat) = CellIndex.center(c)
      // jitter well below the ~0.01 deg cell size around the center
      assert(CellIndex.encode(clon + 1e-4, clat + 1e-4, 13) === c)
    }
  }

  test("parent cell contains the child center") {
    forAll(lonGen, latGen) { (lon, lat) =>
      val c13 = CellIndex.encode(lon, lat, 13)
      val c7 = CellIndex.parent(c13, 7)
      assert(CellIndex.encode(lon, lat, 7) === c7)
    }
  }

  test("kRing(r) grows with r, contains center, ring cells are adjacent") {
    forAll(lonGen, latGen, Gen.choose(1, 3)) { (lon, lat, r) =>
      val c = CellIndex.encode(lon, lat, 13)
      val ring = CellIndex.kRing(c, r)
      assert(ring.contains(c))
      assert(ring.length >= (2 * r + 1) * (2 * r + 1) - 2 * r) // face-edge dedup slack
      assert(ring.length <= (2 * r + 1) * (2 * r + 1))
    }
  }

  test("PIP: centroid of a convex ring is inside, antipode is outside") {
    val polyGen = for {
      clon <- Gen.choose(-170.0, 170.0)
      clat <- Gen.choose(-70.0, 70.0)
      n <- Gen.choose(5, 12)
      radius <- Gen.choose(0.01, 0.5)
    } yield (clon, clat, n, radius)
    forAll(polyGen) { case (clon, clat, n, radius) =>
      val angles = (0 until n).map(i => 2 * math.Pi * i / n)
      val lons = angles.map(a => clon + radius * math.cos(a)).toArray
      val lats = angles.map(a => clat + radius * math.sin(a)).toArray
      val off = Array(0, n)
      assert(Geo.rayCast(clon, clat, off, lons, lats))
      assert(!Geo.rayCast(clon + 2 * radius, clat, off, lons, lats))
    }
  }

  test("haversine: symmetric, non-negative, zero iff same point, triangle-ish") {
    forAll(lonGen, latGen, lonGen, latGen) { (lo1, la1, lo2, la2) =>
      val d12 = Geo.haversineM(lo1, la1, lo2, la2)
      val d21 = Geo.haversineM(lo2, la2, lo1, la1)
      assert(math.abs(d12 - d21) < 1e-6)
      assert(d12 >= 0)
      assert(Geo.haversineM(lo1, la1, lo1, la1) === 0.0)
      assert(d12 <= math.Pi * Geo.EarthRadiusM + 1)
    }
  }

  test("tile round-trip: every point maps into its tile's bounds") {
    forAll(lonGen, latGen, Gen.choose(1, 16)) { (lon, lat, z) =>
      val tx = Geo.tileX(lon, z)
      val n = 1L << z
      val minLon = tx.toDouble / n * 360.0 - 180.0
      val maxLon = (tx + 1).toDouble / n * 360.0 - 180.0
      assert(lon >= minLon - 1e-9 && lon <= maxLon + 1e-9)
      val ty = Geo.tileY(lat, z)
      assert(ty >= 0 && ty < n)
    }
  }

  test("geohash prefix property: longer hashes refine, same prefix") {
    forAll(lonGen, latGen) { (lon, lat) =>
      val g9 = Geo.geohash(lon, lat, 9)
      val g5 = Geo.geohash(lon, lat, 5)
      assert(g9.startsWith(g5))
    }
  }

  test("geohash known vectors (the published reference encodings)") {
    // the canonical geohash.org example: 57.64911 N, 10.40744 E
    assert(Geo.geohash(10.40744, 57.64911, 11) === "u4pruydqqvj")
    // the original Wikipedia worked example: ezs42 <- 42.605 N, 5.603 W
    assert(Geo.geohash(-5.603, 42.605, 5) === "ezs42")
    // hemisphere corners land in the expected base32 quadrant chars
    assert(Geo.geohash(-180.0, -90.0, 1) === "0")
    assert(Geo.geohash(179.999, 89.999, 1) === "z")
  }

  test("normalization: case/diacritic perturbations still match") {
    import graft.etl.Norm
    forAll(Gen.oneOf("Schwabing, München", "Carrer de Calatrava 64, Barcelona",
      "SEFTIGENSTRASSE 264", "ucl centre FOR advanced Spatial analysis")) { s =>
      assert(Norm.normalize(s) === Norm.normalize(s.toUpperCase(java.util.Locale.ROOT)) ||
        // uppercase of sharp-s etc. can change letters; lowercase must agree
        Norm.normalize(s) === Norm.normalize(s.toLowerCase(java.util.Locale.ROOT)))
    }
  }

  test("minhash signature overlap estimates Jaccard within tolerance") {
    forAll(Gen.choose(0, 1000)) { seed =>
      val words = (0 until 40).map(i => s"w${TextCore.mix(seed * 100 + i) % 50}")
      val a = words.mkString(" ")
      val b = (words.take(30) ++ words.take(10).map(_ + "x")).mkString(" ")
      val exact = TextCore.jaccard(a, b, 3)
      val est = TextCore.sigOverlap(TextCore.minhash(a, 3, 128), TextCore.minhash(b, 3, 128))
      assert(math.abs(exact - est) < 0.25, s"exact=$exact est=$est")
    }
  }

  test("simhash: hamming distance grows with edit size") {
    forAll(Gen.choose(0, 500)) { seed =>
      val words = (0 until 60).map(i => s"tok${TextCore.mix(seed + i) % 500}")
      val orig = words.mkString(" ")
      val tiny = (words.dropRight(1) :+ "new").mkString(" ")
      assert(TextCore.hamming(TextCore.simhash(orig), TextCore.simhash(tiny)) <= 16)
    }
  }
}
