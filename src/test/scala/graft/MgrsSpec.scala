package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Mgrs

/** MGRS / UTM encoding: known vectors, zone exceptions, and an independent
  * cross-check against the classic Snyder (USGS) series — a DIFFERENT
  * published formulation of the same projection. */
class MgrsSpec extends AnyFunSuite {

  test("CN Tower (Wikipedia UTM example): 17T 630084 4833438") {
    val (lon, lat) = (-79.387139, 43.642567)
    assert(Mgrs.utmZone(lon, lat) === 17)
    assert(math.abs(Mgrs.utmE(lon, lat) - 630084.0) < 1.0)
    assert(math.abs(Mgrs.utmN(lon, lat) - 4833438.0) < 1.0)
    assert(Mgrs.mgrs(lon, lat) === "17TPJ3008433438")
  }

  test("zone exceptions: Norway 32V, Svalbard 31/33/35/37X") {
    assert(Mgrs.utmZone(5.32, 60.39) === 32)  // Bergen: base 31 -> 32V
    assert(Mgrs.utmZone(5.32, 50.0) === 31)   // south of the V band: base rule
    assert(Mgrs.utmZone(8.0, 78.0) === 31)    // Svalbard bands
    assert(Mgrs.utmZone(15.0, 78.0) === 33)
    assert(Mgrs.utmZone(25.0, 78.0) === 35)
    assert(Mgrs.utmZone(35.0, 78.0) === 37)
    assert(Mgrs.mgrs(15.0, 78.0).startsWith("33X"))
  }

  test("southern hemisphere: band letter and false northing") {
    val s = Mgrs.mgrs(151.2093, -33.8688) // Sydney
    assert(s.startsWith("56H"))
    assert(Mgrs.utmN(151.2093, -33.8688) > 6000000.0) // 1e7 - ~3.75e6
  }

  test("domain: null outside lat [-80, 84]; defined at the edges") {
    assert(Mgrs.mgrs(0.0, 85.0) === null)
    assert(Mgrs.mgrs(0.0, -80.5) === null)
    assert(Mgrs.mgrs(0.0, -80.0) !== null)
    assert(Mgrs.mgrs(0.0, 84.0) !== null)
    assert(Mgrs.mgrs(0.0, -80.0).charAt(2) === 'C')
    assert(Mgrs.mgrs(0.0, 83.0).charAt(2) === 'X')
  }

  /** Snyder 1987 (USGS PP 1395) transverse-Mercator series — independent of
    * the Krüger formulation used by the engine; they agree to ~1 mm. */
  private def snyderEN(lon: Double, lat: Double): (Double, Double) = {
    val a = 6378137.0; val f = 1.0 / 298.257223563; val k0 = 0.9996
    val e2 = f * (2.0 - f); val ep2 = e2 / (1.0 - e2)
    val zone = Mgrs.utmZone(lon, lat)
    val lon0 = ((zone - 1) * 6.0 - 180.0 + 3.0).toRadians
    val phi = lat.toRadians; val lam = lon.toRadians
    val sp = math.sin(phi); val cp = math.cos(phi); val tp = math.tan(phi)
    val nRad = a / math.sqrt(1.0 - e2 * sp * sp)
    val t = tp * tp; val c = ep2 * cp * cp
    val bigA = cp * (lam - lon0)
    val e4 = e2 * e2; val e6 = e4 * e2
    val m = a * ((1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0) * phi -
      (3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0) * math.sin(2.0 * phi) +
      (15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0) * math.sin(4.0 * phi) -
      (35.0 * e6 / 3072.0) * math.sin(6.0 * phi))
    val east = k0 * nRad * (bigA + (1.0 - t + c) * math.pow(bigA, 3) / 6.0 +
      (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * ep2) * math.pow(bigA, 5) / 120.0) + 500000.0
    val north = k0 * (m + nRad * tp * (bigA * bigA / 2.0 +
      (5.0 - t + 9.0 * c + 4.0 * c * c) * math.pow(bigA, 4) / 24.0 +
      (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * ep2) * math.pow(bigA, 6) / 720.0)) +
      (if (lat < 0.0) 10000000.0 else 0.0)
    (east, north)
  }

  test("Krüger series agrees with the independent Snyder series to < 5 mm") {
    // deterministic global grid incl. band edges and both hemispheres
    for (i <- 0 until 400) {
      val lon = ((i * 7919) % 3600) / 10.0 - 180.0 + 0.05
      val lat = ((i * 104729) % 1630) / 10.0 - 79.5
      val (e1, n1) = (Mgrs.utmE(lon, lat), Mgrs.utmN(lon, lat))
      val (e2x, n2x) = snyderEN(lon, lat)
      assert(math.abs(e1 - e2x) < 0.005, s"easting @($lon,$lat): $e1 vs $e2x")
      assert(math.abs(n1 - n2x) < 0.005, s"northing @($lon,$lat): $n1 vs $n2x")
    }
  }
}
