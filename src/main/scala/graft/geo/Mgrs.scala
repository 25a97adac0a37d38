package graft.geo

/**
 * MGRS (Military Grid Reference System) encoding from WGS84 lon/lat — the
 * OpenCage `MGRS` annotation slot (reference /root/reference/src/opencage.rs
 * annotations struct). Public algorithm throughout: UTM via the standard
 * Krüger series (the textbook/Wikipedia "Transverse Mercator" expansion,
 * 3rd-order in n — sub-0.1 mm within a zone) + the MIL-STD-2411 lettering.
 *
 * Every hyperbolic function is expanded through exp/ln identities IN A
 * FIXED OPERATION ORDER (sinh x = (e^x - 1/e^x)/2, atanh x =
 * ln((1+x)/(1-x))/2), and all series constants are exposed as literals, so
 * the DuckDB oracle replays the identical IEEE double sequence bit-for-bit
 * — same pattern as the sha256 "portable twin" oracles.
 *
 * Defined for lat in [-80, 84]; the polar UPS zones are out of MGRS's UTM
 * domain and return null (the annotation is partial there, like the
 * reference's). 1 m precision (5+5 digits), zero-padded zone.
 */
object Mgrs {

  val K0 = 0.9996
  private val F = 1.0 / 298.257223563
  /** third flattening n = f/(2-f) */
  val Nn: Double = F / (2.0 - F)
  /** rectifying-radius factor A = a/(1+n) (1 + n^2/4 + n^4/64) */
  val AA: Double = {
    val n2 = Nn * Nn
    6378137.0 / (1.0 + Nn) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0)
  }
  /** Krüger forward coefficients (3rd order in n). */
  val Al1: Double = Nn / 2.0 - 2.0 * Nn * Nn / 3.0 + 5.0 * Nn * Nn * Nn / 16.0
  val Al2: Double = 13.0 * Nn * Nn / 48.0 - 3.0 * Nn * Nn * Nn / 5.0
  val Al3: Double = 61.0 * Nn * Nn * Nn / 240.0
  /** conformal-latitude factor 2*sqrt(n)/(1+n) */
  val Cc: Double = 2.0 * math.sqrt(Nn) / (1.0 + Nn)
  val DegToRad: Double = math.Pi / 180.0

  private val BandLetters = "CDEFGHJKLMNPQRSTUVWX"
  private val ColLetters = "ABCDEFGHJKLMNPQRSTUVWXYZ"
  private val RowLetters = "ABCDEFGHJKLMNPQRSTUV"

  /** UTM zone with the Norway (32V) and Svalbard (31/33/35/37X) exceptions. */
  def utmZone(lon: Double, lat: Double): Int = {
    var z = (((lon + 180.0) / 6.0).toInt % 60) + 1
    if (lat >= 56.0 && lat < 64.0 && lon >= 3.0 && lon < 12.0) z = 32
    if (lat >= 72.0 && lat < 84.0) {
      if (lon >= 0.0 && lon < 9.0) z = 31
      else if (lon >= 9.0 && lon < 21.0) z = 33
      else if (lon >= 21.0 && lon < 33.0) z = 35
      else if (lon >= 33.0 && lon < 42.0) z = 37
    }
    z
  }

  /** UTM easting (meters, 500 km false easting) — fixed-order Krüger. */
  def utmE(lon: Double, lat: Double): Double = en(lon, lat)._1
  /** UTM northing (meters; +10^7 south of the equator). */
  def utmN(lon: Double, lat: Double): Double = en(lon, lat)._2

  private def coshx(x: Double): Double = { val e = math.exp(x); (e + 1.0 / e) / 2.0 }
  private def sinhx(x: Double): Double = { val e = math.exp(x); (e - 1.0 / e) / 2.0 }

  private def en(lon: Double, lat: Double): (Double, Double) = {
    val zone = utmZone(lon, lat)
    val lon0 = (zone - 1) * 6.0 - 180.0 + 3.0
    val phi = lat * DegToRad
    val lam = (lon - lon0) * DegToRad
    val sphi = math.sin(phi)
    val u = 0.5 * math.log((1.0 + sphi) / (1.0 - sphi)) -
      Cc * (0.5 * math.log((1.0 + Cc * sphi) / (1.0 - Cc * sphi)))
    val eu = math.exp(u)
    val t = (eu - 1.0 / eu) / 2.0
    val xip = math.atan(t / math.cos(lam))
    val w = math.sin(lam) / math.sqrt(1.0 + t * t)
    val etap = 0.5 * math.log((1.0 + w) / (1.0 - w))
    val xi = xip + Al1 * math.sin(2.0 * xip) * coshx(2.0 * etap) +
      Al2 * math.sin(4.0 * xip) * coshx(4.0 * etap) +
      Al3 * math.sin(6.0 * xip) * coshx(6.0 * etap)
    val eta = etap + Al1 * math.cos(2.0 * xip) * sinhx(2.0 * etap) +
      Al2 * math.cos(4.0 * xip) * sinhx(4.0 * etap) +
      Al3 * math.cos(6.0 * xip) * sinhx(6.0 * etap)
    val e = 500000.0 + K0 * AA * eta
    val n = K0 * AA * xi + (if (lat < 0.0) 10000000.0 else 0.0)
    (e, n)
  }

  /** MGRS string at 1 m precision, e.g. "17TPJ3008433438"; null outside the
    * UTM latitude domain [-80, 84]. */
  def mgrs(lon: Double, lat: Double): String = {
    if (lat < -80.0 || lat > 84.0 || lon < -180.0 || lon > 180.0 ||
        lat.isNaN || lon.isNaN) return null
    val zone = utmZone(lon, lat)
    val (e, n) = en(lon, lat)
    val band = BandLetters.charAt(math.min(((lat + 80.0) / 8.0).toInt, 19))
    val colIdx = (e / 100000.0).toInt // 1..8 within a zone
    val colL = ColLetters.charAt(((zone - 1) % 3) * 8 + colIdx - 1)
    val rowIdx = (((n / 100000.0).toLong % 20L).toInt +
      (if (zone % 2 == 0) 5 else 0)) % 20
    val rowL = RowLetters.charAt(rowIdx)
    val e5 = e.toLong % 100000L
    val n5 = n.toLong % 100000L
    f"$zone%02d$band$colL$rowL$e5%05d$n5%05d"
  }
}
