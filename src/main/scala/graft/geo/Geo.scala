package graft.geo

/**
 * Pure-Scala geodesy + spatial primitives. Zero Spark deps; every method is a
 * static forwarder callable from Catalyst whole-stage codegen
 * (graft.functions.GeoExpressions).
 *
 * Semantics replicated from the reference (georust/geocoding):
 *  - lon-lat argument/output order everywhere (/root/reference/src/lib.rs:12-16)
 *  - wgs84ToLv03 polynomial constants (/root/reference/src/geoadmin.rs:311-328,
 *    the published swisstopo CH1903 approximation)
 *  - web-mercator annotation x/y (/root/reference/src/opencage.rs:448-451)
 *  - DMS strings (/root/reference/src/opencage.rs:442-445)
 *  - geohash annotation (/root/reference/src/opencage.rs:474)
 */
object Geo {

  /** Mean Earth radius in meters (IUGG). */
  final val EarthRadiusM = 6371008.8
  private final val DegToRad = math.Pi / 180.0
  /** Web-mercator extent: pi * WGS84 equatorial radius. */
  private final val MercMax = 20037508.342789244

  // ---- distance -------------------------------------------------------------

  /** Great-circle distance in meters (haversine). */
  def haversineM(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val dLat = (lat2 - lat1) * DegToRad
    val dLon = (lon2 - lon1) * DegToRad
    val sLat = math.sin(dLat / 2)
    val sLon = math.sin(dLon / 2)
    val a = sLat * sLat +
      math.cos(lat1 * DegToRad) * math.cos(lat2 * DegToRad) * sLon * sLon
    2.0 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /**
   * Initial great-circle bearing (forward azimuth) from point 1 to point 2,
   * degrees in [0, 360). The classic
   * `atan2(sin dλ · cos φ2, cos φ1 · sin φ2 − sin φ1 · cos φ2 · cos dλ)`
   * chain, written as the exact operation sequence the DuckDB oracle
   * replays; the contract row rounds to micro-degrees so the comparison is
   * integral.
   */
  def bearingDeg(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val p1 = lat1 * DegToRad
    val p2 = lat2 * DegToRad
    val dl = (lon2 - lon1) * DegToRad
    val y = math.sin(dl) * math.cos(p2)
    val x = math.cos(p1) * math.sin(p2) -
      math.sin(p1) * math.cos(p2) * math.cos(dl)
    val deg = math.atan2(y, x) / DegToRad
    (deg % 360.0 + 360.0) % 360.0
  }

  /**
   * Signed cross-track distance in meters of point 3 from the great circle
   * through point 1 toward point 2 (negative = left of track):
   * `asin(sin(d13 / R) · sin(θ13 − θ12)) · R` with d13 the haversine
   * distance 1→3 and θ the [[bearingDeg]] azimuths — the standard spherical
   * navigation identity, one row-local expression chain.
   */
  def crossTrackM(lon1: Double, lat1: Double, lon2: Double, lat2: Double,
                  lon3: Double, lat3: Double): Double = {
    val d13 = haversineM(lon1, lat1, lon3, lat3) / EarthRadiusM
    val t13 = bearingDeg(lon1, lat1, lon3, lat3) * DegToRad
    val t12 = bearingDeg(lon1, lat1, lon2, lat2) * DegToRad
    math.asin(math.sin(d13) * math.sin(t13 - t12)) * EarthRadiusM
  }

  // ---- point-in-polygon on packed ring arrays --------------------------------

  /**
   * Even-odd ray casting over packed rings (north_star: "point-in-polygon by
   * ray-casting on packed ring arrays"). Ring r occupies point indices
   * [ringOffsets(r), ringOffsets(r+1)) of ringLons/ringLats; rings are closed
   * implicitly (last vertex connects to first). Holes work for free with the
   * even-odd rule. Half-open edge rule `(latI > y) != (latJ > y)` gives
   * epsilon-free determinism; points exactly on a horizontal edge count per
   * that rule (documented, SURVEY.md §7.4).
   */
  def rayCast(lon: Double, lat: Double, ringOffsets: Array[Int],
              ringLons: Array[Double], ringLats: Array[Double]): Boolean = {
    var inside = false
    var r = 0
    while (r < ringOffsets.length - 1) {
      val start = ringOffsets(r)
      val end = ringOffsets(r + 1)
      var i = start
      var j = end - 1
      while (i < end) {
        val yi = ringLats(i); val yj = ringLats(j)
        if ((yi > lat) != (yj > lat)) {
          val xCross = (ringLons(j) - ringLons(i)) * (lat - yi) / (yj - yi) + ringLons(i)
          if (lon < xCross) inside = !inside
        }
        j = i
        i += 1
      }
      r += 1
    }
    inside
  }

  // ---- web-mercator tiles (E7) -----------------------------------------------

  /** Slippy-map tile x at zoom z for lon degrees. */
  def tileX(lon: Double, z: Int): Long = {
    val n = 1L << z
    val t = ((lon + 180.0) / 360.0 * n).toLong
    if (t < 0) 0L else if (t >= n) n - 1 else t
  }

  /** Slippy-map tile y at zoom z for lat degrees (clamped to mercator domain). */
  def tileY(lat: Double, z: Int): Long = {
    val n = 1L << z
    val latC = math.max(-85.05112878, math.min(85.05112878, lat))
    val latR = latC * DegToRad
    val t = ((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n).toLong
    if (t < 0) 0L else if (t >= n) n - 1 else t
  }

  // ---- Morton / Z-order locality codes ----------------------------------------

  /** Bit-spread for Morton interleave: the low 31 bits of `v` moved to the
    * even bit positions of the result (magic-mask doubling, the standard
    * published construction). */
  private def mortonSpread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def mortonCompact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >>> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >>> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >>> 16)) & 0x00000000FFFFFFFFL
    x
  }

  /** Morton / Z-order interleave of two non-negative 31-bit tile coordinates:
    * x occupies the even bit positions, y the odd. Monotone in quadtree
    * depth-first order, so sorting a table by `morton(tileX, tileY)` gives the
    * locality-preserving file layout a bbox scan can prune by z-ranges (the
    * Z-ORDER clustering story at 100 TB — see engine.ZOrder). */
  def morton(x: Long, y: Long): Long =
    mortonSpread(x) | (mortonSpread(y) << 1)

  /** Inverse of [[morton]]: the x (even-bit) component. */
  def mortonX(z: Long): Long = mortonCompact(z)

  /** Inverse of [[morton]]: the y (odd-bit) component. */
  def mortonY(z: Long): Long = mortonCompact(z >>> 1)

  /** EPSG:3857 web-mercator meters (OpenCage `Mercator` annotation,
    * /root/reference/src/opencage.rs:448-451: x=236968.295 for lng 2.1287). */
  def mercatorX(lon: Double): Double = lon * MercMax / 180.0
  def mercatorY(lat: Double): Double = {
    val latC = math.max(-85.05112878, math.min(85.05112878, lat))
    math.log(math.tan((90.0 + latC) * math.Pi / 360.0)) / math.Pi * MercMax
  }

  // ---- CH1903 / LV03 (C3) ------------------------------------------------------

  /** Approximate WGS84 -> Swiss LV03 easting. Polynomial + constants are the
    * published swisstopo approximation used by the reference
    * (/root/reference/src/geoadmin.rs:311-328); reference returns LV95 minus
    * (2'000'000, 1'000'000). */
  def wgs84ToLv03E(lon: Double, lat: Double): Double = {
    val lambda = (lon * 3600.0 - 26782.5) / 10000.0
    val phi = (lat * 3600.0 - 169028.66) / 10000.0
    val x = 2600072.37 + 211455.93 * lambda -
      10938.51 * lambda * phi -
      0.36 * lambda * phi * phi -
      44.54 * lambda * lambda * lambda
    x - 2000000.0
  }

  def wgs84ToLv03N(lon: Double, lat: Double): Double = {
    val lambda = (lon * 3600.0 - 26782.5) / 10000.0
    val phi = (lat * 3600.0 - 169028.66) / 10000.0
    val y = 1200147.07 + 308807.95 * phi + 3745.25 * lambda * lambda +
      76.63 * phi * phi -
      194.56 * lambda * lambda * phi +
      119.79 * phi * phi * phi
    y - 1000000.0
  }

  // ---- annotations (E8) ---------------------------------------------------------

  private final val GeohashBase32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash of (lon, lat) at `precision` characters
    * (OpenCage annotation, /root/reference/src/opencage.rs:474). */
  def geohash(lon: Double, lat: Double, precision: Int): String = {
    var minLon = -180.0; var maxLon = 180.0
    var minLat = -90.0; var maxLat = 90.0
    val sb = new java.lang.StringBuilder(precision)
    var bit = 0; var ch = 0; var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (minLon + maxLon) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; minLon = mid } else { ch = ch << 1; maxLon = mid }
      } else {
        val mid = (minLat + maxLat) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; minLat = mid } else { ch = ch << 1; maxLat = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(GeohashBase32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** DMS string like "41° 24' 5.06412'' N"
    * (/root/reference/src/opencage.rs:442-445). */
  def dms(value: Double, isLat: Boolean): String = {
    val hemi =
      if (isLat) { if (value >= 0) "N" else "S" }
      else { if (value >= 0) "E" else "W" }
    val a = math.abs(value)
    val d = a.toInt
    val mFull = (a - d) * 60.0
    val m = mFull.toInt
    val s = (mFull - m) * 60.0
    // trim trailing zeros like Rust float Display; 5 decimals of arc-second
    val sStr = BigDecimal(s).setScale(5, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString
    s"$d° $m' $sStr'' $hemi"
  }

  // ---- sun rise/set (OpenCage Sun annotation, opencage.rs:592-598) -------------

  private final val SunZenithCos = math.cos(90.833 * DegToRad) // official zenith

  /**
   * Apparent sunrise/sunset as epoch seconds for the UTC day containing
   * `epochDay` (days since 1970-01-01), via the "Almanac for Computers"
   * algorithm (the standard offline approximation, ±2-3 min). Returns null
   * (boxed) for polar day/night — the reference's Sun annotation carries 0
   * there; callers map null as they need. Deterministic: date comes from the
   * row (warc_ts), never the wall clock.
   */
  def sunEventEpoch(lon: Double, lat: Double, epochDay: Long, rise: Boolean): java.lang.Long = {
    val dayOfYear = java.time.LocalDate.ofEpochDay(epochDay).getDayOfYear
    val lngHour = lon / 15.0
    val t = dayOfYear + (((if (rise) 6.0 else 18.0) - lngHour) / 24.0)
    val m = 0.9856 * t - 3.289
    var l = m + 1.916 * math.sin(m * DegToRad) + 0.020 * math.sin(2.0 * m * DegToRad) + 282.634
    l = ((l % 360.0) + 360.0) % 360.0
    var ra = math.atan(0.91764 * math.tan(l * DegToRad)) / DegToRad
    ra = ((ra % 360.0) + 360.0) % 360.0
    // RA into the same quadrant as L
    ra += (math.floor(l / 90.0) * 90.0) - (math.floor(ra / 90.0) * 90.0)
    ra /= 15.0
    val sinDec = 0.39782 * math.sin(l * DegToRad)
    val cosDec = math.cos(math.asin(sinDec))
    val cosH = (SunZenithCos - sinDec * math.sin(lat * DegToRad)) /
      (cosDec * math.cos(lat * DegToRad))
    if (cosH > 1.0 || cosH < -1.0) return null // polar night / polar day
    val hDeg = if (rise) 360.0 - math.acos(cosH) / DegToRad else math.acos(cosH) / DegToRad
    val h = hDeg / 15.0
    val tLocal = h + ra - 0.06571 * t - 6.622
    var ut = tLocal - lngHour
    ut = ((ut % 24.0) + 24.0) % 24.0
    java.lang.Long.valueOf(epochDay * 86400L + math.round(ut * 3600.0))
  }

  // ---- text hashing (byte-identity invariant, input_hint) ----------------------

  private val sha256Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue() = java.security.MessageDigest.getInstance("SHA-256")
  }

  /** SHA-256 hex of the UTF-8 bytes of `s` — carried from source to output to
    * prove byte-identical extracted text per url. Digest instance is
    * thread-local (getInstance per row costs more than the hash itself). */
  private final val HexChars = "0123456789abcdef".toCharArray

  def sha256Hex(s: String): String =
    sha256HexBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def sha256HexBytes(bytes: Array[Byte]): String =
    sha256HexBytes(bytes, 0, bytes.length)

  /** Offset variant — digests a slice without copying it. */
  def sha256HexBytes(bytes: Array[Byte], off: Int, len: Int): String = {
    val md = sha256Local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val out = new Array[Char](64)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
