package graft.geo

/**
 * From-scratch hierarchical geocell index (S2-style quadtree on cube faces).
 *
 * No H3/S2 jar exists in this environment, so the cell scheme is implemented
 * directly from the published S2 geometry model (quadratic cube-face
 * projection; see s2geometry.io docs): lon/lat -> unit-sphere XYZ -> one of 6
 * cube faces -> (u,v) in [-1,1]^2 -> quadratic (s,t) in [0,1]^2 -> integer
 * (i,j) grid at `level`. Level 13 cells are ~5-6 km^2 — the "H3 res-7 /
 * S2 level-13" class called for by the survey (SURVEY.md §7.4, north_star).
 *
 * Cell id layout (64-bit long, no Hilbert curve — ids are join keys, never
 * range-scanned):
 *
 *   [ 3 bits face | 5 bits level | 27 bits i | 27 bits j ]   (62 bits used)
 *
 * k-ring neighbours are face-local (i±r, j±r); offsets that fall off the face
 * are re-encoded by extending (s,t) beyond [0,1] — the quadratic st->uv
 * transform is monotone outside the unit square, so the extended direction
 * vector lands on the adjacent face and re-encoding recovers the true
 * neighbour. Rings remain approximate within ~1 cell of cube corners
 * (documented approximation per SURVEY.md §7.4).
 *
 * Pure Scala object with zero Spark dependencies: unit-testable without a
 * session, and its methods compile to static forwarders that Catalyst
 * whole-stage codegen can call directly (see graft.functions.GeoExpressions).
 */
object CellIndex {

  final val MaxLevel = 27
  /** Engine's fine resolution (~5-6 km^2 cells). */
  final val FineLevel = 13
  /** Engine's coarse resolution (for partition-level pruning). */
  final val CoarseLevel = 7

  private final val DegToRad = math.Pi / 180.0

  // ---- lon/lat -> face/(u,v) ----------------------------------------------

  /** Largest-absolute-axis cube face for direction (x,y,z): 0..5. */
  private def xyzToFace(x: Double, y: Double, z: Double): Int = {
    val ax = math.abs(x); val ay = math.abs(y); val az = math.abs(z)
    if (ax >= ay && ax >= az) { if (x >= 0) 0 else 3 }
    else if (ay >= az) { if (y >= 0) 1 else 4 }
    else { if (z >= 0) 2 else 5 }
  }

  /** (u,v) coordinates of direction (x,y,z) on `face`. */
  private def faceUv(face: Int, x: Double, y: Double, z: Double): (Double, Double) =
    face match {
      case 0 => (y / x, z / x)
      case 1 => (-x / y, z / y)
      case 2 => (-x / z, -y / z)
      case 3 => (z / x, y / x)
      case 4 => (z / y, -x / y)
      case _ => (-y / z, -x / z)
    }

  /** Direction vector for (face, u, v); not normalized (never needs to be). */
  private def faceUvToXyz(face: Int, u: Double, v: Double): (Double, Double, Double) =
    face match {
      case 0 => (1, u, v)
      case 1 => (-u, 1, v)
      case 2 => (-u, -v, 1)
      case 3 => (-1, -v, -u)
      case 4 => (v, -1, -u)
      case _ => (v, u, -1)
    }

  /** Quadratic projection, uv -> st (S2's area-equalizing transform). */
  private def uvToSt(u: Double): Double =
    if (u >= 0) 0.5 * math.sqrt(1.0 + 3.0 * u) else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)

  /** Inverse quadratic projection, st -> uv. Monotone for s outside [0,1] too
    * (used to re-encode off-face ring neighbours). */
  private def stToUv(s: Double): Double =
    if (s >= 0.5) (1.0 / 3.0) * (4.0 * s * s - 1.0)
    else (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))

  // ---- encode / decode -----------------------------------------------------

  /** Encode a WGS84 lon/lat (degrees) to a cell id at `level`. */
  def encode(lon: Double, lat: Double, level: Int): Long = {
    val lonR = lon * DegToRad
    val latR = lat * DegToRad
    val cosLat = math.cos(latR)
    val x = cosLat * math.cos(lonR)
    val y = cosLat * math.sin(lonR)
    val z = math.sin(latR)
    val face = xyzToFace(x, y, z)
    val (u, v) = faceUv(face, x, y, z)
    pack(face, level, stToIdx(uvToSt(u), level), stToIdx(uvToSt(v), level))
  }

  @inline private def stToIdx(s: Double, level: Int): Int = {
    val n = 1 << level
    val i = (s * n).toInt
    if (i < 0) 0 else if (i >= n) n - 1 else i
  }

  @inline def pack(face: Int, level: Int, i: Int, j: Int): Long =
    (face.toLong << 59) | (level.toLong << 54) | (i.toLong << 27) | j.toLong

  @inline def face(cell: Long): Int = ((cell >>> 59) & 0x7L).toInt
  @inline def level(cell: Long): Int = ((cell >>> 54) & 0x1fL).toInt
  @inline def rawI(cell: Long): Int = ((cell >>> 27) & 0x7ffffffL).toInt
  @inline def rawJ(cell: Long): Int = (cell & 0x7ffffffL).toInt

  /** Center of the cell as (lon, lat) degrees — lon-lat order everywhere,
    * matching the reference API invariant (/root/reference/src/lib.rs:12-16). */
  def centerLon(cell: Long): Double = center(cell)._1
  def centerLat(cell: Long): Double = center(cell)._2

  def center(cell: Long): (Double, Double) = {
    val f = face(cell); val lv = level(cell)
    val n = (1 << lv).toDouble
    val u = stToUv((rawI(cell) + 0.5) / n)
    val v = stToUv((rawJ(cell) + 0.5) / n)
    val (x, y, z) = faceUvToXyz(f, u, v)
    val lon = math.atan2(y, x) / DegToRad
    val lat = math.atan2(z, math.sqrt(x * x + y * y)) / DegToRad
    (lon, lat)
  }

  /**
   * Conservative LOWER bound on the ground length of one cell step at `level`,
   * in meters. Derivation: one (s,t) grid step is 2^-level; the quadratic
   * st->uv transform has |d(uv)/d(st)| >= 4/3 (minimum at s=0.5); and the
   * angular rate of the face projection |d(theta)/du| = sqrt(1+v^2) /
   * (1+u^2+v^2) >= sqrt(2)/3 > 1/3 over the face (minimum at the corners).
   * So one step subtends >= (4/3)*(1/3)*2^-level radians — ~346 m at level 13
   * versus the ~1.2 km typical edge, i.e. ~3.5x conservative, which is the
   * correct direction for a coverage guarantee.
   *
   * Guarantee used by kNN (E6): every point strictly outside kRing(cell, r)
   * of a query point inside `cell` is at ground distance > r *
   * minEdgeMeters(level) (the r full cells between them each span at least
   * one grid step). Near cube-face corners rings are approximate (see kRing);
   * the bound stays safe because re-encoded neighbours only ever ADD cells.
   */
  def minEdgeMeters(level: Int): Double =
    Geo.EarthRadiusM * (4.0 / 9.0) / (1L << level).toDouble

  /** Parent cell at a coarser level. */
  def parent(cell: Long, parentLevel: Int): Long = {
    val lv = level(cell)
    require(parentLevel <= lv, s"parent level $parentLevel > cell level $lv")
    val shift = lv - parentLevel
    pack(face(cell), parentLevel, rawI(cell) >>> shift, rawJ(cell) >>> shift)
  }

  /**
   * COMPACT a covering-cell set to mixed levels: bottom-up, every complete
   * 2x2 sibling group collapses into its parent, repeatedly, down to
   * `minLevel`. Coverage-equivalent by construction (only full sibling
   * groups collapse, so the union of covered area is exactly preserved) and
   * canonical (no full sibling group survives). This is what keeps the
   * covering index of a LARGE polygon (a country at level 13 would be
   * millions of cells) proportional to its boundary length instead of its
   * area — the standard S2/H3 "cell union normalization".
   *
   * Output sorted ascending for determinism. Input cells may be mixed-level
   * already; duplicates (and children made redundant by an input ancestor)
   * are NOT removed unless they collapse — pass a distinct single-level
   * cover (coverBbox) for canonical results.
   */
  def compact(cells: Array[Long], minLevel: Int = CoarseLevel): Array[Long] = {
    if (cells.isEmpty) return cells
    val set = new java.util.TreeSet[java.lang.Long]()
    cells.foreach(c => set.add(c))
    var lv = cells.map(level).max
    while (lv > minLevel) {
      val atLv = new java.util.ArrayList[java.lang.Long]()
      val it = set.iterator()
      while (it.hasNext) { val c = it.next(); if (level(c) == lv) atLv.add(c) }
      // group by parent; a parent with all four children present collapses
      val byParent = new java.util.HashMap[java.lang.Long, Integer]()
      val n = atLv.size()
      var i = 0
      while (i < n) {
        val p = java.lang.Long.valueOf(parent(atLv.get(i), lv - 1))
        byParent.merge(p, Integer.valueOf(1), (a, b) => Integer.valueOf(a + b))
        i += 1
      }
      i = 0
      while (i < n) {
        val c = atLv.get(i)
        val p = java.lang.Long.valueOf(parent(c, lv - 1))
        if (byParent.get(p) == 4) { set.remove(c); set.add(p) }
        i += 1
      }
      lv -= 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  // ---- neighbours / k-ring -------------------------------------------------

  /** Cell at face-local offset (di, dj), re-encoding across face edges. */
  def offsetCell(cell: Long, di: Int, dj: Int): Long = {
    val f = face(cell); val lv = level(cell)
    val n = 1 << lv
    val ni = rawI(cell) + di
    val nj = rawJ(cell) + dj
    if (ni >= 0 && ni < n && nj >= 0 && nj < n) pack(f, lv, ni, nj)
    else {
      // extend st beyond [0,1]; the direction lands on the adjacent face.
      val u = stToUv((ni + 0.5) / n.toDouble)
      val v = stToUv((nj + 0.5) / n.toDouble)
      val (x, y, z) = faceUvToXyz(f, u, v)
      val nf = xyzToFace(x, y, z)
      val (nu, nv) = faceUv(nf, x, y, z)
      pack(nf, lv, stToIdx(uvToSt(nu), lv), stToIdx(uvToSt(nv), lv))
    }
  }

  /** All cells within Chebyshev ring radius r (the (2r+1)^2 block), centre
    * included, deduplicated (face-edge re-encoding can collide). */
  def kRing(cell: Long, r: Int): Array[Long] = {
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var di = -r
    while (di <= r) {
      var dj = -r
      while (dj <= r) { out.add(offsetCell(cell, di, dj)); dj += 1 }
      di += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  /** Only the ring at exactly radius r (hollow). r=0 -> the cell itself. */
  def ring(cell: Long, r: Int): Array[Long] =
    if (r == 0) Array(cell)
    else {
      val out = new java.util.LinkedHashSet[java.lang.Long]()
      var d = -r
      while (d <= r) {
        out.add(offsetCell(cell, d, -r)); out.add(offsetCell(cell, d, r))
        out.add(offsetCell(cell, -r, d)); out.add(offsetCell(cell, r, d))
        d += 1
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator(); var k = 0
      while (it.hasNext) { arr(k) = it.next(); k += 1 }
      arr
    }

  /** Level-`level` cells covering bbox [minLon,minLat,maxLon,maxLat] by
    * sampling a grid finer than the cell size — exact for the small convex
    * polygons used here; scale path documented in engine/Gazetteer. */
  def coverBbox(minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
                level: Int): Array[Long] = {
    // Cell edge at level L spans ~90/2^L degrees of (s,t); sample at half that.
    val stepDeg = math.max(1e-6, 45.0 / (1 << level))
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var lat = minLat
    while (lat <= maxLat + stepDeg) {
      var lon = minLon
      val latC = math.min(lat, maxLat)
      while (lon <= maxLon + stepDeg) {
        out.add(encode(math.min(lon, maxLon), latC, level))
        lon += stepDeg
      }
      lat += stepDeg
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator(); var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }
}
