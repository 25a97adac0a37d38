package graft.geo

/**
 * Ramer-Douglas-Peucker polygon-ring simplification (pure Scala core; the
 * map-only vector op a tile renderer runs before drawing admin polygons at
 * coarse zooms — SURVEY.md E7's raster<->vector tiler is the consumer).
 *
 * Closed-ring handling: rings are stored WITHOUT a repeated closing vertex
 * (the packed-ring layout PIP scans); DP needs two anchors on a closed
 * ring, so the second anchor is the vertex FARTHEST from vertex 0 (tie ->
 * lowest index) and the ring splits into the two polylines (0..k) and
 * (k..n), where index n denotes the wrap back to vertex 0.
 *
 * Determinism contract (what makes the DuckDB oracle replay possible):
 * every floating-point comparison uses the exact same operation order as
 * the SQL replay — point distance `sqrt((xi-x0)*(xi-x0) + (yi-y0)*(yi-y0))`,
 * perpendicular distance `abs(dx*(y1-y0) - (x1-x0)*dy) / sqrt(dx*dx+dy*dy)`
 * — ties break to the LOWEST vertex index (strict `>` while scanning
 * ascending), and the kept set is independent of traversal order (the
 * recursion tree is data-determined), so an engine recursing breadth-first
 * agrees with this depth-first stack bit-for-bit.
 */
object Simplify {

  /** Perpendicular distance of (x0,y0) from segment (x1,y1)-(x2,y2);
    * degenerate segment falls back to point distance. Planar degree units —
    * same contract as PolyStats. */
  def perpDist(x0: Double, y0: Double, x1: Double, y1: Double,
               x2: Double, y2: Double): Double = {
    val dx = x2 - x1
    val dy = y2 - y1
    val den = math.sqrt(dx * dx + dy * dy)
    if (den == 0.0) math.sqrt((x0 - x1) * (x0 - x1) + (y0 - y1) * (y0 - y1))
    else math.abs(dx * (y1 - y0) - (x1 - x0) * dy) / den
  }

  /** Kept vertex indices (ascending) after DP with tolerance `epsDeg` on
    * one closed ring given as parallel coordinate slices [from, until). */
  def simplifyRing(lons: Array[Double], lats: Array[Double],
                   from: Int, until: Int, epsDeg: Double): Array[Int] = {
    val n = until - from
    if (n <= 3) return Array.range(from, until)
    @inline def lon(v: Int) = lons(from + (if (v == n) 0 else v))
    @inline def lat(v: Int) = lats(from + (if (v == n) 0 else v))
    // second anchor: farthest vertex from vertex 0, tie -> lowest index
    var k = 1
    var best = -1.0
    var i = 1
    while (i < n) {
      val d = math.sqrt((lon(i) - lon(0)) * (lon(i) - lon(0)) +
        (lat(i) - lat(0)) * (lat(i) - lat(0)))
      if (d > best) { best = d; k = i }
      i += 1
    }
    val keep = new Array[Boolean](n + 1)
    keep(0) = true; keep(k) = true; keep(n) = true
    var stack = List((0, k), (k, n))
    while (stack.nonEmpty) {
      val (a, b) = stack.head
      stack = stack.tail
      if (b - a >= 2) {
        var m = -1
        var dmax = -1.0
        var v = a + 1
        while (v < b) {
          val d = perpDist(lon(v), lat(v), lon(a), lat(a), lon(b), lat(b))
          if (d > dmax) { dmax = d; m = v }
          v += 1
        }
        if (dmax > epsDeg) {
          keep(m) = true
          stack = (a, m) :: (m, b) :: stack
        }
      }
    }
    val out = new scala.collection.mutable.ArrayBuffer[Int](n)
    i = 0
    while (i < n) { if (keep(i)) out += from + i; i += 1 }
    out.toArray
  }

  /** Kept FLAT indices across all rings of a packed polygon (each ring
    * simplified independently; ring-start vertices are always kept, so the
    * ring structure survives — new offsets are recoverable as the positions
    * of old ring starts within the kept list). `offsets` uses the engine's
    * fence-post convention: [s0, s1, ..., totalLen], ring r spanning
    * [offsets(r), offsets(r+1)) — same as Geo.rayCast. */
  def simplifyPacked(offsets: Array[Int], lons: Array[Double],
                     lats: Array[Double], epsDeg: Double): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](lons.length)
    var r = 0
    while (r < offsets.length - 1) {
      out ++= simplifyRing(lons, lats, offsets(r), offsets(r + 1), epsDeg)
      r += 1
    }
    out.toArray
  }
}
