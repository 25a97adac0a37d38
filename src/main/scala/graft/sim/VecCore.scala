package graft.sim

/**
 * Pure-Scala float-vector math for embedding similarity (ANN). Deterministic;
 * exposed to Catalyst codegen via graft.functions shims. Accumulation order
 * is fixed (left-to-right) so results are bit-stable across partitionings.
 */
object VecCore {

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val na = norm(a); val nb = norm(b)
    if (na == 0.0 || nb == 0.0) 0.0 else dot(a, b) / (na * nb)
  }

  /** Largest |component| as a double (float->double widening is exact; max
    * is exact selection) — the per-vector symmetric-quantization scale
    * numerator. 0.0 for an all-zero (or empty) vector. */
  def maxAbs(v: Array[Float]): Double = {
    var m = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    m
  }

  /** Ties-away-from-zero rounding on the EXACT double value (what SQL
    * `round(x)` does in both Spark and DuckDB) — NOT floor(x+0.5), whose
    * x+0.5 addition can itself round up across the tie boundary. `a - floor
    * (a)` is exact (both operands within 1 ulp-range of each other), so the
    * >= 0.5 tie test is exact. */
  @inline private def roundAway(x: Double): Int = {
    val a = math.abs(x)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    (if (x < 0) -r else r).toInt
  }

  /** Symmetric per-vector int8 quantization: code[i] = round(v[i] * 127 /
    * maxAbs), ties away from zero — so |code[i]| <= 127 by construction and
    * the zero vector packs to all-zero codes. One byte per component: the
    * corpus scan that dominates ANN at 100 TB reads 4x fewer bytes than
    * float32 (the memory-bandwidth lever; see Quantize). The op order
    * (toDouble * 127.0 / maxAbs) is pinned so an external engine replays
    * the codes bit-for-bit from the same floats. */
  def int8Pack(v: Array[Float]): Array[Byte] = {
    val mx = maxAbs(v)
    val out = new Array[Byte](v.length)
    if (mx == 0.0) return out
    var i = 0
    while (i < v.length) {
      out(i) = roundAway(v(i).toDouble * 127.0 / mx).toByte
      i += 1
    }
    out
  }

  /** Exact integer dot of two int8 code vectors (Long accumulation never
    * overflows: 2^14 per term x vector lengths to 2^48). The asymmetric-
    * distance estimate is then (qScale * cScale) * int8Dot — one double
    * multiply per PAIR instead of a float multiply-add per COMPONENT. */
  def int8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }

  /** GLOBAL-scale int8 quantization: code[i] = round(v[i] * 127 / scale),
    * ties away, clamped to [-127, 127]. Unlike the per-vector [[int8Pack]],
    * one corpus-wide scale makes codes of DIFFERENT vectors directly
    * comparable in code units — the precondition for product-quantization
    * codebooks, where a subvector is matched against centroids from OTHER
    * vectors. scale <= 0 packs to all-zero (the zero corpus). The clamp is
    * a no-op when scale >= maxAbs(v) (always true for the corpus max) but
    * pins the semantics an external replay reproduces verbatim. */
  def int8PackScaled(v: Array[Float], scale: Double): Array[Byte] = {
    val out = new Array[Byte](v.length)
    if (scale <= 0.0) return out
    var i = 0
    while (i < v.length) {
      val r = roundAway(v(i).toDouble * 127.0 / scale)
      out(i) = math.max(-127, math.min(127, r)).toByte
      i += 1
    }
    out
  }

  /** PQ encode: split `code` (global-scale int8, length dim = m * sub) into
    * m equal subspaces; codes(j) = the index t (0..ks-1) of the codebook
    * centroid with the minimum EXACT integer L2^2 distance to subvector j,
    * first index winning ties. `books` is the ks concatenated quantized
    * seed vectors (books(t*dim + p) = component p of centroid row t), so
    * centroid (j, t) lives at books(t*dim + j*sub ..). All-integer: the
    * assignment is bit-reproducible and order-free. */
  def pqEncode(code: Array[Byte], books: Array[Byte], m: Int, ks: Int): Array[Byte] = {
    val dim = code.length
    val sub = dim / m
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val base = j * sub
      var best = 0L
      var bestT = 0
      var t = 0
      while (t < ks) {
        val cb = t * dim + base
        var d = 0L
        var i = 0
        while (i < sub) {
          val e = code(base + i).toLong - books(cb + i).toLong
          d += e * e
          i += 1
        }
        if (t == 0 || d < best) { best = d; bestT = t }
        t += 1
      }
      out(j) = bestT.toByte
      j += 1
    }
    out
  }

  /** ADC lookup table for one query: lut(j*ks + t) = exact integer dot of
    * the query's subspace-j code with codebook centroid (j, t). Computed
    * ONCE per query (m*ks longs), so scoring a corpus item is an m-length
    * gather-and-add ([[pqAdc]]) instead of dim multiplies — the
    * asymmetric-distance-computation shape that makes PQ scans cheap. */
  def pqLut(qcode: Array[Byte], books: Array[Byte], m: Int, ks: Int): Array[Long] = {
    val dim = qcode.length
    val sub = dim / m
    val out = new Array[Long](m * ks)
    var j = 0
    while (j < m) {
      val base = j * sub
      var t = 0
      while (t < ks) {
        val cb = t * dim + base
        var s = 0L
        var i = 0
        while (i < sub) { s += qcode(base + i).toLong * books(cb + i).toLong; i += 1 }
        out(j * ks + t) = s
        t += 1
      }
      j += 1
    }
    out
  }

  /** ADC score: sum_j lut(j*ks + codes(j)) — the exact integer estimate of
    * the query-item dot in code units (descale by (scale/127)^2 for the
    * double estimate). Long addition is exact and order-free. */
  def pqAdc(lut: Array[Long], codes: Array[Byte], ks: Int): Long = {
    var s = 0L
    var j = 0
    while (j < codes.length) {
      s += lut(j * ks + (codes(j).toInt & 0xFF))
      j += 1
    }
    s
  }

  /** Deterministic pseudo-random hyperplane component r[bit][dim] — rademacher
    * +-1 from a splitmix stream. Rademacher planes preserve angles well and
    * avoid storing a projection matrix. */
  @inline private def rade(bit: Int, dim: Int): Double =
    if ((graft.text.TextCore.mix(bit.toLong * 0x9E3779B97F4A7C15L + dim) & 1L) == 0L) 1.0 else -1.0

  /** All `bands` bucket keys from an EXPLICIT flattened plane matrix
    * (bands x bits x dim, index (t*bits + j)*dim + d) — the portable
    * hyperplane path: the caller derives the planes from a hash family an
    * external oracle can recompute. Dots accumulate left-to-right from 0.0
    * (same fold order as an ordered SQL list_sum), so the sign tests are
    * bit-identical cross-engine. */
  def portableKeys(v: Array[Float], flat: Array[Double], bits: Int, bands: Int): Array[Long] = {
    val dim = v.length
    val out = new Array[Long](bands)
    var t = 0
    while (t < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val off = (t * bits + j) * dim
        var s = 0.0
        var d = 0
        while (d < dim) { s += v(d).toDouble * flat(off + d); d += 1 }
        if (s > 0) key |= (1L << j)
        j += 1
      }
      out(t) = key
      t += 1
    }
    out
  }

  /** `bits`-bit random-hyperplane LSH signature (sign of projections). */
  def lshSignature(v: Array[Float], bits: Int): Int = lshSignatureBand(v, bits, 0)

  /** Signature from the `band`-th independent hyperplane set — multi-band
    * (multi-table) LSH: a near-dup pair is a candidate if ANY band collides.
    * band 0 reproduces lshSignature. */
  def lshSignatureBand(v: Array[Float], bits: Int, band: Int): Int = {
    val base = band * bits
    var sig = 0
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i) * rade(base + b, i); i += 1 }
      if (s >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** [[multiProbe]] for the portable Long bucket keys ([[portableKeys]]). */
  def multiProbeLong(key: Long, bits: Int): Array[Long] = {
    val out = new Array[Long](bits + 1)
    out(0) = key
    var b = 0
    while (b < bits) { out(b + 1) = key ^ (1L << b); b += 1 }
    out
  }

  /** PORTABLE Rademacher plane component: +1 iff the first 60 bits of
    * sha256("hp:t:j:d") are even — the hash family every portable-hyperplane
    * operator (and its DuckDB oracle twin) derives its planes from. */
  def portablePlaneSign(t: Int, j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s"hp:$t:$j:$d".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 0L) 1.0 else -1.0
  }

  /** Flattened portable plane matrix (bands x bits x dim) for
    * [[portableKeys]], derived from [[portablePlaneSign]]. */
  def portablePlanes(dim: Int, bits: Int, bands: Int): Seq[Double] =
    for { t <- 0 until bands; j <- 0 until bits; d <- 0 until dim }
      yield portablePlaneSign(t, j, d)

  /** Multi-probe buckets: the signature plus all 1-bit flips — recall boost
    * without widening the join fan-out beyond bits+1 buckets per query. */
  def multiProbe(sig: Int, bits: Int): Array[Int] = {
    val out = new Array[Int](bits + 1)
    out(0) = sig
    var b = 0
    while (b < bits) { out(b + 1) = sig ^ (1 << b); b += 1 }
    out
  }

  /** Squared L2 distance from v to the c-th centroid of `flat` (row-major
    * k x dim pack — centroids travel as one flat literal/broadcast array). */
  @inline private def sqDistTo(v: Array[Float], flat: Array[Float], c: Int): Double = {
    val dim = v.length
    val off = c * dim
    var s = 0.0
    var i = 0
    while (i < dim) { val d = v(i).toDouble - flat(off + i); s += d * d; i += 1 }
    s
  }

  /** The `nprobe` nearest centroid ids, ascending by L2 distance (ties by
    * id) — the IVF probe set. k = flat.length / v.length. */
  def nearestCentroids(v: Array[Float], flat: Array[Float], nprobe: Int): Array[Int] = {
    val k = if (v.length == 0) 0 else flat.length / v.length
    if (k == 0) return Array.empty
    val np = math.min(nprobe, k)
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) { dists(c) = sqDistTo(v, flat, c); c += 1 }
    val ids = Array.range(0, k).sortBy(c => (dists(c), c))
    java.util.Arrays.copyOfRange(ids, 0, np)
  }

  /** Nearest centroid id — the IVF list assignment. */
  def nearestCentroid(v: Array[Float], flat: Array[Float]): Int =
    nearestCentroids(v, flat, 1)(0)

  /** [[roundAway]] without the Int narrowing — same exact tie test. */
  @inline private def roundAwayLong(x: Double): Long = {
    val a = math.abs(x)
    val f = math.floor(a)
    val r = if (a - f >= 0.5) f + 1.0 else f
    (if (x < 0) -r else r).toLong
  }

  /** Fixed-point scaling of a float vector: out[i] = round(v[i] * scale),
    * ties away from zero — bit-identical to SQL
    * `CAST(round(CAST(e AS DOUBLE) * scale) AS BIGINT)` in both engines
    * (the SemDeDup/k-means scaled-integer embedding representation). */
  def scaleLongs(v: Array[Float], scale: Double): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = roundAwayLong(v(i).toDouble * scale)
      i += 1
    }
    out
  }

  /** Exact squared L2 distance between two scaled-integer vectors. Safe by
    * construction for embedding scales: |diff| <= 2 * scale * maxAbs, so at
    * scale 1e6 and |e| <= 100 the per-term square is <= 4e16 and even
    * 100-dim sums stay far under 2^63. */
  def longSqDist(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Exact dot product of two scaled-integer vectors. Safe by construction
    * for embedding scales: at scale 1e6 and |e| <= 100 the per-term product
    * is <= 1e16 and a 10^4-dim sum stays far under Long range. */
  def longDot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }
}
