package graft.text

/**
 * Pure-Scala text hashing/sketching core for the training-data pipeline ops
 * (dedup, fingerprinting, near-dup). Deterministic, allocation-light, zero
 * Spark deps; exposed to Catalyst codegen through graft.functions shims.
 */
object TextCore {

  /** FNV-1a 64-bit over UTF-8 bytes — stable cross-platform token hash. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — cheap independent rehash per permutation. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def tokenize(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}\\p{Nd}]+").filter(_.nonEmpty)

  /** BPE initial symbol sequence for a word: codepoints space-separated plus
    * the end-of-word marker, with a single leading AND trailing space so a
    * merge rewrite is a pure sentinel-delimited string replace ("low" ->
    * " l o w </w> "). Codepoint-based (not UTF-16 units) so astral-plane
    * characters stay whole symbols. */
  def bpeCharSeq(w: String): String = {
    val sb = new java.lang.StringBuilder(w.length * 2 + 8)
    sb.append(' ')
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      sb.appendCodePoint(cp).append(' ')
      i += Character.charCount(cp)
    }
    sb.append("</w> ").toString
  }

  /** Adjacent symbol pairs of a single-space-separated symbol sequence, each
    * as "left right" (symbols never contain spaces, so the join is
    * unambiguous). " l o w </w> " -> ["l o", "o w", "w </w>"]. */
  def spacePairs(seq: String): Array[String] = {
    val toks = seq.trim.split(" ")
    if (toks.length < 2) Array.empty
    else Array.tabulate(toks.length - 1)(i => toks(i) + " " + toks(i + 1))
  }

  /** Distinct word n-grams as space-joined strings, first-occurrence order;
    * texts with fewer than n tokens yield none (decontamination semantics:
    * no collision is possible). One JVM call per row — a Catalyst HOF lambda
    * here would re-tokenize per element once CollapseProject inlines the
    * token expression. */
  def wordNgrams(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** ALL word n-gram windows in positional order, with multiplicity — the
    * substring-dedup window stream (wordNgrams above dedups; this keeps one
    * entry per token offset, so posexplode yields the window's 0-based start
    * offset). Texts with fewer than n tokens yield none. One JVM call per
    * row for the same CollapseProject reason as wordNgrams. */
  def windowNgrams(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) return Array.empty
    val out = new Array[String](toks.length - n + 1)
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  /** Word n-gram shingle hashes. */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty else Array(fnv64(toks.mkString(" ")))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < n) { h = (h ^ fnv64(toks(i + j))) * 0x100000001b3L; j += 1 }
        out(i) = h
        i += 1
      }
      out
    }
  }

  /** MinHash signature: perms independent permutations via splitmix rehash.
    * Empty text -> all Long.MaxValue (never collides with real signatures on
    * a band: band hashes still differ from non-empty docs only if... they
    * don't — callers filter empty texts first). */
  def minhash(text: String, shingleN: Int, perms: Int): Array[Long] = {
    val sh = shingleHashes(text, shingleN)
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val h = sh(i)
      var p = 0
      while (p < perms) {
        val v = mix(h ^ (p.toLong * 0xA24BAED4963EE407L))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band keys from a minhash signature: `bands` hashes, each over
    * perms/bands consecutive rows. */
  def bandHashes(sig: Array[Long], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) { h = (h ^ sig(b * rows + r)) * 0x100000001b3L; r += 1 }
      // fold band index in so identical row-slices in different bands differ
      out(b) = mix(h ^ b.toLong)
      b += 1
    }
    out
  }

  /** Fraction of equal components — unbiased Jaccard estimate. */
  def sigOverlap(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** Exact Jaccard over word n-gram shingle sets. */
  def jaccard(textA: String, textB: String, shingleN: Int): Double = {
    val a = shingleHashes(textA, shingleN)
    val b = shingleHashes(textB, shingleN)
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = new java.util.HashSet[java.lang.Long]()
    a.foreach(sa.add(_))
    val sb = new java.util.HashSet[java.lang.Long]()
    b.foreach(sb.add(_))
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** Asymmetric shingle containment: |shingles(A) ∩ shingles(B)| /
    * |shingles(A)| — the quote/boilerplate-inclusion signal Jaccard
    * misses when the two texts differ greatly in size (a short doc fully
    * quoted inside a long one has high containment but low Jaccard).
    * Same shingle sets as [[jaccard]]. 0.0 when A has no shingles. */
  def containment(textA: String, textB: String, shingleN: Int): Double = {
    val a = shingleHashes(textA, shingleN)
    val b = shingleHashes(textB, shingleN)
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = new java.util.HashSet[java.lang.Long]()
    a.foreach(sa.add(_))
    val sb = new java.util.HashSet[java.lang.Long]()
    b.foreach(sb.add(_))
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) if (sb.contains(it.next())) inter += 1
    inter.toDouble / sa.size
  }

  /** 64-bit SimHash over unigram token hashes weighted by term frequency. */
  def simhash(text: String): Long = {
    val toks = tokenize(text)
    val acc = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = fnv64(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing document fingerprint: min rolling k-gram hash per window of w,
    * xor-folded — a compact content fingerprint robust to local edits
    * (standard winnowing scheme, Schleimer et al. 2003). */
  def winnowFingerprint(text: String, k: Int, w: Int): Long = {
    val s = if (text == null) "" else text
    if (s.length < k) return fnv64(s)
    val n = s.length - k + 1
    val gram = new Array[Long](n)
    var i = 0
    while (i < n) { gram(i) = fnv64(s.substring(i, i + k)); i += 1 }
    var fp = 0L
    var start = 0
    while (start + w <= n) {
      var m = Long.MaxValue
      var j = start
      while (j < start + w) { if (gram(j) < m) m = gram(j); j += 1 }
      fp ^= mix(m)
      start += w
    }
    if (fp == 0L) fnv64(s) else fp
  }

  /** 60-bit portable hash: first 15 hex chars of sha256("wn:" + s) as a long
    * (== big-endian first 8 digest bytes >>> 4) — the same value an ANSI
    * oracle derives from its own sha256 hex string. */
  def sha60wn(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(("wn:" + s).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** The UNPREFIXED 60-bit portable hash — driver-side twin of the
    * [[graft.functions.TextFunctions.sha60]] Column (first 15 hex chars of
    * sha256 as a long), for deterministic plan-literal matrices (e.g. the
    * signed-random-projection signs) an oracle re-derives from its own
    * sha256. */
  def sha60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** [[winnowFingerprint]] with the PORTABLE sha256 k-gram hash family and a
    * plain xor fold (no splitmix finalizer) — every k-gram hash, window min,
    * and the fold are independently recomputable by an ANSI oracle. Char
    * (not byte) k-gram positions; identical to byte positions on ASCII
    * corpora, which is what the contract corpus is. */
  def portableWinnow(text: String, k: Int, w: Int): Long = {
    val s = if (text == null) "" else text
    if (s.length < k) return sha60wn(s)
    val n = s.length - k + 1
    val gram = new Array[Long](n)
    var i = 0
    while (i < n) { gram(i) = sha60wn(s.substring(i, i + k)); i += 1 }
    var fp = 0L
    var start = 0
    while (start + w <= n) {
      var m = Long.MaxValue
      var j = start
      while (j < start + w) { if (gram(j) < m) m = gram(j); j += 1 }
      fp ^= m
      start += w
    }
    if (fp == 0L) sha60wn(s) else fp
  }
}
