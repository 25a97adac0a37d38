package graft.etl

import java.util.regex.Pattern

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions
import graft.model.Mention

/** Text normalization shared by extraction and the forward join key:
  * lowercase, NFD diacritic fold, punctuation -> space, collapse whitespace.
  * Deterministic and locale-independent (Locale.ROOT). */
object Norm extends Serializable {
  private val Combining = Pattern.compile("\\p{M}+")

  /** Diacritic fold for non-ASCII text (slow path only). */
  private def fold(s: String): String =
    Combining.matcher(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    ).replaceAll("")

  /** Single-pass tokenizer: lowercase + diacritic-fold + split on non-alnum.
    * The extraction hot path — hand-rolled (no regex, no full-string copies)
    * because it runs once per crawled page; ASCII text never leaves the
    * fast path. */
  def tokens(s: String): Array[String] = {
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    val src = if (ascii) s else fold(s)
    val out = new scala.collection.mutable.ArrayBuffer[String](16)
    val buf = new java.lang.StringBuilder(24)
    i = 0
    while (i < src.length) {
      val c = src.charAt(i)
      val isWord =
        (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
          (c >= 'A' && c <= 'Z') || (c >= 0x80 && Character.isLetterOrDigit(c))
      if (isWord) buf.append(Character.toLowerCase(c))
      else if (buf.length > 0) { out += buf.toString; buf.setLength(0) }
      i += 1
    }
    if (buf.length > 0) out += buf.toString
    out.toArray
  }

  def normalize(s: String): String = String.join(" ", tokens(s): _*)
}

/**
 * Multi-pattern dictionary scanner over normalized text (Aho-Corasick-style
 * role, implemented as a token-trie with longest-match-first semantics —
 * SURVEY.md §2.7 E2). Built once on the driver from gazetteer name keys,
 * broadcast to executors; match cost is O(tokens * max-key-depth) per page.
 *
 * Serializable so it can live inside a Broadcast.
 */
final class DictScanner(keys: Array[String]) extends Serializable {
  /** Only `keys` is serialized (compact); the trie rebuilds lazily once per
    * deserialized instance (per executor). Shipping the built trie would
    * Java-serialize one HashMap per node — seconds per broadcast at
    * production dictionary sizes. */
  @transient private lazy val trie: (java.util.ArrayList[java.util.HashMap[String, Integer]],
      java.util.ArrayList[String]) = {
    val children = new java.util.ArrayList[java.util.HashMap[String, Integer]]()
    val terminal = new java.util.ArrayList[String]()
    children.add(new java.util.HashMap[String, Integer]())
    terminal.add(null)
    keys.foreach { key =>
      var node = 0
      key.split(' ').foreach { tok =>
        val m = children.get(node)
        var next = m.get(tok)
        if (next == null) {
          children.add(new java.util.HashMap[String, Integer]())
          terminal.add(null)
          next = children.size - 1
          m.put(tok, next)
        }
        node = next
      }
      terminal.set(node, key)
    }
    (children, terminal)
  }
  private def children = trie._1
  private def terminal = trie._2

  /** Open-addressed set of root-token hashes: rejects the ~95% of page
    * tokens that start no dictionary key in ~1 cache miss, before paying the
    * (String-keyed, multi-miss) HashMap probe. False positives just fall
    * through to the map. */
  @transient private lazy val rootFilter: Array[Long] = {
    val rootKeys = children.get(0).keySet()
    var cap = 16
    while (cap < rootKeys.size * 4) cap <<= 1
    val t = new Array[Long](cap)
    val it = rootKeys.iterator()
    while (it.hasNext) {
      var h = graft.text.TextCore.fnv64(it.next())
      if (h == 0L) h = 1L
      var slot = (h & (cap - 1)).toInt
      while (t(slot) != 0L && t(slot) != h) slot = (slot + 1) & (cap - 1)
      t(slot) = h
    }
    t
  }

  @inline private def mayStartKey(tok: String): Boolean = {
    val t = rootFilter
    var h = graft.text.TextCore.fnv64(tok)
    if (h == 0L) h = 1L
    val mask = t.length - 1
    var slot = (h & mask).toInt
    while (t(slot) != 0L) {
      if (t(slot) == h) return true
      slot = (slot + 1) & mask
    }
    false
  }

  /** Longest dictionary match starting at each token position; matched spans
    * don't overlap (scan resumes after a match — deterministic). */
  def scan(normText: String): Array[String] = scanTokens(normText.split(' '))

  def scanTokens(toks: Array[String]): Array[String] = {
    if (toks.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (!mayStartKey(toks(i))) i += 1
      else {
        var node = 0
        var j = i
        var best: String = null
        var bestEnd = i
        var continue = true
        while (continue && j < toks.length) {
          val next = children.get(node).get(toks(j))
          if (next != null) {
            node = next
            j += 1
            val t = terminal.get(node)
            if (t != null) { best = t; bestEnd = j }
          } else continue = false
        }
        if (best != null) { out += best; i = bestEnd } else i += 1
      }
    }
    out.toArray
  }
}

/**
 * E2 — deterministic mention + coordinate-literal extraction.
 *
 * Two candidate kinds per page text:
 *  - "coord": decimal lat-lon literals like "41.40139, 2.12870" (written
 *    lat-first in prose, the order OpenCage reverse queries use —
 *    /root/reference/src/opencage.rs:340-345); emitted as (lon, lat) per the
 *    engine-wide lon-lat invariant (/root/reference/src/lib.rs:12-16).
 *  - "name": gazetteer place-name mentions via broadcast DictScanner.
 *
 * The page `text` itself is never transcoded — the byte-identity invariant is
 * carried as sha256(text) alongside every extraction output (input_hint).
 */
object Extract {

  /** lat, lon decimal pair: needs >=3 decimals to avoid matching prose numbers. */
  private val CoordRe = Pattern.compile(
    "(-?\\d{1,2}\\.\\d{3,}),\\s*(-?\\d{1,3}\\.\\d{3,})")

  def extractCoords(text: String): Array[Mention] = {
    val m = CoordRe.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    while (m.find()) {
      val lat = java.lang.Double.parseDouble(m.group(1))
      val lon = java.lang.Double.parseDouble(m.group(2))
      if (math.abs(lat) <= 90.0 && math.abs(lon) <= 180.0)
        out += Mention("coord", m.group(0), null, lon, lat)
    }
    out.toArray
  }

  def extractAll(text: String, scanner: DictScanner): Array[Mention] = {
    val coords = extractCoords(text)
    val names = scanner.scanTokens(Norm.tokens(text))
      .map(k => Mention("name", k, k, null, null))
    coords ++ names
  }

  /** Column UDF over a broadcast scanner. UDF (not codegen Expression) is the
    * right tool here: variable-length Array[Struct] output with a broadcast
    * dictionary closure — the per-row regex/trie work dominates, not SerDe. */
  def mentionsUdf(bc: Broadcast[DictScanner]): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) =>
      if (text == null) Array.empty[Mention] else extractAll(text, bc.value))

  // one broadcast per scanner instance per JVM — repeated pipeline runs must
  // not re-serialize/re-ship the dictionary
  private val bcCache =
    new java.util.WeakHashMap[DictScanner, Broadcast[DictScanner]]()

  private def broadcastOnce(spark: SparkSession, scanner: DictScanner): Broadcast[DictScanner] =
    bcCache.synchronized {
      var bc = bcCache.get(scanner)
      if (bc == null) {
        bc = spark.sparkContext.broadcast(scanner)
        bcCache.put(scanner, bc)
      }
      bc
    }

  /**
   * pages -> one row per extracted mention:
   * (url, warc_ts, lang, text_sha256, kind, surface, norm, lon, lat).
   * Column-pruned scan: only url/warc_ts/lang/text are read (never html).
   */
  def mentions(spark: SparkSession, pages: DataFrame, scanner: DictScanner): DataFrame = {
    if (sys.env.contains("GRAFT_EXTRACT_UDF")) {
      val ex = mentionsUdf(broadcastOnce(spark, scanner))(col("text"))
      pages
        .select(col("url"), col("warc_ts"), col("lang"),
          GeoFunctions.sha256Hex(col("text")).as("text_sha256"),
          explode(ex).as("m"))
        .select(col("url"), col("warc_ts"), col("lang"), col("text_sha256"),
          col("m.kind").as("kind"), col("m.surface").as("surface"),
          col("m.norm").as("norm"), col("m.lon").as("lon"), col("m.lat").as("lat"))
    } else {
      // native expression: sha + mentions from one pass over the page text
      val ex = org.apache.spark.sql.GraftBridge.column(
        graft.functions.ExtractMentionsExpr(
          org.apache.spark.sql.GraftBridge.expression(col("text")),
          broadcastOnce(spark, scanner)))
      pages
        .select(col("url"), col("warc_ts"), col("lang"), ex.as("x"))
        .select(col("url"), col("warc_ts"), col("lang"),
          col("x.text_sha256").as("text_sha256"),
          explode(col("x.mentions")).as("m"))
        .select(col("url"), col("warc_ts"), col("lang"), col("text_sha256"),
          col("m.kind").as("kind"), col("m.surface").as("surface"),
          col("m.norm").as("norm"), col("m.lon").as("lon"), col("m.lat").as("lat"))
    }
  }
}
