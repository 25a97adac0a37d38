package graft.etl

import scala.collection.mutable.ArrayBuffer

/**
 * Outlink URL resolution — RFC 3986 §5 reference resolution for the href
 * forms a crawler meets on real pages: absolute, protocol-relative
 * (`//host/x`), root-relative (`/x`), query-only (`?q`), fragment-only
 * (`#s`), and relative paths with `.`/`..` dot segments. This is the step
 * between raw `<a href>` extraction and everything downstream (the link
 * graph, the crawl frontier, anchor-text consolidation): an unresolved
 * relative href is not a node id.
 *
 * Row-local string math with no allocation beyond the output — exposed as a
 * codegen `StaticInvoke` Column ([[graft.functions.TextFunctions.resolveUrl]])
 * so a 10^12-link extraction stays inside whole-stage codegen. Extraction
 * itself needs no custom expression at all: Spark's native
 * `regexp_extract_all` is already codegen'd (Spark-first: compose builtins,
 * extend only where they genuinely can't express the semantics — the
 * dot-segment stack below).
 */
object Links {

  /** RFC 3986 §5.2.4 remove_dot_segments over an absolute path: `..` pops,
    * `.` and empty segments drop, a trailing `.`/`..`/`/` keeps the result
    * a directory. `..` past the root is clamped at the root (the RFC's
    * behavior — never a leading `..` in the output). */
  def removeDotSegments(path: String): String = {
    val segs = path.split("/", -1)
    val stack = new ArrayBuffer[String]()
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "" | "."          => ()
        case ".."              => if (stack.nonEmpty) stack.remove(stack.length - 1)
        case s                 => stack += s
      }
      i += 1
    }
    val last = if (segs.isEmpty) "" else segs(segs.length - 1)
    val dir = path.endsWith("/") || last == "." || last == ".."
    "/" + stack.mkString("/") + (if (dir && stack.nonEmpty) "/" else "")
  }

  /** (scheme://authority, path-query-fragment) of an absolute base URL. */
  private def splitBase(base: String): (String, String) = {
    val schemeEnd = base.indexOf("://")
    require(schemeEnd > 0, s"resolveUrl: base URL has no scheme: $base")
    var i = schemeEnd + 3
    while (i < base.length && base.charAt(i) != '/' &&
      base.charAt(i) != '?' && base.charAt(i) != '#') i += 1
    (base.substring(0, i), base.substring(i))
  }

  private def hasScheme(s: String): Boolean = {
    val c = s.indexOf(':')
    if (c <= 0) return false
    if (!s.charAt(0).isLetter) return false
    var i = 1
    while (i < c) {
      val ch = s.charAt(i)
      if (!ch.isLetterOrDigit && ch != '+' && ch != '.' && ch != '-') return false
      i += 1
    }
    true
  }

  /** Resolve `href` against absolute `base` (RFC 3986 §5.3 minus the
    * base-fragment carry: an empty href returns the base sans fragment). */
  def resolveUrl(base: String, href: String): String = {
    val (origin, pqf) = splitBase(base)
    val scheme = origin.substring(0, origin.indexOf("://"))
    if (href == null || href.isEmpty) return stripFragment(base)
    if (hasScheme(href)) return href
    if (href.startsWith("//")) return scheme + ":" + href
    if (href.startsWith("#")) return stripFragment(base) + href
    // base path without query/fragment; empty authority-only base -> "/"
    var pEnd = 0
    while (pEnd < pqf.length && pqf.charAt(pEnd) != '?' && pqf.charAt(pEnd) != '#') pEnd += 1
    val basePath = if (pEnd == 0) "/" else pqf.substring(0, pEnd)
    if (href.startsWith("?")) return origin + basePath + href
    // split href into its path part and ?query#fragment suffix
    var hEnd = 0
    while (hEnd < href.length && href.charAt(hEnd) != '?' && href.charAt(hEnd) != '#') hEnd += 1
    val hrefPath = href.substring(0, hEnd)
    val suffix = href.substring(hEnd)
    val merged =
      if (hrefPath.startsWith("/")) hrefPath
      else basePath.substring(0, basePath.lastIndexOf('/') + 1) + hrefPath
    origin + removeDotSegments(merged) + suffix
  }

  private def stripFragment(u: String): String = {
    val h = u.indexOf('#')
    if (h < 0) u else u.substring(0, h)
  }
}
