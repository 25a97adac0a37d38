package graft.etl

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

  /** RFC 3986 §5.2.4 remove_dot_segments, implemented as the RFC's own
    * input/output buffer walk: `..` pops the last output segment, `.`
    * drops, trailing `.`/`..` keep the directory form, and `..` past the
    * root clamps at the root. EMPTY segments are PRESERVED (`/a//b` stays
    * `/a//b`) — they are distinct resources to every server and crawler
    * peer, and collapsing them would merge different link-graph node ids. */
  def removeDotSegments(path: String): String = {
    val out = new java.lang.StringBuilder(path.length)
    var in = path
    while (!in.isEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); popSegment(out) }
      else if (in == "/..") { in = "/"; popSegment(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in, 0, next); in = in.substring(next) }
      }
    }
    out.toString
  }

  private def popSegment(sb: java.lang.StringBuilder): Unit = {
    val i = sb.lastIndexOf("/")
    sb.setLength(if (i < 0) 0 else i)
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
    * base-fragment carry: an empty href returns the base sans fragment).
    * A scheme-carrying href passes through BEFORE the base is parsed, so a
    * malformed base row cannot abort resolutions that never need it. */
  def resolveUrl(base: String, href: String): String = {
    if (href != null && hasScheme(href)) return href
    val (origin, pqf) = splitBase(base)
    val scheme = origin.substring(0, origin.indexOf("://"))
    if (href == null || href.isEmpty) return stripFragment(base)
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
