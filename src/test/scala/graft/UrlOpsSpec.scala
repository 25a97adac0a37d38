package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.UrlOps

/** Canonical-URL operators: normalization rules, dedup, host stats. */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("url").select(UrlOps.canonicalUrl($"url")).as[String].head()

  test("canonicalUrl: case, www, default port, fragment, tracking params, sort") {
    assert(canon("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&id=1&b=2#frag")
      === "http://example.com/a/b?b=2&id=1")
    assert(canon("https://Example.com:443/") === "https://example.com")
    assert(canon("https://example.com:8080/P") === "https://example.com:8080/P")
    assert(canon("http://example.com:8080/x") === "http://example.com:8080/x")
  }

  test("canonicalUrl: path case preserved, root and trailing slashes, no query") {
    assert(canon("http://a.b/Dir/Page///") === "http://a.b/Dir/Page")
    assert(canon("http://a.b/") === "http://a.b")
    assert(canon("http://a.b") === "http://a.b")
    // all params tracking -> no '?' at all
    assert(canon("http://a.b/p?utm_medium=m&fbclid=z&gclid=1&ref=r")
      === "http://a.b/p")
    // bare tracking name without '=' also dropped; empties dropped
    assert(canon("http://a.b/p?ref&&x=1") === "http://a.b/p?x=1")
  }

  test("canonicalUrl: schemeless input is opaque (lowercased, defragmented)") {
    assert(canon("  Example.COM/Path#f  ") === "example.com/path")
  }

  test("canonicalUrl is idempotent") {
    val raws = Seq(
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&id=1&b=2#frag",
      "https://Example.com:443/", "https://h.io:8080/Q?z=1&a=2",
      "no-scheme.org/X#y")
    raws.foreach { r =>
      val once = canon(r)
      assert(canon(once) === once, r)
    }
  }

  test("host helpers: registered domain, reverse host, path depth") {
    val df = Seq("https://WWW.News.Sub.Example.co:443/a//b/c?x=1").toDF("url")
      .select(UrlOps.urlHost($"url").as("h"), UrlOps.urlPath($"url").as("p"))
      .select($"h", UrlOps.registeredDomain($"h").as("d"),
        UrlOps.reverseHost($"h").as("r"), UrlOps.pathDepth($"p").as("n"))
    val row = df.as[(String, String, String, Int)].head()
    assert(row === (("news.sub.example.co", "example.co",
      "co.example.sub.news", 3)))
  }

  test("dedupByCanonical merges raw variants; winner is min key") {
    val df = Seq(
      (1L, "HTTP://WWW.A.com/x?utm_source=s"),
      (2L, "http://a.com/x/"),
      (3L, "http://a.com/x#top"),
      (9L, "https://b.com/y")).toDF("id", "url")
    val out = UrlOps.dedupByCanonical(df, $"url", $"id")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      ("http://a.com/x", 1L, 3L, 3L),
      ("https://b.com/y", 9L, 1L, 1L)))
  }

  test("latestByCanonical keeps the newest capture; key breaks ts ties") {
    val df = Seq(
      (1L, 100L, "http://a.com/x"),
      (2L, 300L, "HTTP://WWW.A.com/x#old"),   // same canonical, newest ts
      (3L, 200L, "http://a.com/x/"),
      (7L, 50L, "https://b.com/y"),
      (8L, 50L, "https://b.com/y?utm_source=s")) // tied ts -> max key wins
      .toDF("id", "ts", "url")
    val out = UrlOps.latestByCanonical(df, $"url", $"id", $"ts")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      ("http://a.com/x", 300L, 2L, 3L),
      ("https://b.com/y", 50L, 8L, 2L)))
  }

  test("hostStats counts pages, canonical urls, hosts per registered domain") {
    val df = Seq(
      "http://a.example.com/1", "http://b.example.com/1",
      "http://b.example.com/1#frag", "https://other.org/z").toDF("url")
    val out = UrlOps.hostStats(df, $"url")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out === Array(
      ("example.com", 3L, 2L, 2L), ("other.org", 1L, 1L, 1L)))
  }

  test("canonicalization is map-only (no Exchange in the plan)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(concat(lit("http://h"), $"doc_id", lit(".ex.com/p")).as("url"))
    val plan = docs.select(UrlOps.canonicalUrl($"url"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Invoke"), plan)
  }

  test("robotsFilter: longest match wins, Allow beats Disallow on ties, " +
      "default allow, deterministic tie-break") {
    val rules = Seq(
      ("a.com", "/",       false), // blanket disallow
      ("a.com", "/pub",    true),  // longer allow carve-out
      ("a.com", "/pub/x",  false), // even longer disallow inside it
      ("b.com", "/t",      true),  // length-tie pair: allow must win
      ("b.com", "/t",      false)
    ).toDF("host", "prefix", "allow")
    val urls = Seq(
      1L -> "http://a.com/secret",   // '/' only → disallowed
      2L -> "http://a.com/pub/ok",   // '/pub' beats '/' → allowed
      3L -> "http://a.com/pub/x/y",  // '/pub/x' beats '/pub' → disallowed
      4L -> "http://b.com/t/z",      // tie '/t' → allow wins
      5L -> "http://c.com/anything", // no rules for host → default allow
      6L -> "https://A.COM:443/pub/" // canon host+path still match
    ).toDF("id", "url")
    val got = graft.web.Robots.robotsFilter(urls, $"url", rules)
      .select($"id", $"allowed", $"matched_prefix").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2)))).toMap
    assert(got === Map(
      1L -> ((false, "/")), 2L -> ((true, "/pub")),
      3L -> ((false, "/pub/x")), 4L -> ((true, "/t")),
      5L -> ((true, "")), 6L -> ((true, "/pub"))))
    // the URL side joins broadcast-side (never sort-merge): the only
    // exchanges touch the tiny rules table (its groupBy + the broadcast)
    val plan = graft.web.Robots.robotsFilter(urls, $"url", rules)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("resolveUrl: RFC 3986 reference resolution, every href form") {
    import graft.etl.Links.resolveUrl
    val base = "https://h.example/a/b/p.html?q=1#frag"
    // absolute and scheme-carrying refs pass through
    assert(resolveUrl(base, "http://x.example/y") === "http://x.example/y")
    assert(resolveUrl(base, "mailto:a@b.c") === "mailto:a@b.c")
    // protocol-relative picks up the base scheme
    assert(resolveUrl(base, "//cdn.example/l.js") === "https://cdn.example/l.js")
    // root-relative replaces the whole path
    assert(resolveUrl(base, "/r/x") === "https://h.example/r/x")
    // query-only keeps the base path, fragment-only drops the base fragment
    assert(resolveUrl(base, "?z=2") === "https://h.example/a/b/p.html?z=2")
    assert(resolveUrl(base, "#top") === "https://h.example/a/b/p.html?q=1#top")
    assert(resolveUrl(base, "") === "https://h.example/a/b/p.html?q=1")
    // relative merges onto the base directory
    assert(resolveUrl(base, "c.html") === "https://h.example/a/b/c.html")
    assert(resolveUrl(base, "c.html?z=1#s") === "https://h.example/a/b/c.html?z=1#s")
    // dot segments: ./ drops, ../ pops, past-root clamps at the root
    assert(resolveUrl(base, "./c") === "https://h.example/a/b/c")
    assert(resolveUrl(base, "../q.html") === "https://h.example/a/q.html")
    assert(resolveUrl(base, "../../../../deep") === "https://h.example/deep")
    // trailing slash / trailing dot segments keep the directory form
    assert(resolveUrl(base, "sub/") === "https://h.example/a/b/sub/")
    assert(resolveUrl(base, "..") === "https://h.example/a/")
    // authority-only base acts as path "/"
    assert(resolveUrl("https://h.example", "x") === "https://h.example/x")
  }

  test("removeDotSegments: RFC 5.2.4 buffer walk, directory preservation") {
    import graft.etl.Links.removeDotSegments
    assert(removeDotSegments("/a/b/../c") === "/a/c")
    assert(removeDotSegments("/a/./b/./") === "/a/b/")
    assert(removeDotSegments("/../../x") === "/x")
    // empty segments are DISTINCT resources (RFC preserves them) — a
    // crawler that collapses // merges different link-graph node ids
    assert(removeDotSegments("/a//b") === "/a//b")
    assert(removeDotSegments("/a//../b") === "/a/b")
    assert(removeDotSegments("/") === "/")
    assert(removeDotSegments("/a/b/..") === "/a/")
  }

  test("resolveUrl agrees with java.net.URI.resolve across the form grid") {
    // independent cross-check: java.net.URI implements the same reference-
    // resolution algorithm. Excluded by construction: past-root ".."
    // (URI keeps the RFC 2396 leading "../", RFC 3986 clamps), the empty
    // href (URI returns the base verbatim incl. fragment), and query-only
    // refs ("?y") — RFC 3986 §5.3 keeps the FULL base path ("?y" against
    // "http://a/b/c/d;p?q" is "http://a/b/c/d;p?y" in the RFC's own
    // examples) while java.net.URI applies RFC 2396 relative-merge and
    // drops the last segment; the dedicated test above pins the 3986 form.
    val bases = Seq(
      "https://h.example/a/b/p.html",
      "https://h.example/a/b/p.html?q=1",
      "http://h.example:8080/a/",
      "https://h.example/")
    val hrefs = Seq(
      "http://x.example/y", "//cdn.example/l.js", "/r/x", "/r//x",
      "c.html", "c.html?z=1", "./c", "d/e.html", "sub/",
      "a/../b.html", "./a/./b")
    for (b <- bases; h <- hrefs) {
      val expect = java.net.URI.create(b).resolve(h).toString
      assert(graft.etl.Links.resolveUrl(b, h) === expect, s"base=$b href=$h")
    }
  }

  test("resolveUrl: absolute href survives a malformed (scheme-less) base") {
    // the passthrough must not require base parsing — one dirty base row
    // cannot abort resolutions that never need it
    assert(graft.etl.Links.resolveUrl("example.com/p", "https://x.example/y")
      === "https://x.example/y")
    // root-relative double slash preserved end-to-end
    assert(graft.etl.Links.resolveUrl("https://h.example/a/p.html", "/r//x")
      === "https://h.example/r//x")
  }

  test("resolveUrl column shim stays inside codegen (no SerDe wrapper)") {
    // range source so ConvertToLocalRelation can't pre-evaluate the shim
    val df = spark.range(2).select(graft.functions.TextFunctions.resolveUrl(
      concat(lit("https://h.example/a/p"), $"id", lit(".html")),
      lit("../x")).as("r"))
    assert(df.head().getString(0) === "https://h.example/x")
    // "*(1)" is the WholeStageCodegen marker in the executed-plan rendering
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
