package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.HtmlText

/** HTML -> text extraction: the fixed rule chain, case by case. */
class HtmlTextSpec extends AnyFunSuite {

  test("script/style blocks vanish wholesale, mixed case, with attributes") {
    val h = """<p>a</p><SCRIPT type="x">var i = 1 < 2;</script><p>b</p>
      |<style media="all">.c { color: red }</STYLE><p>c</p>""".stripMargin
    assert(HtmlText.extract(h) === "a b c")
  }

  test("comments (multiline) and tags collapse to spaces") {
    assert(HtmlText.extract("<h1>T</h1><!-- multi\nline\ncomment --><br/>x") === "T x")
  }

  test("entity decode order: &amp;lt; stays a literal &lt;, never double-decodes") {
    assert(HtmlText.extract("&amp;lt;tag&amp;gt;") === "&lt;tag&gt;")
    assert(HtmlText.extract("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f") ===
      "a & b <c> \"d\" 'e' f")
  }

  test("whitespace collapses, edges trim, binary entry point decodes UTF-8") {
    assert(HtmlText.extract("  a\t\tb\n\nc\r\n  ") === "a b c")
    assert(HtmlText.extractBytes("<p>é ü</p>".getBytes("UTF-8")) === "é ü")
    assert(HtmlText.extractBytes(null) === "")
    assert(HtmlText.extract(null) === "")
  }

  test("bare angle brackets: eaten up to the next '>', preserved without one") {
    // naive tag-strip contract: a bare '<' consumes through the next '>'
    // (here the stray "< 2</p>" reads as one pseudo-tag)...
    assert(HtmlText.extract("<p>1 < 2</p>") === "1")
    // ...but a '<' with no '>' anywhere after it survives
    assert(HtmlText.extract("1 < 2") === "1 < 2")
    // the entity-encoded form is the lossless spelling
    assert(HtmlText.extract("<p>1 &lt; 2</p>") === "1 < 2")
  }
}
