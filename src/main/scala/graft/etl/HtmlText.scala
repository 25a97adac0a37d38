package graft.etl

/**
 * Deterministic HTML -> text extraction for the `html: binary` input column
 * (input_hint schema) — the step a crawl pipeline runs to DERIVE the `text`
 * column in the first place (trafilatura-class, reduced to an exactly
 * replayable rule chain; the reference consumes provider JSON, so this is
 * engine-side corpus preparation, not provider parity).
 *
 * Fixed rule chain, order significant and part of the contract:
 *   1. strip <script ...>...</script> blocks (case-insensitive, dot-all)
 *   2. strip <style ...>...</style> blocks
 *   3. strip <!-- comments -->
 *   4. every remaining tag -> one space
 *   5. entity decode, FIXED list and order: &nbsp; &lt; &gt; &quot; &#39;
 *      then &amp; LAST (so "&amp;lt;" decodes to the literal "&lt;", never
 *      double-decodes — the classic ordering pitfall)
 *   6. collapse [ \t\n\r]+ runs to one space, trim
 *
 * Every rule is plain regex/replace with identical semantics in Java and
 * RE2, so an external engine replays the chain byte-for-byte
 * (web_html_extract). Pure Scala, zero Spark deps; exposed to codegen via
 * TextFunctions.htmlText (map-only — at crawl scale this runs at scan
 * speed next to the byte-level mention extractor).
 */
object HtmlText {

  def extract(html: String): String = {
    if (html == null) return ""
    var s = html
    s = s.replaceAll("(?is)<script[^>]*>.*?</script>", " ")
    s = s.replaceAll("(?is)<style[^>]*>.*?</style>", " ")
    s = s.replaceAll("(?s)<!--.*?-->", " ")
    s = s.replaceAll("<[^>]*>", " ")
    s = s.replace("&nbsp;", " ")
    s = s.replace("&lt;", "<")
    s = s.replace("&gt;", ">")
    s = s.replace("&quot;", "\"")
    s = s.replace("&#39;", "'")
    s = s.replace("&amp;", "&")
    s.replaceAll("[ \t\n\r]+", " ").trim
  }

  /** Binary (UTF-8) entry point — the input_hint `html` column shape. */
  def extractBytes(html: Array[Byte]): String =
    if (html == null) ""
    else extract(new String(html, java.nio.charset.StandardCharsets.UTF_8))
}
