package graft

import org.apache.spark.sql.functions._

import graft.operators.Markup

/** The robustness shapes q164's pre-r15 inline chain silently
  * mishandled — each one here produced an empty or polluted extraction
  * before the promotion (and because BOTH engines degenerated the same
  * way, the oracle compare could never trip on them). */
class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String) =
    Markup.extract(Seq((1L, html)).toDF("doc_id", "html"), "html")
      .select("extracted", "n_links", "keep").head()

  test("multi-line body extracts whole (DOTALL) — the real-crawl shape " +
      "the inline '<body>(.*)</body>' silently emptied") {
    val html = "<html><body><p>line one</p>\n<p>line two</p>\n</body></html>"
    val r = extractOne(html)
    assert(r.getString(0) === "line one line two")
    // the pre-r15 regex on the same input: empty body, zero chars
    val old = Seq(html).toDF("h")
      .select(regexp_extract(col("h"), "<body>(.*)</body>", 1)).head.getString(0)
    assert(old === "", "precondition: the old pattern really did degenerate")
  }

  test("attributed body tag and attributes spanning lines strip correctly") {
    val html = "<body class=\"main\"\n data-x=\"1\"><a\n href=\"#\">x</a> ok</body>"
    val r = extractOne(html)
    assert(r.getString(0) === "x ok")
  }

  test("entities decode, &amp; LAST so &amp;lt; stays literal '<'-as-text") {
    val html = "<body>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;c &amp; d &amp;lt;</body>"
    val r = extractOne(html)
    assert(r.getString(0) === "a <tag> \"q\" 's' b c & d &lt;")
  }

  test("numeric character references decode through the frozen table — " +
      "decimal, lowercase hex, and the nbsp ref") {
    val html = "<body>a &#34;dq&#34; &#x22;dq2&#x22; &#39;sq&#39; " +
      "&#x27;sq2&#x27; &#60;tag&#62; nb&#160;sp &#38; ok</body>"
    val r = extractOne(html)
    assert(r.getString(0) === "a \"dq\" \"dq2\" 'sq' 'sq2' <tag> nb sp & ok")
  }

  test("escaped-ampersand shapes survive as literals: the &#38;/&#x26; " +
      "normalize-to-&amp; arrangement cannot double-decode") {
    // &amp;#38; = escaped ref -> literal '&#38;'; &#38;amp; = '&'+'amp;'
    // -> literal '&amp;'; &amp;lt; -> literal '&lt;'; &#38;#x26; ->
    // '&' + '#x26;' -> literal '&#x26;'
    val r = extractOne(
      "<body>w &amp;#38; x &#38;amp; y &amp;lt; z &#38;#x26;</body>")
    assert(r.getString(0) === "w &#38; x &amp; y &lt; z &#x26;")
  }

  test("empty html gates to keep=false, not a NULL ratio (div-by-zero " +
      "guard)") {
    val out = Markup.extract(Seq((1L, "")).toDF("doc_id", "html"), "html")
      .head()
    assert(out.getAs[Long]("markup_ratio_q20") === 0L)
    assert(out.getAs[Boolean]("keep") === false)
    assert(!out.isNullAt(out.fieldIndex("keep")))
  }

  test("unclosed trailing tag drops instead of leaking into text; nested " +
      "tags strip as consecutive matches") {
    val r = extractOne("<body><div><b>deep</b> text</div><a href=\"trunc")
    // greedy body needs the close tag — an unclosed BODY has no match,
    // by contract (a truncated page yields empty text, keep=false)
    assert(r.getString(0) === "")
    val r2 = extractOne(
      "<body><div><b>deep</b> text</div> tail <a href=\"trunc</body>")
    assert(r2.getString(0) === "deep text tail")
  }

  test("greedy body runs to the LAST </body>: a decoded literal in text " +
      "cannot truncate the extraction") {
    val r = extractOne("<body>before <p>mid</p></body><body>after</body>")
    assert(r.getString(0) === "before mid after")
  }

  test("anchor count and the q20 ratio gate replay the q164 arithmetic") {
    val html = "<body>" + Seq.fill(9)("<a href=\"#\">l</a>").mkString +
      "tiny</body>"
    val out = Markup.extract(Seq((1L, html)).toDF("doc_id", "html"), "html")
      .head()
    assert(out.getAs[Long]("n_links") === 9L)
    assert(out.getAs[Long]("html_chars") === html.length.toLong)
    val extracted = out.getAs[String]("extracted")
    assert(out.getAs[Long]("extracted_chars") === extracted.length.toLong)
    assert(out.getAs[Long]("markup_ratio_q20") ===
      extracted.length.toLong * 1048576L / html.length)
    assert(!out.getAs[Boolean]("keep"), "9 links > MaxLinks must drop")
  }

  test("whitespace collapse uses the explicit engine-invariant class — " +
      "tabs/newlines/CR/FF collapse, U+000B (Java-\\s-only) survives") {
    val r = extractOne("<body>a \t\n\r\f bc</body>")
    assert(r.getString(0) === "a bc")
  }
}
