package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup extraction — raw web page → training text, the stage every
  * web-scale corpus pipeline starts with (reference scope: the ledger
  * app ingests CSV only — ref `app/etl.py:22-40`; this operator is
  * part of the LLM-pipeline mandate, promoted from q164's inline chain
  * per the round-14 review so the robustness cases live behind one
  * tested surface instead of being re-derived per query).
  *
  * The chain, per row:
  *   1. body isolation — `(?s)<body[^>]*>(.*)</body>`: DOTALL so a
  *      multi-line body extracts whole (the inline chain's `.` stopped
  *      at the first newline, silently yielding an EMPTY body on any
  *      real crawl page — and because both engines degenerated the
  *      same way, the oracle compare could never catch it); `[^>]*`
  *      admits an attributed `<body class=...>`; greedy `(.*)` runs to
  *      the LAST `</body>` so a literal "&lt;/body&gt;" decoded later
  *      cannot truncate.
  *   2. anchor count BEFORE any rewriting — occurrences of `<a href`,
  *      exact integer arithmetic (each hit is 7 chars).
  *   3. tag strip — `<[^>]*>` → " " ([^>] crosses newlines, so
  *      attributes spanning lines strip correctly; nested tags are
  *      just consecutive matches), then `<[^>]*$` → " " so a page
  *      truncated mid-tag (unclosed trailing `<a href=...`) drops the
  *      fragment instead of leaking it into training text.
  *   4. entity decode — the named XML entities + nbsp + the common
  *      NUMERIC character references real crawl HTML carries
  *      (`&#34;`, `&#x27;`, …), all through one frozen table
  *      ([[Entities]] — the q164 oracle's replace chain is GENERATED
  *      from it, so the engines cannot drift). Ordering is the
  *      contract: ampersand forms decode LAST, and the numeric amp
  *      refs (`&#38;`/`&#x26;`) are first NORMALIZED to `&amp;` so a
  *      source-escaped `&amp;#38;` or a mixed `&#38;amp;` decodes to
  *      the literal text a real entity decoder would produce instead
  *      of double-decoding (each `replace` scans left-to-right without
  *      re-reading its own output, so the only cross-call feeding is
  *      the one the table's order makes deliberate).
  *   5. whitespace collapse — the EXPLICIT class `[ \t\n\r\f]+` → " ",
  *      then trim. Explicit because `\s` differs across engines (Java
  *      includes U+000B, RE2 does not) and the extracted string is
  *      md5-pinned byte-for-byte across engines.
  *
  * Quality gate = the two classic boilerplate signals: anchor count
  * (ad-stuffed pages fail) and text-to-markup ratio (link-heavy short
  * pages fail), the ratio in q20 fixed-point (`div`) so both engines
  * agree bit-for-bit.
  *
  * Plan shape: pure per-row codegen'd string ops (regexp_replace /
  * replace / length) — zero shuffles, scan-side map the whole way,
  * embarrassingly parallel at a 100 TB crawl.
  */
object Markup {

  /** q164's gate thresholds (shared with its oracle SQL). */
  val DefaultMaxLinks = 7
  val DefaultRatioMinQ20 = 350000 // extracted/html ≥ ~0.334 in q20 fixed-point

  /** DOTALL body isolation (step 1). */
  def body(html: Column): Column =
    regexp_extract(html, "(?s)<body[^>]*>(.*)</body>", 1)

  /** Tag strip incl. the unclosed trailing fragment (step 3). */
  def stripTags(body: Column): Column =
    regexp_replace(regexp_replace(body, "<[^>]*>", " "), "<[^>]*$", " ")

  /** Frozen decode table — order IS the contract. Named entities and
    * non-ampersand numeric refs first (decimal + the common lowercase
    * hex quote/apostrophe forms; `&#X..;`/zero-padded refs stay out of
    * scope, documented), then the ampersand family: `&#38;`/`&#x26;`
    * normalize INTO `&amp;`, and `&amp;` itself decodes last — the
    * arrangement under which escaped-in-source refs (`&amp;#38;`,
    * `&#38;amp;`, `&amp;lt;`) all come out as the literal text a
    * spec-compliant decoder produces (MarkupSpec pins each). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&#34;" -> "\"", "&#x22;" -> "\"", "&#x27;" -> "'",
    "&#60;" -> "<", "&#62;" -> ">", "&#160;" -> " ",
    "&#46;" -> ".", "&#64;" -> "@",
    "&#38;" -> "&amp;", "&#x26;" -> "&amp;", "&amp;" -> "&")

  /** Entity decode through [[Entities]], amp forms last (step 4). */
  def decodeEntities(text: Column): Column =
    Entities.foldLeft(text) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }

  /** Engine-invariant whitespace collapse + trim (step 5). */
  def collapseWs(text: Column): Column =
    trim(regexp_replace(text, "[ \t\n\r\f]+", " "))

  /** The full text chain: body → strip → decode → collapse. */
  def extractedText(html: Column): Column =
    collapseWs(decodeEntities(stripTags(body(html))))

  /** extract(html) → (extracted, html_chars, n_links, extracted_chars,
    * markup_ratio_q20, keep) appended to `df`. `htmlCol` must be a
    * plain column name (the anchor count and ratio use SQL `div` for
    * exact integer arithmetic).
    *
    * Round-18 optimization (guide §1.2 step 2): the strip → decode →
    * collapse chain and the anchor count ride ONE fused native
    * expression ([[graft.expressions.MarkupClean]] — three byte-level
    * passes) instead of ~20 allocating catalyst passes (2 strip
    * regexes + 16 entity replaces + the collapse regexp + the
    * anchor-count replace). [[extractedText]] keeps the composed chain
    * as the parity reference (MarkupSpec pins native == composed on
    * the adversarial entity corpus; the q164-family oracles replay the
    * composed SQL unchanged). Body isolation stays a regexp_extract —
    * it is ONE pass and its greedy last-`</body>` semantics belong to
    * Java regex. */
  def extract(df: DataFrame, htmlCol: String,
              maxLinks: Int = DefaultMaxLinks,
              ratioMinQ20: Int = DefaultRatioMinQ20): DataFrame =
    df.withColumn("__body", body(col(htmlCol)))
      .withColumn("__mc",
        graft.expressions.ScrubExpressions.markupClean(col("__body")))
      .withColumn("n_links", col("__mc.n_links"))
      .withColumn("extracted", col("__mc.extracted"))
      .withColumn("html_chars", length(col(htmlCol)).cast("long"))
      .withColumn("extracted_chars", length(col("extracted")).cast("long"))
      .withColumn("markup_ratio_q20",
        // greatest() guard: an empty html page must gate to keep=false,
        // not a NULL from the div-by-zero (r15 advice; the
        // QualityClassifier convention)
        expr("(extracted_chars * 1048576) div greatest(html_chars, 1)"))
      .withColumn("keep",
        col("n_links") <= maxLinks && col("markup_ratio_q20") >= ratioMinQ20)
      .drop("__body", "__mc")
}
