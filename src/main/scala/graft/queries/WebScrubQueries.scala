package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions.stopwords
import graft.operators.{Markup, Pii, QualityClassifier, WebScrub}

/** q167 — the composed web-corpus scrub capstone: Markup →
  * QualityClassifier → Pii as ONE pipeline over one synthetic crawl
  * drop, the CCNet/RefinedWeb stage order (r15 review item 3). q100
  * proved the cross-row curation family composes; this is the
  * row-local counterpart — and because [[graft.operators.WebScrub]]
  * runs the whole chain without inter-stage filters, the plan is a
  * single whole-stage-codegen span over the scan plus one aggregate:
  * zero shuffles beyond the final single-row reduce, no checkpoints,
  * no recomputed prefixes. At a 100 TB crawl this is embarrassingly
  * parallel decode-free CPU — the cheapest possible shape for the
  * most-run pipeline a training-data platform has.
  *
  * One planted victim family per stage, each dying at ITS OWN stage:
  *   - % 5: an 8-link ad block — fails the markup anchor gate (the
  *     page's TEXT is fine, so it must not reach the quality stage);
  *   - % 9: the doc text replaced by 40 repetitions of a 14-letter
  *     gibberish token — passes markup (plain text, healthy ratio),
  *     then the learned filter's word-length drag sinks it:
  *     c_wlen = −(14·2¹⁷) = −1,835,008 against c_tokens = 40·8192,
  *     deterministically negative at any corpus scale;
  *   - % 7: a PII suffix exercising all three r16-WIDENED families —
  *     mixed-case email, hyphenated credit card, `+1` phone — redacted
  *     (not dropped) at the Pii stage;
  *   - % 13: an entity-OBFUSCATED email, `j&#46;doe&#64;ex&#46;co` —
  *     PII that EXISTS only if Markup's numeric-reference decode ran
  *     before Pii scanned: the composition bug class this query pins.
  *
  * Output: one row per stage — attrition count + a content-sensitive
  * BIGINT checksum, so every stage is load-bearing in the hash
  * (extraction text → extracted_chars and every downstream feature;
  * quality weights → the score sum; the widened Pii families → hit
  * counts, the redacted≠extracted count — which must equal the
  * hits>0 count — and an order-free SUM of a 32-bit md5 prefix per
  * surviving redacted string: the byte-content pin WITHOUT the
  * survivor-cardinality exchange a count-distinct would cost at
  * 100 TB). `clean_exit` pins the compliance criterion itself: ZERO
  * surviving rows may re-scan dirty.
  */
object WebScrubQueries {

  private val GibMod = 9
  private val PiiMod = 7
  private val ObfMod = 13
  private val AdMod = 5
  private val Gibberish = "zqxjkwvblortch " * 40
  private val NavLink = "<a href=\"#\">nav link</a> "
  private val AdBlock = "<div class=\"ads\">" +
    Seq.fill(8)("""<a href="#">ad</a>""").mkString + "</div>"
  /** Numeric character references load-bearing on every page. */
  private val RefSnippet = "<p>refs &#34;dq&#34; &#x27;sq&#x27; " +
    "&#60;lt&#62; nb&#160;sp &amp;#38;</p>"
  /** The composition plant: an email assembled from `&#46;`/`&#64;`
    * refs — invisible to Pii unless the decode ran first. */
  private val ObfEmail = "<p>mail j&#46;doe&#64;ex&#46;co</p>"

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_web_scrub" -> ((s, d) => {
      val base = docs(s, d).filter(col("text").isNotNull).select(
        col("doc_id"),
        concat(
          when(col("doc_id") % GibMod === 0, lit(Gibberish))
            .otherwise(col("text")),
          when(col("doc_id") % PiiMod === 0,
            concat(lit(" reach John.Doe"), col("doc_id").cast("string"),
              lit("@Example.COM card 4242-4242-4242-4242 dial +1 555-010-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit(""))).as("text"))
      val html = concat(
        lit("<html><head><title>w "), col("doc_id").cast("string"),
        lit("</title></head><body>\n<nav>"),
        expr(s"repeat('$NavLink', CAST(doc_id % 7 + 1 AS INT))"),
        lit("</nav>\n<p>"), col("text"), lit("</p>\n" + RefSnippet),
        when(col("doc_id") % ObfMod === 0, lit(ObfEmail)).otherwise(lit("")),
        when(col("doc_id") % AdMod === 0, lit(AdBlock)).otherwise(lit("")),
        lit("\n<footer>(c) corpus</footer></body></html>"))
      val wide = WebScrub.scrub(
        base.select(col("doc_id"), html.as("html")), "html")
      val surv = WebScrub.survived
      val hits = Pii.Patterns.map { case (f, _, _) => col(s"n_$f") }
        .reduce(_ + _)
      val a = wide.agg(
        count(lit(1)).cast("bigint").as("n0"),
        sum(col("html_chars")).as("c0"),
        sum(when(col("markup_keep"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("markup_keep"), col("extracted_chars")).otherwise(0L))
          .as("c1"),
        sum(when(surv, 1L).otherwise(0L)).as("n2"),
        sum(when(surv, col("score")).otherwise(0L)).as("c2"),
        sum(when(surv && hits > 0L, 1L).otherwise(0L)).as("n3"),
        sum(when(surv, hits).otherwise(0L)).as("c3"),
        // content pin WITHOUT a distinct (count-distinct would cost a
        // second, survivor-cardinality exchange — real at 100 TB): an
        // order-free SUM of a 32-bit md5 prefix per surviving redacted
        // string (2³² · rows stays far under 2⁶³ through ~10⁹ docs),
        // plus the redacted≠extracted count, which must equal n3
        sum(when(surv && col("redacted") =!= col("extracted"), 1L)
          .otherwise(0L)).as("n4"),
        sum(when(surv,
          conv(substring(md5(col("redacted")), 1, 8), 16, 10).cast("bigint"))
          .otherwise(0L)).as("c4"),
        sum(when(surv && !col("clean"), 1L).otherwise(0L)).as("n5"),
        sum(when(surv && col("clean"), 1L).otherwise(0L)).as("c5"))
      def st(ord: Int, name: String) =
        struct(lit(ord).cast("int").as("stage_ord"), lit(name).as("stage"),
          col(s"n$ord").cast("bigint").as("n_rows"),
          col(s"c$ord").cast("bigint").as("checksum"))
      a.select(explode(array(
          st(0, "ingest"), st(1, "markup"), st(2, "quality"),
          st(3, "pii_hits"), st(4, "redacted"), st(5, "clean_exit")))
          .as("s"))
        .select(col("s.stage_ord"), col("s.stage"), col("s.n_rows"),
          col("s.checksum"))
    })
  )

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(
    // identical synthesis; the markup chain replays operators.Markup
    // with the entity table GENERATED from Markup.Entities, the
    // quality features inline QualityClassifier's frozen weights (the
    // q165 fragments verbatim), and the detection/redaction chain is
    // GENERATED from Pii.Patterns — three generated surfaces, zero
    // room for engine drift
    "q167_web_scrub" -> {
      import QualityClassifier._
      val qcHits = stopwords.map { case (_, stops) =>
        s"len(list_filter(ws, w -> list_contains(${TextQueries.duckList(stops)}, w)))"
      }.mkString(" + ")
      val piiCounts = Pii.Patterns.map { case (fam, re, _) =>
        s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$fam"
      }.mkString(",\n          ")
      val piiRedacted = Pii.Patterns.foldLeft("text") { case (e, (_, re, ph)) =>
        s"regexp_replace($e, '$re', '$ph', 'g')"
      }
      val piiClean = Pii.Patterns.map { case (_, re, _) =>
        s"len(regexp_extract_all(redacted, '$re')) = 0"
      }.mkString(" AND ")
      val piiHitSum = Pii.Patterns.map { case (f, _, _) => s"n_$f" }
        .mkString(" + ")
      s"""WITH base AS (
         |  SELECT doc_id,
         |    (CASE WHEN doc_id % $GibMod = 0 THEN repeat('zqxjkwvblortch ', 40)
         |          ELSE text END) ||
         |    (CASE WHEN doc_id % $PiiMod = 0 THEN ' reach John.Doe' ||
         |       CAST(doc_id AS VARCHAR) ||
         |       '@Example.COM card 4242-4242-4242-4242 dial +1 555-010-' ||
         |       lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |     ELSE '' END) AS text
         |  FROM documents WHERE text IS NOT NULL),
         |b AS (
         |  SELECT doc_id,
         |    '<html><head><title>w ' || CAST(doc_id AS VARCHAR) ||
         |    '</title></head><body>' || chr(10) || '<nav>' ||
         |    repeat('$NavLink', CAST(doc_id % 7 + 1 AS INT)) ||
         |    '</nav>' || chr(10) || '<p>' || text || '</p>' || chr(10) ||
         |    '$RefSnippet' ||
         |    CASE WHEN doc_id % $ObfMod = 0 THEN '$ObfEmail' ELSE '' END ||
         |    CASE WHEN doc_id % $AdMod = 0 THEN '$AdBlock' ELSE '' END ||
         |    chr(10) || '<footer>(c) corpus</footer></body></html>' AS html
         |  FROM base),
         |e AS (SELECT doc_id, html,
         |        regexp_extract(html, '(?s)<body[^>]*>(.*)</body>', 1) AS body
         |      FROM b),
         |st AS (SELECT doc_id, html, body,
         |        regexp_replace(regexp_replace(body, '<[^>]*>', ' ', 'g'),
         |                       '<[^>]*$$', ' ', 'g') AS stripped
         |      FROM e),
         |m AS (SELECT doc_id,
         |        CAST(length(html) AS BIGINT) AS html_chars,
         |        CAST((length(body) - length(replace(body, '<a href', ''))) // 7
         |             AS BIGINT) AS n_links,
         |        trim(regexp_replace(${TextQueries.duckEntityDecode("stripped")},
         |          '[ \\t\\n\\r\\f]+', ' ', 'g')) AS text
         |      FROM st),
         |g AS (SELECT doc_id, html_chars, n_links, text,
         |        CAST(length(text) AS BIGINT) AS extracted_chars,
         |        (n_links <= ${Markup.DefaultMaxLinks} AND
         |         (CAST(length(text) AS BIGINT) * 1048576)
         |           // greatest(html_chars, 1)
         |           >= ${Markup.DefaultRatioMinQ20}) AS mkeep,
         |        ${TextQueries.duckWsTokens} AS n_ws,
         |        ${TextQueries.duckPunct} AS n_punct,
         |        length(text) AS n_chars,
         |        regexp_extract_all(lower(text), '[a-z]+') AS ws
         |      FROM m),
         |f AS (SELECT *,
         |        $WTokens * least(n_ws, $TokenCap) AS c_tokens,
         |        $WPunct * ((CAST(n_punct AS BIGINT) * 1048576) //
         |                   greatest(CAST(n_chars AS BIGINT), 1)) AS c_punct,
         |        $WStop * ((CAST($qcHits AS BIGINT) * 1048576) //
         |                  greatest(CAST(len(ws) AS BIGINT), 1)) AS c_stop,
         |        $WWlen * ((CAST(coalesce(list_sum(list_transform(ws,
         |                    w -> length(w))), 0) AS BIGINT) * 131072) //
         |                  greatest(CAST(len(ws) AS BIGINT), 1)) AS c_wlen
         |      FROM g),
         |q AS (SELECT *,
         |        CAST($Bias + c_tokens + c_punct + c_stop + c_wlen AS BIGINT)
         |          AS score,
         |        ($Bias + c_tokens + c_punct + c_stop + c_wlen >= 0) AS qkeep
         |      FROM f),
         |p0 AS (SELECT *,
         |          $piiCounts,
         |          $piiRedacted AS redacted,
         |          (mkeep AND qkeep) AS surv
         |       FROM q),
         |p AS (SELECT *, ($piiClean) AS clean, ($piiHitSum) AS hits FROM p0)
         |SELECT CAST(0 AS INT) AS stage_ord, 'ingest' AS stage,
         |       CAST(COUNT(*) AS BIGINT) AS n_rows,
         |       CAST(SUM(html_chars) AS BIGINT) AS checksum FROM p
         |UNION ALL SELECT 1, 'markup',
         |  CAST(SUM(CASE WHEN mkeep THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(SUM(CASE WHEN mkeep THEN extracted_chars ELSE 0 END) AS BIGINT)
         |FROM p
         |UNION ALL SELECT 2, 'quality',
         |  CAST(SUM(CASE WHEN surv THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(SUM(CASE WHEN surv THEN score ELSE 0 END) AS BIGINT) FROM p
         |UNION ALL SELECT 3, 'pii_hits',
         |  CAST(SUM(CASE WHEN surv AND hits > 0 THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(SUM(CASE WHEN surv THEN hits ELSE 0 END) AS BIGINT) FROM p
         |UNION ALL SELECT 4, 'redacted',
         |  CAST(SUM(CASE WHEN surv AND redacted <> text THEN 1 ELSE 0 END)
         |       AS BIGINT),
         |  CAST(SUM(CASE WHEN surv THEN
         |    CAST('0x' || substring(md5(redacted), 1, 8) AS BIGINT)
         |    ELSE 0 END) AS BIGINT)
         |FROM p
         |UNION ALL SELECT 5, 'clean_exit',
         |  CAST(SUM(CASE WHEN surv AND NOT clean THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(SUM(CASE WHEN surv AND clean THEN 1 ELSE 0 END) AS BIGINT)
         |FROM p""".stripMargin
    }
  )
}
