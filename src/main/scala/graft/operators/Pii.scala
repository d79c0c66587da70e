package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrubbing stage every training-data
  * pipeline runs before text reaches a model (reference scope: none —
  * the ledger app stores finance rows verbatim; this is the
  * LLM-pipeline mandate). Five pattern families: email, credit-card,
  * SSN, phone, IPv4.
  *
  * Everything is frozen so both engines replay it bit-for-bit:
  *   - the REGEXES use only syntax with identical semantics under Java
  *     regex and RE2 (explicit character classes, bounded repetition —
  *     no \b, no \d, no lookaround, no backreferences);
  *   - the REDACTION ORDER is part of the contract (email first — its
  *     local part may contain digits a later pattern could chew on;
  *     then cc → ssn → phone → ip). The canonical shapes are mutually
  *     non-overlapping (PiiSpec pins the cross-matrix: no pattern
  *     matches inside another family's example), with ONE documented
  *     exception the order resolves: a dotted `+1.XXX.XXX.XXXX` phone
  *     contains an IPv4-shaped substring, so raw COUNTS report both
  *     families on such text (a monitoring artifact), while redaction
  *     — phone strictly before ip — removes the number once and
  *     `clean` comes back true (PiiSpec pins this case);
  *   - counts are taken on the RAW text (the monitoring output);
  *     `clean` re-scans the redacted text with all five patterns — the
  *     exit criterion a compliance gate actually checks.
  *
  * Detection is regex-only by design: dictionary/NER-grade PII (names,
  * addresses) needs a model this container doesn't ship, and a regex
  * pass is the universally-run first tier (CCNet/RefinedWeb pipelines
  * do exactly this before anything learned).
  *
  * Plan shape: per-row regexp_extract_all/regexp_replace — codegen'd,
  * shuffle-free, scan-side; at a 100 TB crawl the scrub pipelines
  * inside the scan's codegen stage like q164's extraction.
  */
object Pii {

  /** (family, regex, placeholder) — order IS the redaction order.
    *
    * Shapes covered (widened per the round-15 review — the first cut
    * was lowercase/space-quad/bare-hyphen only, so `Jane@Example.COM`
    * or `4242-4242-4242-4242` sailed through with `clean` = true, a
    * false compliance signal):
    *   - email: mixed case via EXPLICIT `[a-zA-Z…]` classes (not
    *     `(?i)`, so there is no flag-semantics question across
    *     engines);
    *   - cc: quads separated by space or hyphen (mixed separators
    *     admitted — requiring a consistent separator needs a
    *     backreference, which RE2 lacks), plus a contiguous 16-digit
    *     run. The contiguous-16 alternative fires inside ANY ≥16-digit
    *     run (order ids, hashes, concatenated timestamps), the same
    *     false-positive class the phone family's precision stance
    *     excludes below — a DELIBERATE asymmetry, not an oversight:
    *     a leaked card number is a compliance incident while a leaked
    *     10-digit integer is ambient, so cc redaction favors recall
    *     (mangling the odd numeric blob is the accepted cost) where
    *     phone favors precision. PiiSpec pins the over-match
    *     (a 17-digit run redacts) so the trade-off stays visible;
    *   - phone: optional `+1` country prefix (space/dot/hyphen),
    *     `(XXX) XXX-XXXX` (paren space optional), and dotted or
    *     hyphenated `XXX?XXX?XXXX`. Deliberately NOT bare 10 contiguous
    *     digits — at crawl scale that family is mostly false positives
    *     (ids, timestamps).
    * Still out of scope, documented: `+1` glued straight onto digits
    * (`+15551234567`), `&#x`-less obfuscations, and anything needing a
    * dictionary/NER (names, addresses). */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("cc", "[0-9]{4}([ -][0-9]{4}){3}|[0-9]{16}", "<CC>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", "(\\+1[ .-])?(\\([0-9]{3}\\) ?|[0-9]{3}[.-])[0-9]{3}[.-][0-9]{4}",
      "<PHONE>"),
    ("ip", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** Per-family match count on the raw text. */
  def count(text: Column, family: String): Column = {
    val (_, re, _) = Patterns.find(_._1 == family)
      .getOrElse(sys.error(s"unknown PII family '$family'"))
    size(regexp_extract_all(text, lit(re), lit(0))).cast("bigint")
  }

  /** The redaction fold, in [[Patterns]] order. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (c, (_, re, ph)) =>
      regexp_replace(c, re, ph)
    }

  /** True iff a re-scan of `text` finds NO family — the compliance
    * exit criterion (run it on the REDACTED text).
    *
    * Round-18 optimization (guide §1.2 step 2): existence needs only
    * the FIRST match, so each family re-scans via `rlike` (first-match
    * search, no match-array construction) instead of
    * `size(regexp_extract_all(...)) === 0` (which materializes every
    * match just to count zero). NULL text reads NULL both ways
    * (size(NULL) = NULL under Spark 4 defaults — ScrubFusionSpec pins
    * the parity, NULL row included). */
  def clean(text: Column): Column =
    Patterns.map { case (_, re, _) => !text.rlike(re) }.reduce(_ && _)

  /** scrub(df, textCol) → appends n_email/n_cc/n_ssn/n_phone/n_ip
    * (BIGINT, counted on the raw text), `redacted` (the scrubbed
    * string) and `clean` (re-scan of the scrubbed string finds
    * nothing). */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val counted = Patterns.foldLeft(df) { case (d, (fam, _, _)) =>
      d.withColumn(s"n_$fam", count(col(textCol), fam))
    }
    counted
      .withColumn("redacted", redact(col(textCol)))
      .withColumn("clean", clean(col("redacted")))
  }
}
