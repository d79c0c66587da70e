package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed web-corpus scrub — Markup → QualityClassifier → Pii,
  * the CCNet/RefinedWeb stage order every crawl-to-training-text
  * pipeline runs (reference scope: none — the ledger app has no text
  * pipeline; this is the LLM-pipeline mandate, and the r15 review's
  * composition ask: the three operators were individually green, but
  * composition bugs — e.g. Markup's entity decode producing text the
  * Pii regexes then see differently — are exactly what only the
  * composed surface can catch. WebScrubSpec plants an
  * entity-OBFUSCATED email, `j&#46;doe&#64;ex&#46;co`, that is
  * invisible to Pii unless the decode ran first).
  *
  * Deliberately a SINGLE per-row pass with NO inter-stage filters:
  * all three operators are row-local maps, so scoring/scrubbing a row
  * that an earlier gate drops is semantically identical to scoring
  * only survivors — the stage semantics live in the verdict columns
  * (`markup_keep`, `quality_keep`, and [[survived]]), and a consumer
  * filters once at the end. That keeps the whole chain inside ONE
  * whole-stage-codegen span over the scan: zero shuffles, zero
  * checkpoints, no recomputed prefixes — at a 100 TB crawl the scrub
  * is pure pipelined CPU over file splits, the plan shape q100 pays
  * three localCheckpoint pins to approximate for its cross-row stages.
  *
  * Appended columns: everything [[Markup.extract]] emits (its `keep`
  * renamed `markup_keep`), everything [[QualityClassifier.score]]
  * emits over the EXTRACTED text (its `keep` renamed `quality_keep`),
  * and everything [[Pii.scrub]] emits over the extracted text
  * (per-family counts on the raw extraction — the monitoring output —
  * plus `redacted` and `clean`).
  */
object WebScrub {

  /** The full chain. `htmlCol` must be a plain column name; `df` must
    * not already carry the appended column names (`extracted`, `keep`,
    * the Pii/QC outputs). */
  def scrub(df: DataFrame, htmlCol: String,
            maxLinks: Int = Markup.DefaultMaxLinks,
            ratioMinQ20: Int = Markup.DefaultRatioMinQ20): DataFrame = {
    val m = Markup.extract(df, htmlCol, maxLinks, ratioMinQ20)
      .withColumnRenamed("keep", "markup_keep")
    val q = QualityClassifier.score(m, "extracted")
      .withColumnRenamed("keep", "quality_keep")
    Pii.scrub(q, "extracted")
  }

  /** The end-of-pipe predicate: past both gates (Pii redacts rather
    * than drops, so it adds no gate — its exit criterion is `clean`). */
  def survived: org.apache.spark.sql.Column =
    col("markup_keep") && col("quality_keep")

  /** The PRODUCTION stage order — Gopher/MassiveText runs the
    * repetition rules beside the learned filter, so the full chain is
    * Markup → QualityClassifier → Repetition → Pii (r16 review item 3).
    * Same single-pass discipline as [[scrub]]: [[Repetition.annotate]]
    * is row-local array arithmetic over the extracted text, so the
    * four stages still fuse into ONE filter-free whole-stage-codegen
    * span over the scan (q170's PlanSpec pin).
    *
    * Composition note, proved in WebScrubSpec: a DECIMAL character
    * reference's raw bytes (`&`, `#`, digits, `;`) are letter-free and
    * its full-chain decode through [[Markup.Entities]] is letter-free
    * too, and [[Repetition]] tokenizes on `[a-z]+` runs — so for
    * decimal refs the ref's raw bytes separate words exactly where the
    * decoded char does: the repetition verdict is provably
    * DECIMAL-REF-DECODE-INVARIANT (an `&#46;`-obfuscated loop cannot
    * hide from the filter, decoded or not). Hex refs (a literal `x`)
    * and NAMED entities (`&amp;`/`&lt;` raw forms carry the letter
    * words amp/lt) are NOT invariant — their spurious words vanish
    * only after decode, one more reason the filter must read the
    * DECODED extraction. The stage-order
    * composition that IS load-bearing — and is planted in q170 — is
    * TAG-STRIP-before-repetition: list/table pages repeat tag
    * scaffolding (`<li id=…>` …), so a repetition filter reading raw
    * markup sees a loop that the page's visible text does not have
    * and false-drops healthy link-list pages; the filter must run on
    * the EXTRACTED text. */
  def scrubFull(df: DataFrame, htmlCol: String,
                maxLinks: Int = Markup.DefaultMaxLinks,
                ratioMinQ20: Int = Markup.DefaultRatioMinQ20): DataFrame = {
    val m = Markup.extract(df, htmlCol, maxLinks, ratioMinQ20)
      .withColumnRenamed("keep", "markup_keep")
    val q = QualityClassifier.score(m, "extracted")
      .withColumnRenamed("keep", "quality_keep")
    val r = Repetition.annotate(q, "extracted")
      .withColumnRenamed("keep", "repetition_keep")
    Pii.scrub(r, "extracted")
  }

  /** [[scrubFull]]'s end-of-pipe predicate: past all three gates. */
  def survivedFull: org.apache.spark.sql.Column =
    col("markup_keep") && col("quality_keep") && col("repetition_keep")
}
