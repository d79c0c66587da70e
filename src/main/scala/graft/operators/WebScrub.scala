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
}
