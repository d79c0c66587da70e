package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  /** One example per SHAPE (family, text) — the cross-matrix below
    * feeds each into every OTHER family's pattern. Every example here
    * must match exactly its own family once and no other family (the
    * one documented overlap — dotted `+1` phone vs ip — is pinned in
    * its own test below, NOT admitted to this matrix). */
  private val examples: Seq[(String, String)] = Seq(
    "email" -> "jane.doe+spam@mail.example.org",
    "email" -> "John.Doe+Spam@Example.COM",        // r15 review: mixed case
    "cc" -> "4242 4242 4242 4242",
    "cc" -> "4242-4242-4242-4242",                 // r15 review: hyphenated
    "cc" -> "4242424242424242",                    // r15 review: contiguous
    "ssn" -> "123-45-6789",
    "phone" -> "555-010-1234",
    "phone" -> "(555) 010-1234",                   // r15 review: paren
    "phone" -> "555.010.1234",                     // r15 review: dotted
    "phone" -> "+1 555-010-1234",                  // r15 review: country code
    "ip" -> "10.0.35.12")

  private def scrubOne(text: String) =
    Pii.scrub(Seq((1L, text)).toDF("doc_id", "text"), "text").head()

  test("each shape detects as its family exactly once and redacts to " +
      "the family placeholder") {
    for ((fam, ex) <- examples) {
      val r = scrubOne(s"before $ex after")
      assert(r.getAs[Long](s"n_$fam") === 1L, s"$fam missed: $ex")
      assert(r.getAs[String]("redacted").contains(
        Pii.Patterns.find(_._1 == fam).get._3), s"$fam not redacted: $ex")
      assert(r.getAs[Boolean]("clean"), s"$fam left residue: $ex")
    }
  }

  test("cross-matrix: no family's pattern fires inside another family's " +
      "example — redaction order cannot change WHAT is redacted") {
    val rows = examples.toDF("fam", "text")
    val counted = Pii.Patterns.foldLeft(rows) { case (d, (f, _, _)) =>
      d.withColumn(s"n_$f", Pii.count(col("text"), f))
    }.collect()
    for (r <- counted; (f, _, _) <- Pii.Patterns) {
      val expected = if (r.getAs[String]("fam") == f) 1L else 0L
      assert(r.getAs[Long](s"n_$f") === expected,
        s"pattern $f fired ${r.getAs[Long](s"n_$f")}x inside the " +
          s"${r.getAs[String]("fam")} example '${r.getAs[String]("text")}'")
    }
  }

  test("the ONE documented overlap: a dotted +1 phone contains an " +
      "IPv4-shaped substring — both families COUNT on raw text, but " +
      "phone-before-ip order redacts it once and clean holds") {
    val r = scrubOne("dial +1.555.010.1234 now")
    assert(r.getAs[Long]("n_phone") === 1L)
    assert(r.getAs[Long]("n_ip") === 1L,
      "the raw-count monitoring artifact the operator doc promises")
    assert(r.getAs[String]("redacted") === "dial <PHONE> now")
    assert(r.getAs[Boolean]("clean"))
  }

  test("pre-widening escapes are now caught: mixed-case email and " +
      "hyphenated cc were invisible to the r15 patterns, clean=false " +
      "pre-redaction") {
    val text = "write John.Doe@Example.COM card 4242-4242-4242-4242"
    // pre-redaction the text is NOT clean (the r15 false-compliance bug)
    val rawClean = Seq(text).toDF("text")
      .select(Pii.clean(col("text"))).head.getBoolean(0)
    assert(!rawClean, "widened families must see the mixed-case/hyphenated PII")
    val r = scrubOne(text)
    assert(r.getAs[Long]("n_email") === 1L && r.getAs[Long]("n_cc") === 1L)
    assert(r.getAs[String]("redacted") === "write <EMAIL> card <CC>")
    assert(r.getAs[Boolean]("clean"))
  }

  test("a kitchen-sink row counts every family and comes back clean") {
    val text = "call (555) 010-1234 or jane@ex.co from 10.0.0.1 " +
      "card 4242424242424242 ssn 123-45-6789 twice: 999-88-7777"
    val r = scrubOne(text)
    assert(r.getAs[Long]("n_phone") === 1L && r.getAs[Long]("n_email") === 1L &&
      r.getAs[Long]("n_ip") === 1L && r.getAs[Long]("n_cc") === 1L &&
      r.getAs[Long]("n_ssn") === 2L)
    val red = r.getAs[String]("redacted")
    assert(red === "call <PHONE> or <EMAIL> from <IP> card <CC> " +
      "ssn <SSN> twice: <SSN>")
    assert(r.getAs[Boolean]("clean"))
  }

  test("cc recall asymmetry is pinned: the contiguous-16 alternative " +
      "over-matches inside a 17-digit order id — the DELIBERATE " +
      "recall-over-precision stance documented at Pii.Patterns") {
    // a leaked card is a compliance incident, so cc redaction accepts
    // mangling the odd long numeric blob; this pin keeps the trade-off
    // visible (flipping it to precision would fail here, loudly)
    val r = scrubOne("order 12345678901234567 total 99")
    assert(r.getAs[Long]("n_cc") === 1L)
    assert(r.getAs[String]("redacted") === "order <CC>7 total 99")
    assert(r.getAs[Boolean]("clean"))
  }

  test("clean text passes through untouched with zero counts — bare " +
      "10-digit runs and dates stay out of scope by design") {
    val r = scrubOne("order 5551234567 shipped 2026-08-16 qty 1234")
    assert(Pii.Patterns.forall { case (f, _, _) => r.getAs[Long](s"n_$f") === 0L })
    assert(r.getAs[String]("redacted") ===
      "order 5551234567 shipped 2026-08-16 qty 1234")
    assert(r.getAs[Boolean]("clean"))
  }
}
