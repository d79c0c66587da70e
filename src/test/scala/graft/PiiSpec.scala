package graft

import org.apache.spark.sql.functions._

import graft.operators.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  /** One canonical example per family — the cross-matrix below feeds
    * each into every OTHER family's pattern. */
  private val examples = Map(
    "email" -> "jane.doe+spam@mail.example.org",
    "cc" -> "4242 4242 4242 4242",
    "ssn" -> "123-45-6789",
    "phone" -> "555-010-1234",
    "ip" -> "10.0.35.12")

  private def scrubOne(text: String) =
    Pii.scrub(Seq((1L, text)).toDF("doc_id", "text"), "text").head()

  test("each family detects its canonical example exactly once and " +
      "redacts to its placeholder") {
    for ((fam, ex) <- examples) {
      val r = scrubOne(s"before $ex after")
      assert(r.getAs[Long](s"n_$fam") === 1L, s"$fam missed: $ex")
      assert(r.getAs[String]("redacted").contains(
        Pii.Patterns.find(_._1 == fam).get._3), s"$fam not redacted")
      assert(r.getAs[Boolean]("clean"), s"$fam left residue")
    }
  }

  test("cross-matrix: no family's pattern fires inside another family's " +
      "example — redaction order cannot change WHAT is redacted") {
    val rows = examples.toSeq.map { case (fam, ex) => (fam, ex) }
      .toDF("fam", "text")
    val counted = Pii.Patterns.foldLeft(rows) { case (d, (f, _, _)) =>
      d.withColumn(s"n_$f", Pii.count(col("text"), f))
    }.collect()
    for (r <- counted; (f, _, _) <- Pii.Patterns) {
      val expected = if (r.getAs[String]("fam") == f) 1L else 0L
      assert(r.getAs[Long](s"n_$f") === expected,
        s"pattern $f fired ${r.getAs[Long](s"n_$f")}x inside the " +
          s"${r.getAs[String]("fam")} example")
    }
  }

  test("a kitchen-sink row counts every family and comes back clean") {
    val text = "call 555-010-1234 or jane@ex.co from 10.0.0.1 " +
      "card 4242 4242 4242 4242 ssn 123-45-6789 twice: 999-88-7777"
    val r = scrubOne(text)
    assert(r.getAs[Long]("n_phone") === 1L && r.getAs[Long]("n_email") === 1L &&
      r.getAs[Long]("n_ip") === 1L && r.getAs[Long]("n_cc") === 1L &&
      r.getAs[Long]("n_ssn") === 2L)
    val red = r.getAs[String]("redacted")
    assert(red === "call <PHONE> or <EMAIL> from <IP> card <CC> " +
      "ssn <SSN> twice: <SSN>")
    assert(r.getAs[Boolean]("clean"))
  }

  test("clean text passes through untouched with zero counts") {
    val r = scrubOne("nothing sensitive here just words and 1234 numbers")
    assert(Pii.Patterns.forall { case (f, _, _) => r.getAs[Long](s"n_$f") === 0L })
    assert(r.getAs[String]("redacted") ===
      "nothing sensitive here just words and 1234 numbers")
    assert(r.getAs[Boolean]("clean"))
  }
}
