package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pii, WebScrub}

/** Composition pins for the Markup → QualityClassifier → Pii chain —
  * each planted victim must die at ITS OWN stage, and the one bug
  * class only the composed surface can catch (entity decode changing
  * what the Pii regexes see) is pinned directly. */
class WebScrubSpec extends SparkSpec {
  import spark.implicits._

  /** Stopword-rich English that clears the learned quality filter. */
  private val GoodText = "the cat and the dog sat on the mat in the sun " +
    "and it is that good for all of us to see the light of the day"

  private def scrubOne(html: String) =
    WebScrub.scrub(Seq((1L, html)).toDF("doc_id", "html"), "html").head()

  test("a healthy page passes both gates and exits clean") {
    val r = scrubOne(s"<body><p>$GoodText</p></body>")
    assert(r.getAs[Boolean]("markup_keep"))
    assert(r.getAs[Boolean]("quality_keep"))
    assert(r.getAs[Boolean]("clean"))
    assert(r.getAs[String]("redacted") === GoodText)
  }

  test("an ad-stuffed page dies at the MARKUP stage even though its " +
      "text would pass quality") {
    val ads = Seq.fill(9)("""<a href="#">ad</a>""").mkString
    val r = scrubOne(s"<body><p>$GoodText</p>$ads</body>")
    assert(!r.getAs[Boolean]("markup_keep"), "9 links must fail the gate")
    assert(r.getAs[Boolean]("quality_keep"),
      "precondition: the text itself is quality-clean — the drop is " +
        "attributable to markup alone")
  }

  test("a gibberish page passes markup (plain text, healthy ratio) and " +
      "dies at the QUALITY stage") {
    val gib = "zqxjkwvblortch " * 40
    val r = scrubOne(s"<body><p>$gib</p></body>")
    assert(r.getAs[Boolean]("markup_keep"),
      "precondition: markup has no reason to drop it")
    assert(!r.getAs[Boolean]("quality_keep"),
      "the word-length drag must sink a 14-letter-token soup")
  }

  test("COMPOSITION: an entity-obfuscated email (j&#46;doe&#64;ex&#46;co) " +
      "is invisible to Pii on the raw html but detected+redacted after " +
      "Markup's numeric-reference decode") {
    val html = s"<body><p>$GoodText mail j&#46;doe&#64;ex&#46;co</p></body>"
    // pre-decode the obfuscated form matches NO family
    val rawEmailHits = Seq(html).toDF("text")
      .select(Pii.count(col("text"), "email")).head.getLong(0)
    assert(rawEmailHits === 0L,
      "precondition: without the decode there is nothing to find")
    val r = scrubOne(html)
    assert(r.getAs[Boolean]("markup_keep") && r.getAs[Boolean]("quality_keep"))
    assert(r.getAs[Long]("n_email") === 1L,
      "the decoded extraction must surface the email to Pii")
    assert(r.getAs[String]("redacted").endsWith("mail <EMAIL>"))
    assert(r.getAs[Boolean]("clean"))
  }

  test("survived composes the two gates; Pii redacts rather than drops") {
    val rows = Seq(
      (1L, s"<body><p>$GoodText card 4242-4242-4242-4242</p></body>"),
      (2L, "<body><p>" + ("zqxjkwvblortch " * 40) + "</p></body>"))
      .toDF("doc_id", "html")
    val out = WebScrub.scrub(rows, "html")
      .select(col("doc_id"), WebScrub.survived.as("surv"),
        col("n_cc"), col("clean"))
      .collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Boolean]("surv") && out(0).getAs[Long]("n_cc") === 1L &&
      out(0).getAs[Boolean]("clean"))
    assert(!out(1).getAs[Boolean]("surv"))
  }
}
