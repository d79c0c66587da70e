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

  private def scrubFullOne(html: String) =
    WebScrub.scrubFull(Seq((1L, html)).toDF("doc_id", "html"), "html").head()

  test("scrubFull: a stopword-rich LOOPING page passes markup and the " +
      "learned filter and dies at the REPETITION stage — its own victim") {
    val loop = "and then it was all over again " * 30
    val r = scrubFullOne(s"<body><p>$loop</p></body>")
    assert(r.getAs[Boolean]("markup_keep"),
      "precondition: plain text, healthy ratio")
    assert(r.getAs[Boolean]("quality_keep"),
      "precondition: dense stopwords + short words — the vocabulary-class " +
        "scorer has no reason to drop it; only the loop signal can")
    assert(!r.getAs[Boolean]("repetition_keep"))
  }

  test("COMPOSITION: the repetition verdict is DECIMAL-REF-DECODE-" +
      "INVARIANT — a decimal ref's raw bytes are letter-free AND its " +
      "full-chain decode is letter-free, so an `&#46;`-obfuscated loop " +
      "cannot hide, decoded or not; hex refs (literal 'x') and NAMED " +
      "entities (raw 'amp'/'lt' words) are the NON-invariant cases the " +
      "decode exists to clean up") {
    val hasLetter = (s: String) =>
      s.exists(c => c >= 'a' && c <= 'z' || c >= 'A' && c <= 'Z')
    // the structural proof, on the OPERATOR (not the raw table — the
    // amp-normalization entries decode through an intermediate
    // '&amp;' that carries letters but never survives the chain):
    // a decimal ref's raw key and its full-chain decode are BOTH
    // letter-free, so the [a-z]+ word stream is identical either way
    val decimalKeys = graft.operators.Markup.Entities.map(_._1)
      .filter(_.matches("&#[0-9]+;"))
    assert(decimalKeys.nonEmpty)
    val decodedKeys = decimalKeys.toDF("k")
      .select(graft.operators.Markup.decodeEntities(col("k")).as("v"))
      .as[String].collect()
    decimalKeys.zip(decodedKeys).foreach { case (k, v) =>
      assert(!hasLetter(k), s"decimal ref $k raw form carries a letter")
      assert(!hasLetter(v),
        s"decimal ref $k decodes to '$v' which contains a letter — the " +
          "invariance proof (and this pin) no longer holds; add a " +
          "raw-vs-decoded verdict test for the letter path")
    }
    // the NON-invariant cases, pinned so the asymmetry stays visible:
    // '&#x27;' raw leaks a literal 'x' word and '&amp;' raw carries
    // 'amp' — both vanish on decode, one more reason the repetition
    // filter must read the DECODED extraction
    assert(hasLetter("&#x27;") && hasLetter("&amp;"))
    val named = Seq("x &amp; y").toDF("t")
      .select(graft.operators.Markup.decodeEntities(col("t")).as("v"))
      .as[String].head()
    assert(named === "x & y")
    // and the verdict-level demonstration on the q170 plant shape
    val obf = "spam&#46;ham&#46;jam " * 25
    val decoded = graft.operators.Markup.decodeEntities(lit(obf))
    val both = Seq(obf).toDF("raw")
      .select(col("raw"), decoded.as("dec"))
    val vRaw = graft.operators.Repetition
      .annotate(both.select(col("raw").as("text")), "text")
      .select("dup2_q20", "keep").head()
    val vDec = graft.operators.Repetition
      .annotate(both.select(col("dec").as("text")), "text")
      .select("dup2_q20", "keep").head()
    assert(vRaw === vDec, "raw and decoded verdicts must be identical")
    assert(!vRaw.getAs[Boolean]("keep"), "and the loop IS caught")
  }

  test("COMPOSITION: strip-BEFORE-repetition is load-bearing — the q170 " +
      "list block's tag scaffolding loops in raw markup while its " +
      "visible text does not: a repetition filter reading raw html " +
      "false-drops the page; reading the extracted text it survives") {
    val listBlock = graft.queries.WebScrubQueries.ListBlock
    // raw markup: `li`/`id` scaffolding words repeat 12x
    val vRaw = graft.operators.Repetition
      .annotate(Seq(listBlock).toDF("text"), "text")
      .select("keep").head().getBoolean(0)
    assert(!vRaw, "precondition: the raw block must read as a loop")
    // the composed chain strips tags first: the page survives all gates
    val r = scrubFullOne(
      s"<body><p>$GoodText</p>$listBlock</body>")
    assert(r.getAs[Boolean]("markup_keep") &&
      r.getAs[Boolean]("quality_keep") &&
      r.getAs[Boolean]("repetition_keep"),
      "the extracted text (24 distinct words) has no loop — dropping it " +
        "would be the raw-markup bug this pin exists to catch")
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
