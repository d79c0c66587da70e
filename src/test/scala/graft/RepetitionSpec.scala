package graft

import graft.operators.Repetition

/** Hand-computed exactness for the Gopher-style repetition signals —
  * the q20 integers are the contract both engines must replay. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) =
    Repetition.annotate(Seq((1L, text)).toDF("doc_id", "text"), "text").head()

  test("alternating loop 'a b a b a b': every signal hand-replayed") {
    val r = one("a b a b a b")
    // g2 = 5 grams, 2 distinct -> (3*2^20) div 5
    assert(r.getAs[Long]("dup2_q20") === 3L * 1048576L / 5L)
    // g3 = 4 grams, 2 distinct
    assert(r.getAs[Long]("dup3_q20") === 2L * 1048576L / 4L)
    // g4 = 3 grams, 2 distinct
    assert(r.getAs[Long]("dup4_q20") === 1048576L / 3L)
    // 'a b' occurs 3 of 5
    assert(r.getAs[Long]("top2_q20") === 3L * 1048576L / 5L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("the classic loop page drops: punctuation and case fold away " +
      "before the grams") {
    val r = one("Stop! Stop! Stop! Stop! Stop!")
    // ws = [stop x5]; g2 = ['stop stop' x4], 1 distinct
    assert(r.getAs[Long]("dup2_q20") === 3L * 1048576L / 4L)
    assert(r.getAs[Long]("top2_q20") === 1048576L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("unique prose passes with all-zero signals — a unique bigram is " +
      "not repetition (no spurious 1/total floor on short docs)") {
    for (t <- Seq("the quick brown fox jumps over the lazy dog today",
                  "red fox", "a", "", "1234 !!!")) {
      val r = one(t)
      assert(r.getAs[Long]("dup3_q20") === 0L, s"dup3 on '$t'")
      assert(r.getAs[Long]("dup4_q20") === 0L, s"dup4 on '$t'")
      assert(r.getAs[Long]("top2_q20") === 0L ||
        r.getAs[Boolean]("keep"), s"top2 on '$t'")
      assert(r.getAs[Boolean]("keep"), s"'$t' must pass")
    }
  }

  test("the q168 plant shape — a healthy doc with a 30x-repeated " +
      "trigram tail — drops even after dilution") {
    val healthy = "many different words appear exactly once in this " +
      "perfectly ordinary document about nothing in particular"
    val r = one(healthy + " " + "spam ham jam " * 30)
    assert(!r.getAs[Boolean]("keep"))
    assert(r.getAs[Long]("dup2_q20") > Repetition.Dup2MaxQ20)
  }

  test("thresholds are the frozen q20 constants adapted from Gopher's " +
      "top n-gram fractions (applied as gram-count duplicate fractions)") {
    assert(Repetition.Dup2MaxQ20 === (0.20 * (1 << 20)).toLong &&
      Repetition.Dup3MaxQ20 === 188743L && Repetition.Dup4MaxQ20 === 167772L &&
      Repetition.Top2MaxQ20 === 209715L)
  }
}
