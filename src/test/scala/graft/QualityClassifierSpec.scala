package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityClassifier
import graft.operators.QualityClassifier._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def scoreOne(text: String) =
    QualityClassifier.score(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .head()

  test("score replays the frozen dot product on a hand case") {
    // 6 ws-tokens; words: the,cat,sat,on,the,mat (char sum 17);
    // stopword hits: the×2 + on ("on" is in the en list) = 3 (en) +
    // 0 others; no punctuation
    val r = scoreOne("the cat sat on the mat")
    val cTokens = WTokens * 6
    val cStop = WStop * (3L * 1048576L / 6L)
    val cWlen = WWlen * (17L * 131072L / 6L)
    assert(r.getAs[Long]("c_tokens") === cTokens)
    assert(r.getAs[Long]("c_punct") === 0L)
    assert(r.getAs[Long]("c_stop") === cStop)
    assert(r.getAs[Long]("c_wlen") === cWlen)
    assert(r.getAs[Long]("score") === Bias + cTokens + cStop + cWlen)
  }

  test("punctuation soup drags the score: the punct weight fires even " +
      "though the house corpus never exercises it") {
    val clean = scoreOne("the quick brown fox jumps over the lazy dog")
    val soup = scoreOne("the!! quick@@ brown## fox$$ jumps%% over^^ the&& lazy** dog!!")
    assert(soup.getAs[Long]("c_punct") < 0L)
    assert(soup.getAs[Long]("score") < clean.getAs[Long]("score"))
  }

  test("token cap bounds the length signal: 300 tokens score the length " +
      "signal of 256") {
    val many = scoreOne(Seq.fill(300)("the").mkString(" "))
    assert(many.getAs[Long]("c_tokens") === WTokens * TokenCap)
  }

  test("degenerate rows: empty text and no-letter text score finite and drop") {
    val empty = scoreOne("")
    assert(empty.getAs[Long]("c_tokens") === 0L &&
      empty.getAs[Long]("c_stop") === 0L && empty.getAs[Long]("c_wlen") === 0L)
    assert(!empty.getAs[Boolean]("keep"))
    val digits = scoreOne("12345 67890")
    assert(digits.getAs[Long]("c_stop") === 0L &&
      digits.getAs[Long]("c_wlen") === 0L)
    assert(!digits.getAs[Boolean]("keep"))
  }

  test("both verdict classes are populated on the corpus (the q165 oracle " +
      "exercises both branches) and keep tracks score >= 0 exactly") {
    val scored = QualityClassifier.score(
      Tables(spark, sf001, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("text")), "text")
    val agg = scored.agg(
      sum(when(col("keep"), 1L).otherwise(0L)),
      count(lit(1)),
      sum(when(col("keep") =!= (col("score") >= 0L), 1L).otherwise(0L))).head()
    val (kept, total, disagree) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    assert(disagree === 0L)
    assert(kept > 0L && kept < total, s"degenerate split: $kept/$total")
  }
}
