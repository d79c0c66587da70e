package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Brute-force replica of the gate semantics over raw strings. */
  private def reference(docs: Seq[(Long, String)], minCount: Int, minPct: Int)
  : Map[Long, (Long, Long, Boolean)] = {
    def bigrams(t: String): Seq[String] = {
      val ws = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
      ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val all = docs.flatMap { case (_, t) => bigrams(t) }
    val cnt = all.groupBy(identity).view.mapValues(_.size).toMap
    docs.map { case (id, t) =>
      val bs = bigrams(t)
      val hits = bs.count(cnt(_) >= minCount).toLong
      id -> ((bs.size.toLong, hits, hits * 100 >= bs.size.toLong * minPct))
    }.toMap
  }

  test("coverageGate: known corpus incl. the exact-boundary doc") {
    // Doc 4's bigrams: "a b"×2 and "b c" are corpus-common (hits),
    // "c a" and "b q" are singletons → 3 of 5 = exactly 60%, which
    // must KEEP at minPct=60 (>=, not >). Doc 5 has one word → 0/0
    // abstains-keeps.
    val docs = Seq(
      1L -> "a b c",
      2L -> "a b c",
      3L -> "a b",
      4L -> "a b c a b q",
      5L -> "solo")
    val out = NgramLm.coverageGate(docs.toDF("doc_id", "text"),
      "doc_id", "text", minCount = 2, minPct = 60)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === reference(docs, 2, 60))
    assert(out(4L) === ((5L, 3L, true)), "exact-boundary doc must keep")
    assert(out(5L) === ((0L, 0L, true)), "no-bigram doc must abstain-keep")
  }

  test("coverageGate: equals the brute-force reference on random corpora") {
    val vocab = Seq("aa", "bb", "cc", "dd", "ee")
    val docG = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for (seed <- 1L to 5L) {
      val docs = sample(Gen.listOfN(20, docG), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = NgramLm.coverageGate(docs.toDF("doc_id", "text"),
        "doc_id", "text", minCount = 3, minPct = 50)
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === reference(docs, 3, 50), s"seed=$seed")
    }
  }

  test("perplexityProxy: rarer transitions score strictly higher") {
    // docs 1 and 3 have the same transition MIX (half "a b", half
    // "b a"), just different lengths — mean NLP must be identical
    val docs = Seq(
      (1L, "a b a b a"),         // ab, ba, ab, ba
      (2L, "q z q z"),           // only rare transitions
      (3L, "a b a"))             // ab, ba
    val counts = NgramLm.bigramCounts(docs.toDF("doc_id", "text"), "text")
    val nlp = NgramLm.perplexityProxy(counts, docs.toDF("doc_id", "text"),
      "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    assert(nlp(2L) > nlp(1L), "rare-transition doc must score higher")
    assert(math.abs(nlp(1L) - nlp(3L)) < 1e-12, "same transition mix, same score")
  }
}
