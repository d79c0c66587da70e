package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Brute-force replica of the quantized top-terms contract. */
  private def reference(docs: Seq[(Long, String)], k: Int, scale: Long)
  : Map[Long, String] = {
    def words(t: String): Seq[String] = "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
    val n = docs.size.toLong
    val tf = docs.map { case (id, t) =>
      id -> words(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    docs.map { case (id, _) =>
      val scoredTerms = tf(id).toSeq.map { case (term, f) =>
        (term, f * ((scale * n) / dfreq(term)))
      }
      id -> scoredTerms.sortBy { case (term, s) => (-s, term) }
        .take(k).map(_._1).mkString(",")
    }.toMap
  }

  test("topTerms: known corpus with idf separation, ties, and a no-term doc") {
    // "rare" appears only in doc 1 → highest idf there; "common" is in
    // every doc → lowest idf; doc 3 has no [a-z]+ terms → "".
    val docs = Seq(
      1L -> "common rare rare cat",
      2L -> "common cat cat dog",
      3L -> "12345 !!!",
      4L -> "common dog")
    val out = TfIdf.topTerms(docs.toDF("doc_id", "text"), "doc_id", "text",
      k = 2).as[(Long, String)].collect().toMap
    assert(out === reference(docs, 2, 10000L))
    assert(out(3L) === "", "no-term doc must yield the empty list")
    assert(out(1L).split(",").head === "rare",
      "doc-unique term must outrank the ubiquitous one")
  }

  test("topTerms: equals the brute-force reference on random corpora") {
    // tiny vocabulary forces shared terms (idf spread), repeated terms
    // (tf > 1), and score ties (the term-asc tie-break path)
    val vocab = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    val docG = Gen.chooseNum(0, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for (seed <- 1L to 5L) {
      val docs = sample(Gen.listOfN(18, docG), seed)
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = TfIdf.topTerms(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3).as[(Long, String)].collect().toMap
      assert(got === reference(docs, 3, 10000L), s"seed=$seed")
    }
  }

  test("scored: ubiquitous terms score zero, doc-unique terms dominate") {
    val docs = Seq(
      1L -> "everywhere unique unique",
      2L -> "everywhere other",
      3L -> "everywhere third")
    val s = TfIdf.scored(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(s((1L, "everywhere")) === 0.0,
      "df == N must score exactly ln(1) = 0")
    // ulp tolerance, not exact equality: Spark's codegen'd ln and
    // scala's math.log may differ in the last bit — the documented
    // reason this face is not SQL-oracled
    assert(math.abs(s((1L, "unique")) - 2.0 * math.log(3.0)) < 1e-12,
      "tf=2, df=1, N=3 must score 2·ln(3)")
  }
}
