package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** Brute-force replica of the quantized ranking contract. */
  private def reference(docs: Seq[(Long, String)], query: Seq[String], k: Int,
                        idfScale: Long = 10000L, fracScale: Long = 1000000L)
  : Seq[(Int, Long, Long)] = {
    def words(s: String): Seq[String] = "[a-z]+".r.findAllIn(s.toLowerCase).toSeq
    val n = docs.size.toLong
    val dls = docs.map { case (id, s) => id -> words(s).size.toLong }.toMap
    val t = dls.values.sum
    val tf = docs.map { case (id, s) =>
      id -> words(s).filter(query.contains)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val scores = tf.toSeq.flatMap { case (id, m) =>
      if (m.isEmpty) None else Some(id -> m.map { case (term, f) =>
        ((idfScale * n) / dfreq(term)) *
          ((fracScale * 22L * t * f) / (10L * t * f + 3L * t + 9L * dls(id) * n))
      }.sum)
    }
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (i + 1, id, s) }
  }

  test("rank: known corpus — tf saturation, idf separation, length norm") {
    val docs = Seq(
      1L -> "spark spark spark spark engine",  // high tf, short
      2L -> "spark engine engine",             // one hit each
      3L -> "engine engine engine pad pad pad pad pad pad pad", // no spark, long
      4L -> "pad pad pad")                     // no query terms at all
    val query = Seq("spark", "engine")
    val got = Bm25.rank(docs.toDF("doc_id", "text"), "doc_id", "text",
      query, k = 3).as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === reference(docs, query, 3))
    assert(!got.exists(_._2 == 4L), "doc with no query terms must not rank")
    assert(got.head._2 == 1L,
      "highest-tf doc for the rarer term must rank first")
  }

  test("rank: equals the brute-force reference on random corpora") {
    // small vocabulary ⇒ real tf spread, shared terms, score ties (the
    // doc-id tie-break), and docs with zero query-term hits
    val vocab = Seq("aa", "bb", "cc", "dd", "ee")
    val docG = Gen.chooseNum(1, 12).flatMap(m =>
      Gen.listOfN(m, Gen.oneOf(vocab)).map(_.mkString(" ")))
    for (seed <- 1L to 5L) {
      val docs = sample(Gen.listOfN(20, docG), seed)
        .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val got = Bm25.rank(docs.toDF("doc_id", "text"), "doc_id", "text",
        Seq("aa", "cc"), k = 6).as[(Int, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got === reference(docs, Seq("aa", "cc"), 6), s"seed=$seed")
    }
  }

  test("scoredLn: longer doc scores lower at equal tf; absent term contributes 0") {
    val docs = Seq(
      1L -> "hit pad",
      2L -> "hit pad pad pad pad pad pad pad",
      3L -> "pad pad")
    val s = Bm25.scoredLn(docs.toDF("doc_id", "text"), "doc_id", "text",
      Seq("hit")).as[(Long, Double)].collect().toMap
    assert(s(1L) > s(2L), "length normalization must penalize the longer doc")
    assert(!s.contains(3L), "doc without the term has no score row")
  }
}
