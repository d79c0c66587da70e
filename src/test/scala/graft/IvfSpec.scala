package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf0001, "embeddings")

  test("cellOf partitions the corpus; probeCells(1) head equals cellOf") {
    val model = Ivf.fit(emb, "embedding", nlist = 8)
    assert(model.nlist === 8)
    val cells = emb.select(
      Ivf.cellOf(col("embedding"), model).as("c"),
      Ivf.probeCells(col("embedding"), model, 1)(0).as("p"))
    assert(cells.filter(col("c") =!= col("p")).count() === 0)
    val n = cells.select("c").distinct().count()
    assert(n >= 4, s"kmeans collapsed to $n cells")
  }

  test("IVF topK recall vs exact brute force is high at nprobe=3/8") {
    val model = Ivf.fit(emb, "embedding", nlist = 8)
    val queries = emb.filter(col("vec_id") < 15)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val approx = Ivf.topK(emb, queries, model, "vec_id", "embedding", 5, nprobe = 3)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@5 = $recall")
    // determinism: same seed, same result
    val model2 = Ivf.fit(emb, "embedding", nlist = 8)
    val approx2 = Ivf.topK(emb, queries, model2, "vec_id", "embedding", 5, nprobe = 3)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(approx === approx2)
  }

  test("sampled fit (the 100 TB contract) matches full-fit recall") {
    val queries = emb.filter(col("vec_id") < 15)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    def recallOf(frac: Double): Double = {
      val m = Ivf.fit(emb, "embedding", nlist = 8, sampleFraction = frac)
      val approx = Ivf.topK(emb, queries, m, "vec_id", "embedding", 5, nprobe = 3)
        .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val full = recallOf(1.0)
    val sampled = recallOf(0.5)
    assert(sampled >= full - 0.15, s"sampled-fit recall $sampled vs full $full")
    assertThrows[IllegalArgumentException](
      Ivf.fit(emb, "embedding", nlist = 8, sampleFraction = 0.0))
  }
}
