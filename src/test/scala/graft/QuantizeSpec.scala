package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quantize, Similarity}

/** Scalar int8-range embedding quantization. Key properties: codes
  * stay in [0, 255], reconstruction error respects the half-step
  * bound, the whole pipeline is deterministic under repartitioning,
  * and quantized-scan + exact re-rank recovers the exact top-1.
  */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables(spark, sf001, "embeddings")

  test("bounds: per-dimension arrays equal the exploded min/max, in dimension order") {
    val b = Quantize.bounds(emb, "embedding").head()
    val lo = b.getSeq[Double](0)
    val hi = b.getSeq[Double](1)
    val want = emb.select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy(col("d"))
      .as[(Int, Double, Double)].collect()
    assert(lo.length === want.length && hi.length === want.length)
    want.foreach { case (d, mn, mx) =>
      assert(lo(d) === mn && hi(d) === mx, s"dim $d")
    }
  }

  test("codes are in [0, 255] and reconstruction error is within half a step per dimension") {
    val q = Quantize.quantized(emb, "embedding")
    val checked = q.select(
      forall(col("codes"), c => c >= 0L && c <= 255L).as("range_ok"),
      forall(zip_with(col("embedding"),
        zip_with(Quantize.decode(col("codes"), col("__lo"), col("__hi")),
          zip_with(col("__lo"), col("__hi"),
            (l, h) => (h - l) / lit(510.0) * lit(1.2) + lit(1e-12)),
          (r, b) => struct(r.as("r"), b.as("b"))),
        (x, rb) => abs(x.cast("double") - rb.getField("r")) <= rb.getField("b")),
        identity).as("err_ok"))
    assert(checked.filter(!col("range_ok") || !col("err_ok")).count() === 0L)
    assert(checked.count() > 0)
  }

  test("degenerate (constant) dimensions encode to 0 and reconstruct exactly") {
    val df = Seq((1L, Seq(3.0f, 1.0f)), (2L, Seq(3.0f, 2.0f))).toDF("id", "v")
    val q = Quantize.quantized(df, "v")
      .select(col("id"), col("codes"),
        Quantize.decode(col("codes"), col("__lo"), col("__hi")).as("r"))
      .as[(Long, Seq[Long], Seq[Double])].collect().sortBy(_._1)
    assert(q(0)._2(0) === 0L && q(1)._2(0) === 0L) // dim 1 constant
    assert(q(0)._3(0) === 3.0 && q(1)._3(0) === 3.0)
    assert(q(0)._2(1) === 0L && q(1)._2(1) === 255L) // dim 2 spans [1, 2]
  }

  test("deterministic: identical codes under any repartitioning") {
    def run(parts: Int) = Quantize
      .quantized(emb.repartition(parts), "embedding")
      .select(col("vec_id"), col("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    val one = run(1)
    assert(run(13) === one)
  }

  test("quantized scan + exact re-rank recovers the exact top-1 neighbor") {
    // search on reconstructed (4x-smaller) vectors for top-10
    // candidates, then re-rank ONLY those with exact vectors — the
    // two-stage shape; top-1 must equal the exact brute-force top-1
    val q = Quantize.quantized(emb, "embedding")
      .select(col("vec_id"),
        Quantize.decode(col("codes"), col("__lo"), col("__hi"))
          .cast("array<float>").as("embedding"))
    val queries = emb.filter(col("vec_id") < 10).select("vec_id", "embedding")
    val cand = Similarity.bruteForceTopK(q, queries.select(col("vec_id"),
      col("embedding")), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    val exact = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv"))
    val reranked = cand.join(exact, "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("nv"), col("qv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    val got = reranked.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val want = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 1)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got.size === 10)
  }
}
