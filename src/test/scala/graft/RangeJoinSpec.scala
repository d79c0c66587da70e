package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binnedPointJoin equals the plain non-equi join, including boundaries") {
    val points = Seq(0.0, 49.9, 50.0, 99.9, 100.0, 930.0, 969.99, 970.0, 12345.6)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
    val intervals = Seq(
      ("a", 0.0, 50.0),      // p = 0 in; p = 50 out (half-open)
      ("b", 50.0, 100.0),    // p = 50 in here instead
      ("c", 930.0, 970.0),   // multi-bin interval
      ("d", 0.0, 100000.0),  // interval spanning MANY bins
      ("e", 200.0, 200.0))   // empty interval matches nothing
      .toDF("band", "lo", "hi")
    val got = RangeJoin.binnedPointJoin(points, intervals, "p", "lo", "hi", binWidth = 50.0)
    val want = points.join(intervals, col("p") >= col("lo") && col("p") < col("hi"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // spot-check the half-open boundary: 50.0 belongs to band b only
    val bands50 = got.filter(col("p") === 50.0).select("band").as[String].collect()
    assert(bands50.sorted.toSeq === Seq("b", "d"))
  }

  test("binnedPointJoin on real data equals q38's broadcast non-equi join") {
    val part = Tables(spark, sf001, "part")
    val bands = graft.queries.RelationalQueries.priceBands(spark)
    val got = RangeJoin.binnedPointJoin(part, bands, "p_retailprice", "lo", "hi",
      binWidth = 100.0)
      .groupBy("band").agg(count(lit(1)).as("n"))
    val want = part.join(bands,
      col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band").agg(count(lit(1)).as("n"))
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
  }

  test("the plan is a hash equi-join on buckets, not a nested loop") {
    val points = spark.range(1000).select(col("id").cast("double").as("p"))
    val intervals = spark.range(100).select(
      (col("id") * 10).cast("double").as("lo"),
      (col("id") * 10 + 10).cast("double").as("hi"))
    val plan = RangeJoin.binnedPointJoin(points, intervals, "p", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan)
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("an interval wider than the bucket guard fails loudly, not with an OOM") {
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val wide = Seq(("inf", 0.0, 1.0e12)).toDF("band", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.binnedPointJoin(points, wide, "p", "lo", "hi",
        binWidth = 1.0, maxBucketsPerInterval = 1000).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("raise binWidth")), ex.toString)
  }

  test("rejects non-positive bin widths") {
    val df = Seq((1.0, 2.0)).toDF("lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.binnedPointJoin(df, df, "lo", "lo", "hi", 0.0)
    }
  }

  test("binnedOverlapJoin equals the plain overlap join and emits each pair once") {
    import spark.implicits._
    // varied lengths (1..23 days at binWidth 5 → spans 1..5+ buckets),
    // deterministic spread over a 200-day domain
    val l = (1 to 40).map { i =>
      val lo = (i * 37) % 200; (i, lo.toLong, (lo + 1 + i % 23).toLong)
    }.toDF("l_id", "l_lo", "l_hi")
    val r = (1 to 35).map { i =>
      val lo = (i * 53) % 200; (i + 1000, lo.toLong, (lo + 1 + i % 17).toLong)
    }.toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.binnedOverlapJoin(l, r, "l_lo", "l_hi", "r_lo", "r_hi",
      binWidth = 5.0).select("l_id", "r_id")
    val want = l.join(r, col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("l_id", "r_id")
    // exactly-once: multiset equality against the plain join (a pair
    // surviving in two shared buckets would break exceptAll both ways)
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    assert(got.count() === got.distinct().count())
    assert(got.count() > 0)
  }

  test("binnedOverlapJoin: touching half-open intervals do not overlap") {
    import spark.implicits._
    val l = Seq((1, 0L, 10L)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((2, 10L, 20L), (3, 9L, 12L)).toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.binnedOverlapJoin(l, r, "l_lo", "l_hi", "r_lo", "r_hi", 4.0)
      .select("r_id").as[Int].collect()
    assert(got.toSeq === Seq(3)) // [0,10) meets [10,20) only at the open edge
  }
}
