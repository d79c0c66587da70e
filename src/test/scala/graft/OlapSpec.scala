package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class OlapSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct(rsd=0.02) clears q30's 10% verdict line") {
    // q30's verdict line is 10% and the sketch runs at rsd=0.02, so
    // the line sits 5 sigma out — this assertion flakes with
    // probability ~3e-7, versus ~32% for the old default-rsd 5% line.
    val o = Tables(spark, sf0001, "orders")
    val (approx, exact) = o.agg(
      approx_count_distinct(col("o_custkey"), 0.02),
      countDistinct(col("o_custkey"))).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }

  test("q92: union-merged per-group HLL sketches equal the direct global sketch") {
    // the capability q92 sells: a rollup over persisted per-group
    // sketch partials gives the SAME estimate as sketching the base
    // data directly — sketch union is register-max, which commutes
    // with how the direct sketch absorbed the same hashed values, so
    // equality is exact, not approximate.
    val o = Tables(spark, sf0001, "orders")
    val merged = o.groupBy(col("o_orderpriority"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .as[Long].head()
    val direct = o.agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .as[Long].head()
    assert(merged === direct, s"merged=$merged direct=$direct")
    // and the estimate actually estimates: within q92's 10% verdict line
    val exact = o.agg(countDistinct(col("o_custkey"))).as[Long].head()
    assert(math.abs(merged - exact).toDouble / exact < 0.10,
      s"merged=$merged exact=$exact")
  }

  test("saltedJoin equals the plain join (inner and left)") {
    val big = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d"), (1, "e"))
      .toDF("k", "v")
    val small = Seq((1, "X"), (2, "Y"), (9, "Z")).toDF("k", "w")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt).select("k", "v", "w")
        .collect().map(_.toSeq).sortBy(_.toString)
      val salted = SkewJoin.saltedJoin(big, small, Seq("k"), buckets = 4, jt)
        .select("k", "v", "w")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(salted.toSeq === plain.toSeq, s"join type $jt")
    }
  }

  test("saltedJoin spreads a hot key over multiple salts") {
    val big = (1 to 1000).map(i => (42, s"row$i")).toDF("k", "v")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts >= 6, s"expected hot key spread over ~8 salts, got $salts")
  }

  test("adaptiveSaltedJoin: detects planted skew, equals the plain join either way") {
    // key 42 is hot (5000 rows), keys 1-50 are cold; key 7 is missing
    // from small (exercises the left-join null path through both branches)
    val big = ((1 to 5000).map(i => (42, s"hot$i")) ++
      (1 to 50).flatMap(k => (1 to 3).map(i => (k, s"cold$k-$i")))).toDF("k", "v")
    val small = ((42 +: (1 to 50).filter(_ != 7)).map(k => (k, s"w$k"))).toDF("k", "w")

    // detection: full-fraction sampling must find exactly the hot key
    val hot = SkewJoin.detectHotKeys(big, Seq("k"),
      hotRowThreshold = 1000, sampleFraction = 1.0)
      .as[Int].collect().toSeq
    assert(hot === Seq(42), s"hot keys: $hot")

    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt).select("k", "v", "w")
        .collect().map(_.toSeq).sortBy(_.toString)
      val adaptive = SkewJoin.adaptiveSaltedJoin(big, small, Seq("k"),
        buckets = 4, hotRowThreshold = 1000, sampleFraction = 1.0, joinType = jt)
        .select("k", "v", "w")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(adaptive.toSeq === plain.toSeq, s"join type $jt")
    }

    // uniform input: empty hot set, still equal to the plain join
    val uni = (1 to 200).map(i => (i, s"r$i")).toDF("k", "v")
    assert(SkewJoin.detectHotKeys(uni, Seq("k"), 1000, 1.0).count() === 0)
    val plainU = uni.join(small, Seq("k"), "inner").collect().map(_.toSeq).sortBy(_.toString)
    val adaptU = SkewJoin.adaptiveSaltedJoin(uni, small, Seq("k"), 4, 1000, 1.0)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(adaptU.toSeq === plainU.toSeq)
  }
}
