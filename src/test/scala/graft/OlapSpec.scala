package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class OlapSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val o = Tables(spark, sf0001, "orders")
    val (approx, exact) = o.agg(
      approx_count_distinct(col("o_custkey")),
      countDistinct(col("o_custkey"))).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
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
}
