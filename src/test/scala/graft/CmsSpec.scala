package graft

import org.apache.spark.sql.functions._

import graft.expressions.{CmsEstimate, CmsSketch}

/** Count-Min Sketch aggregate + point-query expression. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("estimates never undercount and are exact without collisions") {
    // 3 keys, far fewer than width=1024 cells: collisions are possible
    // only if two keys share ALL 4 row buckets — astronomically
    // unlikely and, with fixed seeds, deterministically absent here.
    val df = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++ Seq.fill(3)("c")).toDF("w")
    val sk = df.agg(CmsSketch.cms(col("w"), 4, 1024).as("sk"))
    val got = Seq("a", "b", "c", "zz").toDF("w")
      .join(broadcast(sk))
      .select(col("w"), CmsEstimate.estimate(col("sk"), col("w")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 50L && got("b") == 20L && got("c") == 3L)
    assert(got("zz") == 0L) // absent key, no colliding mass
  }

  test("merge is cell-wise: sketch of the union == merged partial sketches") {
    val whole = (1 to 400).map(i => s"k${i % 37}").toDF("w")
      .agg(CmsSketch.cms(col("w"), 4, 256)).head.getSeq[Long](0)
    val split = (1 to 400).map(i => s"k${i % 37}").toDF("w")
      .repartition(7) // different partials, same merged grid
      .agg(CmsSketch.cms(col("w"), 4, 256)).head.getSeq[Long](0)
    assert(whole == split,
      "CMS must be partition-invariant (linear sketch)")
  }

  test("header carries [depth, width, total]; nulls are skipped") {
    val sk = Seq(Some("x"), None, Some("y"), Some("x")).toDF("w")
      .agg(CmsSketch.cms(col("w"), 2, 64)).head.getSeq[Long](0)
    assert(sk(0) == 2L && sk(1) == 64L && sk(2) == 3L)
    assert(sk.length == 3 + 2 * 64)
  }

  test("SQL-string invocation matches the Column API (registry parity)") {
    val df = Seq("p", "q", "p").toDF("w")
    df.createOrReplaceTempView("cms_in")
    val viaSql = spark.sql(
      "SELECT cms_estimate(sk, 'p') FROM (SELECT cms_sketch(w, 4, 128) AS sk FROM cms_in)")
      .head.getLong(0)
    assert(viaSql == 2L)
  }

  test("rejects non-string values and unbounded shapes at analysis") {
    val df = Seq(1, 2).toDF("n")
    intercept[Exception] { df.agg(CmsSketch.cms(col("n"), 4, 128)).collect() }
    intercept[Exception] {
      df.selectExpr("cms_sketch(CAST(n AS STRING), 0, 128)").collect()
    }
  }
}
