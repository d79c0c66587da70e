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

  test("malformed sketch arrays answer NULL, never garbage or a crash") {
    // any array<bigint> passes the type check, so the header is only
    // trustworthy at runtime: truncated grid, absurd d/w, empty array
    val cases = Seq(
      "array(4L, 1024L, 0L)",             // header only, no cells
      "array(4L, 1024L, 0L, 1L, 2L)",     // grid shorter than d*w
      "array(-1L, 64L, 0L)",              // negative depth
      "array(2L, 9999999999L, 0L)",       // width over the sketch bound
      "array()",                          // empty
      "array(1L)")                        // shorter than the header
    cases.foreach { a =>
      val r = spark.sql(s"SELECT cms_estimate(CAST($a AS ARRAY<BIGINT>), 'x')").head
      assert(r.isNullAt(0), s"expected NULL for $a")
    }
    // a well-formed hand-built array still answers: 1 row, width 8,
    // all cells 7 → estimate is 7 whatever the bucket
    val ok = spark.sql(
      "SELECT cms_estimate(array(1L, 8L, 56L, 7L, 7L, 7L, 7L, 7L, 7L, 7L, 7L), 'x')")
      .head.getLong(0)
    assert(ok == 7L)
  }

  test("rejects non-string values and unbounded shapes at analysis") {
    val df = Seq(1, 2).toDF("n")
    intercept[Exception] { df.agg(CmsSketch.cms(col("n"), 4, 128)).collect() }
    intercept[Exception] {
      df.selectExpr("cms_sketch(CAST(n AS STRING), 0, 128)").collect()
    }
  }
}
