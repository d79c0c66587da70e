package graft

import org.apache.spark.sql.functions._

import graft.expressions.TopKStrings

/** The native mergeable grouped top-k aggregate. Key properties: the
  * result is a pure function of each group's multiset — identical
  * under any partitioning/merge order (the total (ord desc, payload
  * asc) ranking leaves the heap no discretion) — and equals the window
  * row_number definition it replaces.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topk equals the window row_number definition on real data") {
    val li = Tables(spark, sf001, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("o"),
        lpad(col("l_orderkey").cast("string"), 10, "0").as("p"))
    val got = li.groupBy(col("g"))
      .agg(TopKStrings.topk(col("o"), col("p"), 8).as("top"))
      .as[(String, Seq[String])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("o").desc, col("p"))
    val want = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .groupBy(col("g"))
      // collect in rank order: sort_array over (rn, p) structs
      .agg(transform(sort_array(collect_list(struct(col("rn"), col("p")))),
        e => e.getField("p")).as("top"))
      .as[(String, Seq[String])].collect().toMap
    assert(got === want)
    assert(got.nonEmpty && got.values.forall(_.length === 8))
  }

  test("partition-invariant: identical result for any repartitioning") {
    val base = Tables(spark, sf001, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("o"),
        lpad(col("l_orderkey").cast("string"), 10, "0").as("p"))
    def run(parts: Int) = base.repartition(parts).groupBy(col("g"))
      .agg(TopKStrings.topk(col("o"), col("p"), 5).as("top"))
      .as[(String, Seq[String])].collect().toMap
    val one = run(1)
    assert(run(7) === one)
    assert(run(32) === one)
  }

  test("ties break by payload asc; duplicate (ord, payload) rows each take a slot") {
    // g1: ties at ord=2 -> payload order decides; a duplicate (2, "b")
    // occupies two of the three slots, exactly like the window form
    val df = Seq(("g1", 2L, "b"), ("g1", 2L, "b"), ("g1", 2L, "a"),
      ("g1", 1L, "z"), ("g2", 5L, "x")).toDF("g", "o", "p")
    val got = df.groupBy(col("g"))
      .agg(TopKStrings.topk(col("o"), col("p"), 3).as("top"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("g1") === Seq("a", "b", "b"))
    assert(got("g2") === Seq("x"))
  }

  test("non-BMP ties break in UTF8String binary order, matching the window form") {
    // U+1F600 (GRINNING FACE, supplementary plane, 4-byte UTF-8) vs
    // U+FF01 (FULLWIDTH !, 3-byte UTF-8) at EQUAL ord: code-point
    // order puts U+FF01 first, but Java UTF-16 code-unit order puts
    // the surrogate pair (D83D DE00) first — the two orders DISAGREE
    // here, so this pins that the aggregate uses Spark's binary
    // StringType order, not String.compareTo.
    val emoji = "😀" // U+1F600
    val fullw = "！"       // U+FF01
    assert(emoji.compareTo(fullw) < 0, "precondition: UTF-16 order disagrees")
    val df = Seq(("g", 7L, emoji), ("g", 7L, fullw), ("g", 1L, "loser"))
      .toDF("g", "o", "p")
    val got = df.groupBy(col("g"))
      .agg(TopKStrings.topk(col("o"), col("p"), 2).as("top"))
      .as[(String, Seq[String])].collect().toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("o").desc, col("p"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("g"))
      .agg(transform(sort_array(collect_list(struct(col("rn"), col("p")))),
        e => e.getField("p")).as("top"))
      .as[(String, Seq[String])].collect().toMap
    assert(got === want)
    assert(got("g") === Seq(fullw, emoji)) // code-point order, not UTF-16
  }

  test("non-integral ordinal dtypes are rejected at analysis, not truncated") {
    val df = Seq(("g", 1.5, "a")).toDF("g", "o", "p")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("g"))
        .agg(TopKStrings.topk(col("o"), col("p"), 2).as("top"))
        .collect()
    }
    assert(e.getMessage.contains("INTEGRAL"))
  }

  test("null ord or payload rows are skipped; under-full groups return what exists") {
    val df = Seq(("g", Some(3L), Some("a")), ("g", None, Some("skip")),
      ("g", Some(9L), None), ("g", Some(1L), Some("b")))
      .toDF("g", "o", "p")
    val got = df.groupBy(col("g"))
      .agg(TopKStrings.topk(col("o"), col("p"), 10).as("top"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("g") === Seq("a", "b"))
  }

  test("deterministic per-group sampling: rank by xxhash64, stable across partitionings") {
    val docs = Tables(spark, sf001, "documents").select(col("doc_id"), col("source"))
    def sample(parts: Int) = docs.repartition(parts)
      .groupBy(col("source"))
      .agg(TopKStrings.topk(xxhash64(col("doc_id")),
        col("doc_id").cast("string"), 4).as("picks"))
      .as[(String, Seq[String])].collect().toMap
    val one = sample(1)
    assert(sample(13) === one)
    assert(one.values.forall(_.length === 4))
    // distinct picks per group (hash ties across distinct ids are
    // broken by payload, duplicates can only come from duplicate rows)
    assert(one.values.forall(v => v.distinct.length === v.length))
  }

  test("SQL surface: topk_str callable after GraftExtensions registration") {
    Tables(spark, sf001, "lineitem").createOrReplaceTempView("topk_li")
    val r = spark.sql(
      """SELECT l_linestatus,
        |       topk_str(CAST(l_quantity AS LONG),
        |                CAST(l_orderkey AS STRING), 2) AS top
        |FROM topk_li GROUP BY 1""".stripMargin)
      .as[(String, Seq[String])].collect()
    assert(r.nonEmpty && r.forall(_._2.length === 2))
  }
}
