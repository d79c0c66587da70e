package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("lastAtOrBefore picks the latest right row at or before each left time") {
    val quotes = Seq( // key, time, price
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "qt", "price")
    val trades = Seq( // key, time
      ("A", 5L), ("A", 10L), ("A", 25L), ("A", 99L),
      ("B", 14L), ("B", 15L)).toDF("sym", "tt")
    val out = AsOfJoin.lastAtOrBefore(trades, quotes, Seq("sym"),
      leftTime = "tt", rightTime = "qt", payload = Seq("price"))
      .select("sym", "tt", "price")
      .as[(String, Long, Option[Double])].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      ("A", 5L, None),        // before first quote
      ("A", 10L, Some(1.0)),  // exact tie: quote at same t matches
      ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)),
      ("B", 14L, None),
      ("B", 15L, Some(9.0))))
  }

  test("nearest picks the closer side; ties and exact hits break backward") {
    val quotes = Seq( // key, time, price
      ("A", 10L, 1.0), ("A", 30L, 3.0),
      ("B", 50L, 5.0)).toDF("sym", "qt", "price")
    val trades = Seq(
      ("A", 12L),  // closer to 10 (backward)
      ("A", 28L),  // closer to 30 (forward)
      ("A", 20L),  // exact tie 10 vs 30 -> backward (10)
      ("A", 30L),  // exact hit -> that row
      ("A", 5L),   // before all -> forward only
      ("B", 99L),  // after all -> backward only
      ("C", 1L)    // keyless -> no match
    ).toDF("sym", "tt")
    val out = AsOfJoin.nearest(trades, quotes, Seq("sym"),
      leftTime = "tt", rightTime = "qt", payload = Seq("qt", "price"))
      .select("sym", "tt", "qt", "price")
      .as[(String, Long, Option[Long], Option[Double])].collect()
      .sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      ("A", 5L, Some(10L), Some(1.0)),
      ("A", 12L, Some(10L), Some(1.0)),
      ("A", 20L, Some(10L), Some(1.0)),
      ("A", 28L, Some(30L), Some(3.0)),
      ("A", 30L, Some(30L), Some(3.0)),
      ("B", 99L, Some(50L), Some(5.0)),
      ("C", 1L, None, None)))
  }

  test("a matched right row is attached whole — null fields included, never blended") {
    // right row at t=20 has a null aux; the match at t=25 must carry
    // (2.0, null), NOT blend aux=9 from the older t=10 row.
    val quotes = Seq(
      ("A", 10L, Some(1.0), Some(9)),
      ("A", 20L, Some(2.0), None: Option[Int]))
      .toDF("sym", "qt", "price", "aux")
    val trades = Seq(("A", 25L)).toDF("sym", "tt")
    val out = AsOfJoin.lastAtOrBefore(trades, quotes, Seq("sym"),
      leftTime = "tt", rightTime = "qt", payload = Seq("price", "aux"))
      .select("price", "aux").as[(Option[Double], Option[Int])].head()
    assert(out === (Some(2.0), None))
  }

  test("payload name collision with left side gets right_ prefix") {
    val l = Seq((1, 10L, "lv")).toDF("k", "t", "v")
    val r = Seq((1, 5L, "rv")).toDF("k", "rt", "v")
    val out = AsOfJoin.lastAtOrBefore(l, r, Seq("k"), "t", "rt", Seq("v"))
    assert(out.columns.contains("right_v") && out.columns.contains("v"))
    assert(out.select("right_v").as[String].head() === "rv")
  }
}
