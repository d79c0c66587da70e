package graft

import org.apache.spark.sql.functions._
import graft.operators.{MergeIgnore, SurrogateKeys}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("MergeIgnore.newRows: dedups batch and excludes existing keys") {
    val batch = Seq((1, "a"), (1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val existing = Seq((2, "b")).toDF("k", "v")
    val out = MergeIgnore.newRows(batch, existing, Seq("k"))
      .select("k").as[Int].collect().sorted
    assert(out.toSeq === Seq(1, 3))
  }

  test("MergeIgnore is idempotent: second application of same batch adds nothing") {
    val batch = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val afterFirst = MergeIgnore.newRows(batch, null, Seq("k"))
    val second = MergeIgnore.newRows(batch, afterFirst, Seq("k"))
    assert(second.count() === 0)
  }

  test("SurrogateKeys.assign: dense 1..n in key order, offset respected") {
    val df = Seq("b", "c", "a").toDF("nome")
    val out = SurrogateKeys.assign(df, "id", Seq("nome"), offset = 10)
      .orderBy("id").as[(String, Int)].collect()
    assert(out.toSeq === Seq(("a", 11), ("b", 12), ("c", 13)))
  }

  test("SurrogateKeys.assignScalable: dense ids equal to window-based assignment") {
    val df = (1 to 1000).map(i => (i % 7, s"name_$i")).toDF("grp", "nome")
    val ids = SurrogateKeys.assignScalable(df, "id", Seq("nome"), offset = 5)
      .select("id").as[Long].collect().sorted
    assert(ids.toSeq === (6L to 1005L))
  }
}
